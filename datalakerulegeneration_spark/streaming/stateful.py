"""Custom stateful streaming operator via ``applyInPandasWithState``.

The dBoost Gaussian model in true streaming form: per-key running
moments (n, Σx, Σx²) kept as EXPLICIT operator state across
micro-batches. Each batch is scored against the statistics accumulated
over all PRIOR batches — the model fitted on the stream prefix, which
is exactly dBoost's single-pass semantics (dboost/__init__.py:27-47
fits on what has been read so far) — then folded into the state.

Spark's built-in streaming aggregations cannot express this: the state
is unbounded in event time (no watermark eviction) and the output is
row-level flags against a *prior* version of the aggregate, not the
aggregate itself. That is the ``applyInPandasWithState`` niche —
arbitrary per-key state with Arrow-batched pandas scoring.

At scale: state is one (long, double, double) triple per key, grouped
state is hash-partitioned across executors by key, and each batch
moves only its own rows — no shuffle of history.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame

FLAGS_SCHEMA = "key string, value double, mu double, sd double, n_prior long"
STATE_SCHEMA = "n long, s double, sq double"


def stateful_gaussian_flags(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    tol: float = 3.0,
) -> DataFrame:
    """Per-key streaming 3σ monitor with running-moments state.

    Emits ``(key, value, mu, sd, n_prior)`` for every value deviating
    more than ``tol``·σ from the mean of the prior batches of its key.
    The first batch of a key is never flagged (no prior model), exactly
    like dBoost scoring rows it has not trained past yet.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    tol = float(tol)

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            n, s, sq = state.get
        else:
            n, s, sq = 0, 0.0, 0.0
        mu = sd = None
        n_prior = n  # snapshot: Arrow may deliver the batch in chunks,
        # and every emitted row must report the SAME prior-batch model
        if n >= 2:
            mu = s / n
            sd = math.sqrt(max((sq - s * s / n) / (n - 1), 0.0))
        out = []
        for pdf in pdfs:
            vals = pdf[value_col].astype(float)
            vals = vals[vals.notna()]
            if mu is not None and sd and sd > 0:
                for v in vals[(vals - mu).abs() > tol * sd]:
                    out.append((str(key[0]), float(v), mu, sd, n_prior))
            n += int(len(vals))
            s += float(vals.sum())
            sq += float((vals * vals).sum())
        state.update((n, s, sq))
        yield pd.DataFrame(out, columns=["key", "value", "mu", "sd", "n_prior"])

    return events.groupBy(key_col).applyInPandasWithState(
        fn, FLAGS_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
