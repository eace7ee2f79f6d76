"""Temporal operators Spark lacks natively: sessionization and as-of
join (scale extensions; no reference counterpart — the reference has no
event-time semantics at all, SURVEY §2.11).

Both are built the shuffle-minimal way:

* ``sessionize`` — ONE shuffle (hash by key) + ONE per-key sort; the
  gap test is a lag() window and session ids are a running sum of
  session-start flags. No self-join, no range join.
* ``asof_join`` — the union-sort trick: tag both inputs, union, sort
  per key by (time, tag), carry the last non-null right-side value
  forward with last_value(ignorenulls) — each left row sees the most
  recent right row at or before its timestamp. ONE shuffle of
  |left|+|right| rows; the naive formulation (per-left-row subquery or
  range join) is O(n·m) and unusable at 100 TB.

Timestamps in oracle-checked outputs are rendered as epoch seconds
(BIGINT) — raw timestamp values hash differently across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    agg_col: str | None = "value",
) -> DataFrame:
    """Split each key's event stream into sessions at inactivity gaps.

    Returns one row per session: key, session index (1-based, in time
    order), epoch-second start/end, event count and optional value sum
    (exact DECIMAL(18,6) → double, the cross-engine float recipe).
    """
    gap_s = _duration_seconds(gap)
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col))
    e = events.withColumn("_ts", F.unix_timestamp(F.col(ts_col).cast("timestamp")))
    e = e.withColumn(
        "_new",
        F.when(
            (F.lag("_ts").over(w).isNull())
            | (F.col("_ts") - F.lag("_ts").over(w) > gap_s),
            1,
        ).otherwise(0),
    )
    e = e.withColumn(
        "session_idx",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    aggs = [
        F.min("_ts").alias("session_start"),
        F.max("_ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if agg_col is not None:
        aggs.append(
            F.sum(F.expr(f"cast({agg_col} as decimal(18,6))"))
            .cast("double")
            .alias("value_sum")
        )
    return e.groupBy(F.col(key_col), F.col("session_idx")).agg(*aggs)


def sessionize_sql(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    agg_col: str | None = "value",
) -> str:
    """DuckDB oracle for :func:`sessionize` (same lag + running-sum
    construction)."""
    gap_s = _duration_seconds(gap)
    val = (
        f", CAST(sum(CAST({agg_col} AS DECIMAL(18,6))) AS DOUBLE) AS value_sum"
        if agg_col is not None
        else ""
    )
    return f"""
WITH e AS (
  -- floor, not CAST: DuckDB CAST(double AS BIGINT) rounds, while
  -- Spark's unix_timestamp truncates sub-second parts
  SELECT {key_col}, CAST(floor(epoch({ts_col})) AS BIGINT) AS _ts{', ' + agg_col if agg_col else ''}
  FROM {table}
), flagged AS (
  SELECT *, CASE WHEN lag(_ts) OVER w IS NULL
                   OR _ts - lag(_ts) OVER w > {gap_s}
            THEN 1 ELSE 0 END AS _new
  FROM e
  WINDOW w AS (PARTITION BY {key_col} ORDER BY _ts ASC)
), sessions AS (
  SELECT *, sum(_new) OVER (PARTITION BY {key_col} ORDER BY _ts ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
)
SELECT {key_col},
       -- BIGINT: DuckDB's windowed sum(int) widens to HUGEINT, which
       -- lands as float64 in pandas and breaks the driver value hash
       CAST(session_idx AS BIGINT) AS session_idx,
       min(_ts) AS session_start, max(_ts) AS session_end,
       count(*) AS n_events{val}
FROM sessions
GROUP BY {key_col}, session_idx
"""


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts <= left_ts`` for the same key (backward as-of join,
    ties broken toward the right row sorting last).

    Implementation: tag and union both sides, sort per key by
    (time, side) with right rows first at equal times, and propagate
    the last seen right values with ``last_value(..., ignorenulls)``.
    One |L|+|R| shuffle — no range join, no per-row lookup.
    """
    reserved = {"_k", "_t", "_side", "_r"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"asof_join: input columns collide with internal names {sorted(clash)}"
        )
    overlap = set(right_vals) & set(left.columns)
    if overlap:
        raise ValueError(
            f"asof_join: right_vals {sorted(overlap)} collide with left columns;"
            " alias them on the right side first"
        )
    lt = left.withColumn("_k", F.col(left_key)).withColumn(
        "_t", F.unix_timestamp(F.col(left_ts).cast("timestamp"))
    )
    rt = right.withColumn("_k", F.col(right_key)).withColumn(
        "_t", F.unix_timestamp(F.col(right_ts).cast("timestamp"))
    )
    # right values travel inside ONE struct that is non-null for every
    # right row: last(ignorenulls) then matches the most recent right
    # ROW — per-column last() would skip a NULL value in the matched
    # row and resurrect a stale older value
    r_struct = F.struct(*[F.col(c).alias(c) for c in right_vals])
    l_tag = lt.select(
        "_k",
        "_t",
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in ("_k", "_t")],
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_vals) + ">"
        ).alias("_r"),
    )
    r_tag = rt.select(
        "_k",
        "_t",
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        r_struct.alias("_r"),
    )
    u = l_tag.unionByName(r_tag)
    # right rows (_side=0) sort before left rows at the same _t, so an
    # exactly-simultaneous right row is visible to that left row
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_t"), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_r", F.last("_r", ignorenulls=True).over(w))
    return (
        u.where(F.col("_side") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            *[F.col(f"_r.{c}").alias(c) for c in right_vals],
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_start: str,
    right_end: str,
    right_vals: list[str],
    bucket: str = "1 day",
) -> DataFrame:
    """Interval (range) join: every left row pairs with every right row
    of the same key whose half-open interval ``[right_start, right_end)``
    contains ``left_ts`` (epoch-second granularity).

    Scale shape — bucketed blocking, NOT a range-predicate join (which
    Spark plans as a per-key cartesian) and NOT a theta join: each
    right interval explodes to the fixed-width time buckets it covers
    (``sequence`` — fan-out = interval/bucket + 1, pick ``bucket`` near
    the typical interval length so fan-out is O(1)), each left point
    maps to its single bucket, and the join is a plain equi-join on
    (key, bucket) followed by the exact containment filter. A
    qualifying pair meets in exactly one bucket (the point's), so no
    dedup pass is needed. The join carries an explicit merge hint:
    the exploded side's size estimate is the pre-explode file size,
    which Catalyst would happily (and fatally) broadcast at scale —
    see SCALE.md "Join-shape policy".
    """
    reserved = {"_k", "_t", "_s", "_e", "_b"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"range_join: input columns collide with internal names {sorted(clash)}"
        )
    w = _duration_seconds(bucket)
    lt = left.select(
        F.col(left_key).alias("_k"),
        F.unix_timestamp(F.col(left_ts).cast("timestamp")).alias("_t"),
        *[F.col(c) for c in left.columns],
    ).withColumn("_b", F.floor(F.col("_t") / w))
    rt = right.select(
        F.col(right_key).alias("_k"),
        F.unix_timestamp(F.col(right_start).cast("timestamp")).alias("_s"),
        F.unix_timestamp(F.col(right_end).cast("timestamp")).alias("_e"),
        *[F.col(c) for c in right_vals],
    )
    # half-open: the bucket of (_e - 1s) is the last one a member point
    # can land in; _e <= _s yields an empty sequence -> row drops out
    rt = rt.where(F.col("_s").isNotNull() & F.col("_e").isNotNull() & (F.col("_e") > F.col("_s")))
    rt = rt.withColumn(
        "_b",
        F.explode(
            F.sequence(F.floor(F.col("_s") / w), F.floor((F.col("_e") - 1) / w))
        ),
    )
    out = (
        lt.hint("merge")
        .join(rt, on=["_k", "_b"], how="inner")
        .where((F.col("_t") >= F.col("_s")) & (F.col("_t") < F.col("_e")))
    )
    return out.select(*[F.col(c) for c in left.columns], *[F.col(c) for c in right_vals])


def time_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hypertable-style multi-resolution rollup: hour grain, day grain
    and grand total of (count, exact sum, min, max) in ONE pass over
    the raw data.

    Scale shape — hierarchical re-aggregation, not GROUP BY ROLLUP:
    Spark plans ``rollup()`` as an Expand that multiplies every input
    row by the number of grouping sets (3× the corpus through the
    shuffle). Here the raw table is aggregated once at the finest
    grain (hour — O(#hours) rows), and the coarser grains re-aggregate
    THAT frame: counts add, DECIMAL sums add exactly, extrema fold, so
    the coarse results are bit-identical to direct aggregation (this
    exactness is what makes continuous-aggregate rollups valid). Day
    and hour indices are pure epoch-second arithmetic (timezone-free,
    identical in any engine).

    Output: ``level`` (0 = hour, 1 = day, 3 = total — GROUPING_ID
    convention), ``day_num``/``hr`` (-1 when rolled up), ``n_events``,
    ``value_sum`` (exact decimal → double), ``value_min``/``value_max``.
    """
    e = events.select(
        F.unix_timestamp(F.col(ts_col).cast("timestamp")).alias("_t"),
        F.col(value_col).alias("_v"),
    )
    e = e.select(
        F.floor(F.col("_t") / 86400).cast("bigint").alias("day_num"),
        F.floor((F.col("_t") % 86400) / 3600).cast("int").alias("hr"),
        F.expr("cast(_v as decimal(18,6))").alias("_vd"),
        F.col("_v"),
    )
    hour = e.groupBy("day_num", "hr").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("_vd").alias("_s"),
        F.min("_v").alias("value_min"),
        F.max("_v").alias("value_max"),
    )
    return rollup_from_hour(hour)


def rollup_from_hour(hour: DataFrame) -> DataFrame:
    """Derive every grain (hour/day/total) from a mergeable hour-grain
    state frame ``(day_num, hr, n_events, _s, value_min, value_max)``.
    Shared by the batch rollup and the streaming continuous aggregate —
    the state is the contract, the finalize is identical."""
    # A union of three aggregates over the `hour` subtree would re-plan
    # (and re-SCAN) it per branch; instead each hour row fans out to its
    # three grain labels — a Generate over the O(#hours) frame, never
    # the corpus — and one tiny re-aggregation produces every grain.
    g = hour.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).cast("int").alias("level"),
                    F.col("day_num").alias("day_num"),
                    F.col("hr").alias("hr"),
                ),
                F.struct(
                    F.lit(1).cast("int").alias("level"),
                    F.col("day_num").alias("day_num"),
                    F.lit(-1).cast("int").alias("hr"),
                ),
                F.struct(
                    F.lit(3).cast("int").alias("level"),
                    F.lit(-1).cast("bigint").alias("day_num"),
                    F.lit(-1).cast("int").alias("hr"),
                ),
            )
        ).alias("_g"),
        "n_events",
        "_s",
        "value_min",
        "value_max",
    )
    return (
        g.groupBy("_g.level", "_g.day_num", "_g.hr")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("_s").cast("double").alias("value_sum"),
            F.min("value_min").alias("value_min"),
            F.max("value_max").alias("value_max"),
        )
        .select("level", "day_num", "hr", "n_events", "value_sum", "value_min", "value_max")
    )


def _duration_seconds(s: str) -> int:
    n, unit = s.split()
    mult = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }[unit]
    return int(n) * mult
