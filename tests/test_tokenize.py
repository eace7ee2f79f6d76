"""Real-tokenizer seam: budget/packing decisions must flow the plugged
tokenizer's counts, and the default (proxy) path must be bit-identical
to what it always was (the oracle gate covers the default externally;
here we pin it directly)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from datalakerulegeneration_spark.ops import tokenize as T
from datalakerulegeneration_spark.ops.packing import pack_sequences
from datalakerulegeneration_spark.ops.sampling import token_budget_select
from datalakerulegeneration_spark.ops.textqa import corpus_report, token_count


def _make_stub():
    # nested def: cloudpickle serializes it BY VALUE, so Spark's Python
    # workers don't need to import this test module
    def stub_bpe(s: pd.Series) -> list[int]:
        """Deterministic fake BPE: ~1 token per 3 chars, min 1 for
        non-empty — intentionally DIFFERENT from both the whitespace
        count and the regex proxy so a seam that silently falls back
        fails the tests."""
        return [0 if len(t) == 0 else len(t) // 3 + 1 for t in s]

    return stub_bpe


stub_bpe = _make_stub()


def stub_counts(texts: list[str | None]) -> list[int]:
    return list(stub_bpe(pd.Series([t or "" for t in texts])))


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "alpha beta gamma delta", "a"),
        (2, "one, two; three!", "a"),
        (3, "x" * 50, "b"),
        (4, "", "b"),
        (5, None, "b"),
        (6, "short", "c"),
        (7, "the quick brown fox jumps over the lazy dog", "c"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string, source string")


def test_token_count_default_unchanged(docs):
    """Default n_subwords is exactly the regex proxy — same expression
    the oracle SQL mirrors (null text -> null count)."""
    got = {r["id"]: (r["n_tokens"], r["n_subwords"]) for r in token_count(docs, "doc_id", "text").collect()}
    assert got[1] == (4, 4)
    assert got[2] == (3, 6)  # "one" "," "two" ";" "three" "!"
    assert got[4] == (0, 0)
    assert got[5][1] is None  # NULL text -> NULL subwords, same as ever


def test_token_count_seam_flows_stub_counts(docs):
    got = {r["id"]: r["n_subwords"] for r in token_count(docs, "doc_id", "text", tokenizer_fn=stub_bpe).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for i, t in texts.items():
        if t is None:
            assert got[i] is None
        else:
            assert got[i] == stub_counts([t])[0], i


def test_pack_boundaries_shift_under_stub_bpe(docs, spark):
    """Seam path must equal packing over a precomputed stub-count
    column (proves counts flow through untouched), and must differ
    from the proxy-weight packing (proves the seam is live)."""
    base = docs.withColumn("w_proxy", F.coalesce(T.token_count_col("text"), F.lit(0)))
    pdf = docs.toPandas()
    pdf["w_stub"] = [0 if t is None else stub_counts([t])[0] for t in pdf["text"]]
    pre = spark.createDataFrame(pdf[["doc_id", "text", "source", "w_stub"]])

    seam = pack_sequences(docs, "doc_id", "ignored", seq_len=8, text_col="text", tokenizer_fn=stub_bpe)
    expected = pack_sequences(pre, "doc_id", "w_stub", seq_len=8)
    assert sorted(map(tuple, seam.collect())) == sorted(map(tuple, expected.collect()))

    default = pack_sequences(base, "doc_id", "w_proxy", seq_len=8)
    s = {(r["id"], r["pack_first"], r["pack_last"]) for r in seam.collect()}
    d = {(r["id"], r["pack_first"], r["pack_last"]) for r in default.collect()}
    assert s != d  # boundaries actually moved


def test_budget_cutoff_shifts_under_stub_bpe(docs, spark):
    docs_q = docs.withColumn("quality", (F.col("doc_id") % 10) / 10.0)
    base = docs_q.withColumn("w_proxy", F.coalesce(T.token_count_col("text"), F.lit(0)))
    pdf = docs_q.toPandas()
    # NULL-text docs carry a NULL token count and are DROPPED by the
    # seam path (same admission contract as a NULL weight_col) — the
    # expected frame mirrors that by excluding them up front
    pdf = pdf[pdf["text"].notna()]
    pdf["w_stub"] = [stub_counts([t])[0] for t in pdf["text"]]
    pre = spark.createDataFrame(pdf[["doc_id", "text", "source", "quality", "w_stub"]])

    budget = 25
    seam = token_budget_select(docs_q, "doc_id", "ignored", "quality", budget, text_col="text", tokenizer_fn=stub_bpe)
    expected = token_budget_select(pre, "doc_id", "w_stub", "quality", budget).select(*docs_q.columns)
    assert sorted(map(tuple, seam.collect())) == sorted(map(tuple, expected.collect()))
    assert seam.columns == docs_q.columns  # no _tok_w leak
    # and the NULL-text doc is not among the survivors
    null_ids = {r["doc_id"] for r in docs_q.where(F.col("text").isNull()).collect()}
    assert null_ids and null_ids.isdisjoint({r["doc_id"] for r in seam.collect()})

    default = token_budget_select(base, "doc_id", "w_proxy", "quality", budget).select("doc_id")
    assert {r["doc_id"] for r in seam.select("doc_id").collect()} != {
        r["doc_id"] for r in default.collect()
    }


def test_corpus_report_totals_use_stub_counts(docs):
    rep = {r["metric"]: r["value"] for r in corpus_report(docs, "doc_id", "text", "source", tokenizer_fn=stub_bpe).collect()}
    texts = [r["text"] for r in docs.collect() if r["text"] is not None]
    want_total = sum(stub_counts(texts))
    assert rep["total_tokens"] == float(want_total)
    assert rep["mean_doc_tokens"] == round(want_total / 7, 6)
    # default path untouched
    rep_d = {r["metric"]: r["value"] for r in corpus_report(docs, "doc_id", "text", "source").collect()}
    assert rep_d["total_tokens"] != rep["total_tokens"]


def test_default_tokenizer_probe_degrades_gracefully():
    fn = T.default_tokenizer()
    if fn is None:
        return  # no real tokenizer in this container — documented fallback
    out = fn(pd.Series(["hello world", ""]))
    assert len(list(out)) == 2 and all(isinstance(int(x), int) for x in out)


def test_pack_sequences_requires_text_col_with_tokenizer(docs):
    with pytest.raises(ValueError, match="text_col"):
        pack_sequences(docs, "doc_id", "w", seq_len=8, tokenizer_fn=stub_bpe)
    with pytest.raises(ValueError, match="text_col"):
        token_budget_select(docs, "doc_id", "w", "q", 10, tokenizer_fn=stub_bpe)
