"""Golden matcher run on the reference's own Quintet_Match benchmark
(r11 — method_2/pipleline_2.py protocol: score → Hungarian assignment
→ rule binding → bound execution, on the REAL pairs).

Data adjudication (verified byte-for-byte, matching/golden_match.py):
every Quintet_Match ``<ds>_{1,2}`` file equals the vendored Quintet
``<ds>`` pair — the benchmark matches a table against an identical
copy, so ground truth is the identity mapping.
"""

import pytest

from datalakerulegeneration_spark.matching import golden_match as GM


def test_golden_match_assignments_identity(spark):
    """The Hungarian 1-1 assignment (J6) over the real benchmark
    recovers the identity mapping on ALL FOUR pairs — 49 columns, no
    crossed wires (a matcher that confuses e.g. sched_dep_time with
    act_dep_time — identical name trigrams except one token, near-equal
    profiles — fails here)."""
    got = GM.golden_assignments(spark)
    for ds, assigned in got.items():
        cols = {s.split("::", 1)[1] for s, _, _ in assigned}
        assert len(assigned) == len(cols), (ds, assigned)
        for src_id, tgt_id, score in assigned:
            assert src_id.split("::", 1)[1] == tgt_id.split("::", 1)[1], (
                ds,
                src_id,
                tgt_id,
            )
            # identical columns: every pairwise component is exact-1
            # except the name_sim-independent parts — the combined
            # score of a self-match is the weights' fixed point 0.9
            # (W_NAME*1 + W_STRUCT*1 + W_DIST*1 + W_CONTENT*(1+kw0)/2)
            assert score == pytest.approx(0.9, abs=1e-6), (ds, src_id, score)
    assert {len(v) for v in got.values()} == {11, 7, 20}  # beers/rayyan=11


def test_golden_match_scores_cross_engine(spark):
    """The registered beers-pair score frame is identical between the
    Spark plan and the DuckDB twin (raw CSV → coerced profiles → pair
    arithmetic, end to end)."""
    import duckdb

    got = sorted(map(tuple, GM.match_pair_scores(spark, "beers").collect()))
    want = sorted(
        map(tuple, duckdb.connect().execute(GM.match_pair_scores_sql("beers")).fetchall())
    )
    assert got == want
    assert len(got) == 121


def test_golden_match_bound_run_round_trip(spark):
    """J7/A8 on real data: the published beers legacy rules bound from
    beers_1 columns onto their MATCHED beers_2 columns reproduce the
    source table's own published violation total (identical bytes ⇒
    the 17,416-cell artifact count)."""
    violations, runs = GM.golden_bound_run(spark, "beers")
    total = violations.count()
    assert total == 17416
    r = {(x["column"], x["rule"]): x["n_violations"] for x in runs.collect()}
    # the ibu column's 1005 N/A cells are flagged by BOTH rules — the
    # pandas-NA ingest quirk the published artifact bakes in
    assert r[("ibu", "MUST NOT be NULL")] == 1005
    assert all(t == "beers_2" for t in {x["table"] for x in runs.collect()})
