"""Unit semantics for ops.temporal (sessionize / as-of join) on
hand-checkable fixtures; the sf0.01 DuckDB-oracle parity runs in the
driver gate (sessionize_events / asof_join_events_orders)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from datalakerulegeneration_spark.ops.temporal import asof_join, sessionize


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m, 0)


def test_sessionize_gap_split(spark):
    rows = [
        (1, _ts(0), 1.0),
        (1, _ts(10), 2.0),   # same session (10 min gap)
        (1, _ts(50), 4.0),   # new session (40 min > 30)
        (2, _ts(5), 8.0),    # separate key
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    out = {
        (r.user_id, r.session_idx): r
        for r in sessionize(df, "user_id", "ts", "30 minutes", "value").collect()
    }
    assert len(out) == 3
    s1 = out[(1, 1)]
    assert s1.n_events == 2 and s1.value_sum == 3.0
    assert s1.session_end - s1.session_start == 600
    assert out[(1, 2)].n_events == 1
    assert out[(2, 1)].value_sum == 8.0


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [(100, 1, _ts(5)), (101, 1, _ts(20)), (102, 2, _ts(10)), (103, 3, _ts(30))],
        "event_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 7), (1, _ts(20), 9), (2, _ts(30), 11), (3, _ts(0), 5), (3, _ts(25), None)],
        "k int, rts timestamp, val int",
    )
    out = {
        r.event_id: r.val
        for r in asof_join(left, right, "user_id", "k", "ts", "rts", ["val"]).collect()
    }
    assert out[100] == 7          # only the t=0 order is in the past
    assert out[101] == 9          # t=20 right row visible at equal time
    assert out[102] is None       # key 2's only right row is later
    # the MATCHED row's value is NULL: must return NULL, not resurrect
    # the older t=0 value
    assert out[103] is None


def test_range_join_matches_naive_cross(spark):
    """Bucketed range join ≡ the naive cross-filter on a fixture that
    exercises bucket boundaries: intervals shorter/longer than the
    bucket, half-open end, empty/inverted intervals, key misses."""
    from datalakerulegeneration_spark.ops.temporal import range_join

    left = spark.createDataFrame(
        [(i, i % 3, dt.datetime(2024, 1, 1 + i % 9, (7 * i) % 24, 0, 0)) for i in range(40)],
        "event_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            # (id, key, start_day, start_hour, length_hours)
            (0, 0, 1, 0, 12),    # shorter than the 1-day bucket
            (1, 0, 2, 6, 60),    # spans 3 buckets
            (2, 1, 1, 0, 24),    # exactly one bucket
            (3, 2, 4, 23, 2),    # straddles a bucket boundary
            (4, 1, 5, 0, 0),     # empty interval -> no matches
            (5, 9, 1, 0, 240),   # key with no left rows
        ],
        "win_id int, k int, d int, h int, len_h int",
    )
    right = right.select(
        "win_id",
        "k",
        F.expr("make_timestamp(2024, 1, d, h, 0, 0)").alias("ws"),
        F.expr("make_timestamp(2024, 1, d, h, 0, 0) + make_interval(0,0,0,0,len_h,0,0)").alias("we"),
    )
    got = sorted(
        (r.event_id, r.win_id)
        for r in range_join(
            left, right, "user_id", "k", "ts", "ws", "we", ["win_id"], bucket="1 day"
        ).collect()
    )
    exp = sorted(
        (r.event_id, r.win_id)
        for r in left.join(right, (left.user_id == right.k))
        .where((F.col("ts") >= F.col("ws")) & (F.col("ts") < F.col("we")))
        .collect()
    )
    assert got == exp and len(got) > 0
    # half-open: an event exactly at an interval end must NOT match
    ends = {(r.event_id, r.win_id) for r in left.join(right, (left.user_id == right.k)).where(F.col("ts") == F.col("we")).collect()}
    assert ends.isdisjoint(set(got))


def test_range_join_plan_no_broadcast_no_cartesian(spark):
    """The exploded-interval side must never ride a static size
    estimate into a broadcast, and the plan must be an equi-join
    (SortMergeJoin), not BroadcastNestedLoop/Cartesian."""
    from datalakerulegeneration_spark.ops.temporal import range_join

    left = spark.createDataFrame([(1, 1, _ts(5))], "event_id int, user_id int, ts timestamp")
    right = spark.createDataFrame([(1, 1, _ts(0), _ts(30))], "win_id int, k int, ws timestamp, we timestamp")
    plan = (
        range_join(left, right, "user_id", "k", "ts", "ws", "we", ["win_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan and "Cartesian" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_time_rollup_matches_spark_rollup(spark):
    """Hierarchical re-aggregation ≡ Spark's own GROUP BY ROLLUP
    (Expand-based) on a value set with exact decimal sums."""
    from datalakerulegeneration_spark.ops.temporal import time_rollup

    rows = [
        (dt.datetime(2024, 1, 1 + i % 3, (5 * i) % 24, i % 60, 0), 0.1 * i)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    got = sorted(tuple(r) for r in time_rollup(df, "ts", "value").collect())

    e = df.select(
        F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("day_num"),
        F.floor((F.unix_timestamp("ts") % 86400) / 3600).cast("int").alias("hr"),
        F.expr("cast(value as decimal(18,6))").alias("vd"),
        "value",
    )
    ref = (
        e.rollup("day_num", "hr")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("vd").cast("double").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .select(
            F.when(F.col("day_num").isNull(), 3)
            .when(F.col("hr").isNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("level"),
            F.coalesce("day_num", F.lit(-1)).cast("bigint").alias("day_num"),
            F.coalesce("hr", F.lit(-1)).cast("int").alias("hr"),
            F.col("n").cast("bigint"),
            "s",
            "mn",
            "mx",
        )
    )
    exp = sorted(tuple(r) for r in ref.collect())
    assert got == exp and len(got) > 3


def test_time_rollup_plan_single_scan_no_expand(spark, sf_tables):
    """One pass over the raw events; the coarse grains must re-aggregate
    the hour frame, never Expand the corpus by #grouping-sets."""
    from datalakerulegeneration_spark.ops.temporal import time_rollup

    ev = sf_tables["events"]
    plan = (
        time_rollup(ev, "ts", "value")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan parquet") == 1
    assert "Expand" not in plan
