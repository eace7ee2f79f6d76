"""Profiler correctness vs DuckDB on the sf0.001 tables."""

import math

import pytest
from pyspark.sql import functions as F

from datalakerulegeneration_spark.profiling import profile_table, scalar_stats_long
from datalakerulegeneration_spark.profiling.stats import STATS, NUMERIC, STRINGY, ANY
from datalakerulegeneration_spark.profiling.profiler import column_kind


def test_scalar_stats_match_duckdb_oracle(spark, sf_tables, duck):
    """Every registry stat must match its own SQL template bit-for-bit."""
    for table in ("lineitem", "documents", "events"):
        df = sf_tables[table]
        kinds = {f.name: column_kind(f.dataType) for f in df.schema.fields}
        got = {
            (r["col_name"], r["stat_name"]): r["stat_value"]
            for r in scalar_stats_long(df, table).collect()
        }
        for c in df.columns:
            k = kinds[c]
            for st in STATS:
                if st.kind not in (ANY, k):
                    continue
                sql = f"SELECT {st.sql(c)} FROM {table}"
                exp = duck.execute(sql).fetchone()[0]
                val = got[(c, st.name)]
                if exp is None:
                    assert val is None, (table, c, st.name, val)
                elif isinstance(exp, float) and math.isnan(exp):
                    assert val is None or math.isnan(val)
                else:
                    assert val == pytest.approx(exp, abs=0, rel=0) or val == exp, (
                        table, c, st.name, val, exp,
                    )


def test_profile_table_shape(spark, sf_tables):
    p = profile_table(spark, sf_tables["lineitem"], "lineitem")
    rows = {r["column"]: r for r in p.collect()}
    assert len(rows) == len(sf_tables["lineitem"].columns)
    li = rows["l_quantity"]
    assert li["row_num"] == 6000.0
    assert li["null_ratio"] == 0.0
    assert li["unique_ratio"] == pytest.approx(50 / 6000)
    assert rows["l_returnflag"]["basic_data_type"] == "categorical"
    assert rows["l_orderkey"]["basic_data_type"] == "integer"
    assert rows["l_extendedprice"]["basic_data_type"] == "float"


def test_profile_deterministic_ties(spark, sf_tables):
    """Modal/histogram stats break ties by value — rerun must be identical."""
    a = profile_table(spark, sf_tables["nation"], "nation").collect()
    b = profile_table(spark, sf_tables["nation"], "nation").collect()
    assert a == b


def test_approx_mode(spark, sf_tables):
    """exact=False (the 100 TB path): approx distinct within HLL
    tolerance, everything else identical to exact mode."""
    li = sf_tables["lineitem"]
    exact = {
        (r["col_name"], r["stat_name"]): r["stat_value"]
        for r in scalar_stats_long(li, "lineitem").collect()
    }
    approx = {
        (r["col_name"], r["stat_name"]): r["stat_value"]
        for r in scalar_stats_long(li, "lineitem", exact=False).collect()
    }
    assert set(exact) == set(approx)
    for (c, s), v in exact.items():
        a = approx[(c, s)]
        if s in ("distinct_num", "unique_ratio"):
            if v and v > 0:
                assert abs(a - v) / v < 0.1, (c, s, a, v)
            else:
                assert a == v, (c, s, a, v)
        elif v is None:
            assert a is None
        else:
            assert a == v, (c, s, a, v)


def test_dataset_profile(spark, sf_tables):
    from datalakerulegeneration_spark.profiling import dataset_profile

    p = profile_table(spark, sf_tables["region"], "region")
    dp = dataset_profile(p).collect()
    assert len(dp) == 1 and dp[0]["table"] == "region"
