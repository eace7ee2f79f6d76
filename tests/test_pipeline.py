"""Full quality pipeline: profile → cluster → share → prepare →
detect → score (the reference's main.py --mode multi flow)."""

import pytest
from pyspark.sql import functions as F

from datalakerulegeneration_spark.pipeline import run_quality_pipeline

KEYS = {
    "nation": "n_nationkey",
    "region": "r_regionkey",
    "supplier": "s_suppkey",
    "customer": "c_custkey",
}


def test_pipeline_perfect_detection(spark, sf_tables):
    clean = {k: sf_tables[k] for k in KEYS}
    dirty = dict(clean)
    dirty["customer"] = (
        sf_tables["customer"]
        .withColumn("c_name", F.when(F.col("c_custkey") == 7, F.lit("")).otherwise(F.col("c_name")))
        .withColumn("c_acctbal", F.when(F.col("c_custkey") == 11, F.lit(9.9e9)).otherwise(F.col("c_acctbal")))
        .withColumn(
            "c_mktsegment",
            F.when(F.col("c_custkey") == 23, F.lit("B!LDING#7")).otherwise(F.col("c_mktsegment")),
        )
    )
    res = run_quality_pipeline(spark, clean, dirty, key_cols=KEYS)
    m = res["tables"]["customer"]["metrics"]
    # null-in-non-nullable, out-of-range numeric, malformed categorical:
    # all three caught, nothing else flagged
    assert m["tp"] == 3 and m["fp"] == 0 and m["fn"] == 0
    assert m["f1"] == 1.0
    # clean tables must yield zero violations
    for name in ("nation", "region", "supplier"):
        tm = res["tables"][name]["metrics"]
        assert tm["tp"] == 0 and tm["fp"] == 0 and tm["fn"] == 0


def test_pipeline_artifacts(spark, sf_tables):
    clean = {k: sf_tables[k] for k in ("nation", "region")}
    res = run_quality_pipeline(spark, clean, clean, key_cols=KEYS)
    assert res["profiles"].count() == 5
    assert res["clusters"].count() == 5
    assert res["shared_rules"].count() > 0
