"""dBoost parity on FIXTURES.md §7-style synthetic streams
(fizzbuzz / logins / sensors)."""

import pytest
from pyspark.sql import functions as F

from datalakerulegeneration_spark.dboost import (
    GaussianModel,
    HistogramModel,
    MixtureModel,
    PartitionedHistogramModel,
    cords_hints,
    discrete_stats_hints,
    expand,
    outliers,
    pearson_hints,
)
from datalakerulegeneration_spark.dboost.expansion import numeric_feature_columns


@pytest.fixture(scope="module")
def sensors(spark):
    """Intel-like sensor stream: planted low-voltage corruption rows
    with impossible temperatures (FIXTURES.md §7)."""
    rows = []
    for i in range(1000):
        temp = 20.0 + (i % 7) * 0.5
        volt = 2.6 + (i % 5) * 0.01
        if i in (100, 500, 900):
            temp, volt = 122.0, 0.1  # corruption
        rows.append((i, float(i), temp, 40.0 + (i % 11) * 0.3, volt))
    return spark.createDataFrame(
        rows, "rid long, epoch double, temperature double, humidity double, voltage double"
    )


def test_expansion_shapes(spark):
    df = spark.createDataFrame(
        [(1, 2.5, "AB12", 1700000000)], "i long, f double, s string, ts long"
    )
    ex = expand(df, row_id_col="i")
    names = set(ex.columns)
    assert {"__row_id", "i__id", "i__mod10", "f__id", "f__frac", "s__length",
            "s__is_upper", "s__sig", "ts__unix_year", "ts__is_weekend"} <= names
    row = ex.collect()[0]
    assert row["s__sig"] == "AB<num>"
    assert row["f__frac"] == 0.5
    assert row["ts__unix_year"] == 2023.0
    # F10 bits/div expansions (features/__init__.py:96-110,131-134)
    assert (row["i__bit0"], row["i__bit1"], row["i__bit2"]) == (1.0, 0.0, 0.0)
    assert (row["i__div3"], row["i__div5"]) == (0.0, 0.0)
    assert (row["ts__div5"], row["ts__bit5"]) == (1.0, 0.0)
    # unicode_sig is DEFAULT_DISABLED (python path): absent by default
    assert "s__unicode_sig" not in names


def test_expansion_unicode_signature(spark):
    # F11 (features/__init__.py:48-50): opt-in pandas_udf path
    df = spark.createDataFrame([("Ab1 é!",), (None,)], "s string")
    ex = expand(df, disabled=set())
    vals = [r["s__unicode_sig"] for r in ex.orderBy("__row_id").collect()]
    assert vals[0] == "Lu,Ll,Nd,Zs,Ll,Po"
    assert vals[1] is None


def test_gaussian_model_flags_planted_outliers(spark, sensors):
    res = outliers(
        sensors, sensors, [GaussianModel(tol=3.0)],
        row_id_col="rid", columns=["temperature", "humidity", "voltage"],
    )
    flagged = {int(r["row_id"]) for r in res.collect()}
    assert {100, 500, 900} <= flagged
    # gaussian on clean features must not flood: only planted rows
    assert flagged == {100, 500, 900}


def test_histogram_model(spark):
    """fizzbuzz-style: mod-3 feature is peaked; rare off-pattern value flagged."""
    rows = [(i, i * 3) for i in range(500)] + [(500, 7)]  # 7 % 3 == 1 rare
    df = spark.createDataFrame(rows, "rid long, x long")
    ex = expand(df, columns=["x"], row_id_col="rid")
    ex = ex.withColumn("x__mod3", (F.col("x__id") % 3).cast("double"))
    m = HistogramModel(peak_s=0.8, outlier_s=0.2).fit(ex, features=["x__mod3"])
    res = m.find_discrepancies(ex)
    assert {r["row_id"] for r in res.collect()} == {"500"}


def test_partitioned_histogram_logins(spark):
    """logins-style: user 0 constant country; a single off-country row
    is rare WITHIN that user even though the country is common globally."""
    rows = []
    for i in range(200):
        rows.append((i, 0, "US"))
    rows.append((200, 0, "DE"))          # anomaly for user 0
    for i in range(201, 400):
        rows.append((i, 1, "DE"))        # user 1 legitimately DE
    df = spark.createDataFrame(rows, "rid long, user long, country string")
    ex = expand(df, columns=["user", "country"], row_id_col="rid")
    m = PartitionedHistogramModel(outlier_s=0.1).fit(ex, key="user__id", value="country__sig")
    res = m.find_discrepancies(ex)
    assert {r["row_id"] for r in res.collect()} == {"200"}


def test_pearson_hints_finds_correlation(spark, sensors):
    ex = expand(sensors, columns=["epoch", "temperature", "humidity"], row_id_col="rid")
    feats = ["epoch__id", "temperature__id", "humidity__id"]
    hints = pearson_hints(ex, feats, epsilon=0.5)
    # epoch and nothing else correlate strongly in this fixture; the
    # call must at least be deterministic and bounded
    again = pearson_hints(ex, feats, epsilon=0.5)
    assert hints == again


def test_pearson_hints_strong_pair(spark):
    df = spark.createDataFrame(
        [(i, float(i), float(2 * i + 1), float((i * 37) % 11)) for i in range(200)],
        "rid long, a double, b double, c double",
    )
    ex = expand(df, columns=["a", "b", "c"], row_id_col="rid")
    hints = pearson_hints(ex, ["a__id", "b__id", "c__id"], epsilon=0.8)
    pairs = {(a, b) for a, b, _ in hints}
    assert ("a__id", "b__id") in pairs
    assert all("c__id" not in p for p in pairs)


def test_discrete_stats_and_cords(spark):
    rows = [(i, i % 3, ["x", "y", "z"][i % 3], i % 7) for i in range(500)]
    df = spark.createDataFrame(rows, "rid long, m long, s string, u long")
    ex = expand(df, columns=["m", "s", "u"], row_id_col="rid")
    combos = discrete_stats_hints(ex, ["m__id", "s__sig", "u__id"], max_buckets=16)
    assert ("m__id", "s__sig") in combos  # m determines s → 3 joint classes
    chi = cords_hints(ex, ["m__id", "s__sig", "u__id"])
    assert any({a, b} == {"m__id", "s__sig"} for a, b, _ in chi)
    # u is independent of m: must NOT be a cords hint
    assert not any({a, b} == {"m__id", "u__id"} for a, b, _ in chi)


def test_cords_chi2_branch(spark):
    """A correlated NON-sparse pair must fire via the chi² test itself
    (not the sparse-table shortcut), and an independent full-table pair
    must not."""
    rows = [
        (i, i % 4, (i % 4 + (1 if i % 5 == 0 else 0)) % 4, (i * 7 + i // 4) % 4)
        for i in range(800)
    ]
    df = spark.createDataFrame(rows, "rid long, x long, y long, z long")
    ex = expand(df, columns=["x", "y", "z"], row_id_col="rid")
    hints = cords_hints(ex, ["x__id", "y__id", "z__id"])
    found = {frozenset((a, b)): c for a, b, c in hints}
    xy = found.get(frozenset(("x__id", "y__id")))
    assert xy is not None and xy != float("inf")  # chi² branch, not shortcut


def test_mixture_model(spark, sensors):
    ex = expand(sensors, columns=["temperature", "voltage"], row_id_col="rid")
    m = MixtureModel(n_components=2, cutoff=0.01).fit(
        ex, pair=("temperature__id", "voltage__id")
    )
    res = m.find_discrepancies(ex)
    flagged = {int(r["row_id"]) for r in res.collect()}
    assert {100, 500, 900} <= flagged


def test_max_records_training_cutoff(spark, sensors):
    """D10 --max-records: fit on a prefix, score everything."""
    res = outliers(
        sensors, sensors, [GaussianModel(tol=3.0)],
        row_id_col="rid", columns=["temperature", "voltage"], max_records=400,
    )
    flagged = {int(r["row_id"]) for r in res.collect()}
    # train prefix (0..399) contains outlier 100 but stats still put the
    # planted rows far outside 3σ; full test frame scored
    assert {100, 500, 900} <= flagged


def test_train_test_split(spark, sensors):
    """D9: fit on clean train, detect on dirty test."""
    clean = sensors.where(~F.col("rid").isin(100, 500, 900))
    res = outliers(
        clean, sensors, [GaussianModel(tol=3.0)],
        row_id_col="rid", columns=["temperature", "voltage"],
    )
    flagged = {int(r["row_id"]) for r in res.collect()}
    assert {100, 500, 900} <= flagged
