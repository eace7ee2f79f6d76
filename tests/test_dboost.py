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


def test_frozen_mixture_planted(spark):
    """Frozen-GMM serving split (r9): the erf-free quadratic predicate
    flags exactly the points beyond every component's Mahalanobis²
    threshold, matches the DuckDB twin bit-for-bit on a planted frame,
    and skips NULL pairs (the reference handleInvalid=skip posture)."""
    import math

    import duckdb
    import pandas as pd

    from datalakerulegeneration_spark.dboost.models import (
        frozen_mixture_outliers,
        frozen_mixture_outliers_sql,
    )

    # one standard gaussian at the origin, weight 1, cutoff 0.05:
    # t = √2·erfinv(0.95) ≈ 1.9600 (the classic 95% two-sided z)
    t = 1.959963984540054
    params = {
        "pair": ["xa", "xb"],
        "cutoff": 0.05,
        "components": [
            {
                "weight": 1.0,
                "mean": [0.0, 0.0],
                "icov": [[1.0, 0.0], [0.0, 1.0]],
                "t2": t * t,
            }
        ],
    }
    rows = [
        ("in", 0.5, 0.5),        # maha² = 0.5 < t²
        ("edge_in", 1.9, 0.0),   # 3.61 < 3.8415
        ("out", 2.0, 0.0),       # 4.0 > 3.8415
        ("far", 3.0, 3.0),       # 18 > 3.8415
        ("nullrow", None, 1.0),  # skipped
    ]
    df = spark.createDataFrame(rows, "rid string, xa double, xb double").withColumn(
        "__row_id", F.col("rid")
    )
    got = {r["row_id"] for r in frozen_mixture_outliers(df, params=params).collect()}
    assert got == {"out", "far"}
    # exact parity with the DuckDB twin on the same frame
    con = duckdb.connect()
    con.register(
        "pts", pd.DataFrame(rows, columns=["rid", "xa", "xb"]).astype({"xa": "float64", "xb": "float64"})
    )
    exp = {r[0] for r in con.execute(frozen_mixture_outliers_sql("pts", "rid", params)).fetchall()}
    assert exp == {"out", "far"}
    # a below-cutoff component imposes no constraint (t2=None) —
    # with ONLY such components everything is an outlier
    degen = dict(params, components=[dict(params["components"][0], weight=0.01, t2=None)])
    assert {
        r["row_id"] for r in frozen_mixture_outliers(df, params=degen).collect()
    } == {"in", "edge_in", "out", "far"}


def test_frozen_gmm_fixture_freeze_math(spark):
    """The vendored fixture is a valid 2-D GMM and its thresholds are
    the EXACT inverse of the reference criterion: at d = √t2 each
    component's score w·(1−erf(d/√2)) equals the cutoff."""
    import math

    from datalakerulegeneration_spark.dboost.models import load_frozen_gmm

    p = load_frozen_gmm()
    assert p["pair"] == ["l_quantity", "l_extendedprice"]
    assert len(p["components"]) == p["k"] == 3
    for c in p["components"]:
        assert c["icov"][0][1] == c["icov"][1][0]
        assert c["weight"] > p["cutoff"] and c["t2"] is not None
        # d/√2 with d = √t2
        score_at_t = c["weight"] * (1.0 - math.erf(math.sqrt(c["t2"]) / math.sqrt(2.0)))
        assert abs(score_at_t - p["cutoff"]) < 1e-12
    # loader rejects a fixture violating the freeze-time invariant
    # t2 IS NULL ⇔ weight < cutoff (r10 advice: a miscomputed fixture
    # would silently weaken the AND predicate)
    import json
    import pytest as _pytest

    bad = json.loads(json.dumps(p))
    bad["components"][0]["t2"] = None  # weight >= cutoff but t2 nulled
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as fh:
        json.dump(bad, fh)
        badpath = fh.name
    with _pytest.raises(ValueError, match="t2 must be null iff"):
        load_frozen_gmm(badpath)


def test_frozen_mixture_agrees_with_em_scorer(spark):
    """Scoring the sf0.001 lineitem pair under the FROZEN gaussians via
    the quadratic predicate flags the same rows as MixtureModel's
    erf-based pandas scorer evaluated with the SAME parameters — the
    transform is exact, not an approximation."""
    import math

    import numpy as np

    from datalakerulegeneration_spark.dboost.models import (
        frozen_mixture_outliers,
        load_frozen_gmm,
    )

    p = load_frozen_gmm()
    li = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select(
            F.concat_ws("-", "l_orderkey", "l_linenumber").alias("__row_id"),
            "l_quantity",
            "l_extendedprice",
        )
    )
    got = {r["row_id"] for r in frozen_mixture_outliers(li).collect()}
    # python reference: max_k w·(1−erf(√maha²/√2)) < cutoff
    pdf = li.toPandas()
    X = pdf[["l_quantity", "l_extendedprice"]].to_numpy(dtype=float)
    best = np.zeros(len(X))
    for c in p["components"]:
        m = np.array(c["mean"])
        inv = np.array(c["icov"])
        D = X - m
        maha = np.sqrt(np.maximum(np.einsum("ij,ij->i", D @ inv, D), 0.0))
        s = c["weight"] * (1.0 - np.vectorize(math.erf)(maha / math.sqrt(2.0)))
        np.maximum(best, s, out=best)
    exp = set(pdf["__row_id"][best < p["cutoff"]])
    assert got == exp


def test_frozen_mixture_model_in_outliers_pipeline(spark, sensors):
    """FrozenMixtureModel composes with the other models in ONE
    outliers() union (fit is a no-op by contract; the string-value
    cast matches the _emit discrepancy schema), flagging the planted
    corruption rows under frozen parameters."""
    import math

    from datalakerulegeneration_spark.dboost import FrozenMixtureModel, GaussianModel, outliers

    # frozen "fit": one tight gaussian around the clean operating
    # point; planted (122.0, 0.1) rows sit far outside
    t2 = 2.0 * 3.0**2  # cutoff at 3 sigma-equivalents
    params = {
        "pair": ["temperature__id", "voltage__id"],
        "cutoff": 0.05,
        "components": [
            {
                "weight": 1.0,
                "mean": [21.5, 2.62],
                "icov": [[0.25, 0.0], [0.0, 400.0]],
                "t2": t2,
            }
        ],
    }
    res = outliers(
        sensors,
        sensors,
        [GaussianModel(tol=3.0), FrozenMixtureModel(params=params)],
        row_id_col="rid",
        columns=["temperature", "voltage"],
    )
    assert res.schema["value"].dataType.simpleString() == "string"
    frozen_rows = {
        int(r["row_id"])
        for r in res.where(F.col("feature") == "temperature__id|voltage__id").collect()
    }
    assert {100, 500, 900} <= frozen_rows
    # the no-op fit honors the frozen contract
    m = FrozenMixtureModel(params=params)
    assert m.fit(sensors) is m
