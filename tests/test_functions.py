"""functions module: levenshtein conflicts, quantile-sketch distances,
dataset similarity, clustering metrics — and the CSV ingest readers."""

import math
import os

import pytest
from pyspark.sql import functions as F

from datalakerulegeneration_spark.functions import (
    adjusted_rand_index,
    dataset_similarity,
    ks_distance_from_quantiles,
    levenshtein_conflicts,
    normalized_mutual_info,
    pair_accuracy,
    quantile_vector,
    wasserstein_from_quantiles,
)
from datalakerulegeneration_spark.functions.text import normalize_abbreviations


def test_levenshtein_conflicts(spark):
    df = spark.createDataFrame(
        [("birmingham",), ("birminghxm",), ("tuscaloosa",), ("birmingham",)],
        "city string",
    )
    out = levenshtein_conflicts(df, "city", max_distance=2)
    pairs = {(r["v_a"], r["v_b"], r["distance"]) for r in out.collect()}
    assert ("birmingham", "birminghxm", 1) in pairs
    assert all("tuscaloosa" not in (a, b) for a, b, _ in pairs)


def test_abbrev_normalizer(spark):
    df = spark.createDataFrame([("St. Paul",), ("Ft Worth",), ("Mt. Vernon",)], "c string")
    out = [r[0] for r in df.select(normalize_abbreviations(F.col("c"))).collect()]
    assert out == ["saint paul", "fort worth", "mount vernon"]


def test_quantile_distances(spark, sf_tables):
    ev = sf_tables["events"]
    qa = quantile_vector(ev, "value", k=16)
    qb = quantile_vector(ev.withColumn("value", F.col("value") + 10.0), "value", k=16)
    assert len(qa) == 16
    w = wasserstein_from_quantiles(qa, qb)
    assert w == pytest.approx(10.0, rel=0.05)  # pure shift → W1 = shift
    ks_same = ks_distance_from_quantiles(qa, qa)
    assert ks_same == 0.0
    ks_diff = ks_distance_from_quantiles(qa, qb)
    assert ks_diff > 0.1


def test_dataset_similarity(spark, sf_tables):
    from datalakerulegeneration_spark.profiling import dataset_profile, profile_tables

    profiles = profile_tables(
        spark, {k: sf_tables[k] for k in ("nation", "region")}, with_tokens=False
    )
    dp = dataset_profile(profiles)
    sim = dataset_similarity(dp).collect()
    assert len(sim) == 1
    assert 0.0 <= sim[0]["cosine_sim"] <= 1.0001


def test_clustering_metrics():
    perfect = pair_accuracy([0, 0, 1, 1], [5, 5, 9, 9])
    assert perfect == 1.0
    assert adjusted_rand_index([0, 0, 1, 1], [1, 1, 0, 0]) == 1.0
    assert normalized_mutual_info([0, 0, 1, 1], [1, 1, 0, 0]) == pytest.approx(1.0)
    assert adjusted_rand_index([0, 1, 0, 1], [0, 0, 1, 1]) < 0.1
    r = pair_accuracy([0, 0, 0, 1], [0, 0, 1, 1])
    assert 0.0 < r < 1.0


def test_csv_readers(spark, tmp_path):
    from datalakerulegeneration_spark.catalog import (
        read_csv_all_string,
        read_csv_normalized,
        read_delimited_typed,
    )

    p = str(tmp_path / "t.csv")
    with open(p, "w") as f:
        f.write("a,b\n 1 ,x&amp;y\n,  z   w \n")
    # S1: all-string, trimmed, nulls → ''
    df = read_csv_all_string(spark, p)
    rows = sorted(map(tuple, df.collect()))
    assert rows == [("", "z   w"), ("1", "x&amp;y")]
    # S2: normalized (html unescape + whitespace collapse)
    dfn = read_csv_normalized(spark, p)
    rows = sorted(map(tuple, dfn.collect()), key=lambda t: str(t))
    assert ("1", "x&y") in rows
    assert (None, "z w") in rows
    # S7: typed with DROPMALFORMED
    p2 = str(tmp_path / "s.tsv")
    with open(p2, "w") as f:
        f.write("1\t2.5\nbad\tworse\n3\t4.5\n")
    dt = read_delimited_typed(spark, p2, sep="\t", floats_only=True)
    vals = sorted(map(tuple, dt.collect()))
    assert vals == [(1.0, 2.5), (3.0, 4.5)]


def test_jsonl_roundtrip_and_malformed(spark, tmp_path):
    """JSONL source/sink: round-trip preserves rows; malformed lines
    drop (or quarantine into _corrupt_record with drop_malformed off)."""
    from datalakerulegeneration_spark.catalog import read_jsonl, write_jsonl

    df = spark.createDataFrame(
        [(1, "hello world", "web"), (2, "ça va héhé", "books")],
        "doc_id long, text string, source string",
    )
    out = str(tmp_path / "corpus")
    write_jsonl(df, out, compression="gzip")
    back = read_jsonl(spark, out, schema="doc_id long, text string, source string")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))

    # hand-written file with one broken line
    raw = tmp_path / "raw.jsonl"
    raw.write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok"}\n'
    )
    clean = read_jsonl(spark, str(raw), schema="doc_id long, text string")
    assert {r["doc_id"] for r in clean.collect()} == {1, 2}
    quarantined = read_jsonl(
        spark,
        str(raw),
        schema="doc_id long, text string, _corrupt_record string",
        drop_malformed=False,
    )
    bad = [r for r in quarantined.collect() if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and "not json" in bad[0]["_corrupt_record"]


def test_folder_discovery_and_csv_sink(spark, tmp_path):
    """S5 dataset-folder discovery + S8 CSV sink round-trip."""
    import os

    from datalakerulegeneration_spark.catalog import (
        discover_dataset_folders,
        read_csv_all_string,
        write_csv,
    )

    root = tmp_path / "lake"
    for group, name, kinds in (
        ("Quintet", "beers", ("dirty", "clean")),
        ("Quintet", "movies", ("dirty",)),
    ):
        d = root / group / name
        os.makedirs(d)
        for kind in kinds:
            (d / f"{kind}.csv").write_text("a,b\n1,x\n")
    cat = discover_dataset_folders(spark, str(root))
    rows = sorted(map(tuple, cat.collect()))
    assert [(g, t, k) for g, t, k, _ in rows] == [
        ("Quintet", "beers", "clean"),
        ("Quintet", "beers", "dirty"),
        ("Quintet", "movies", "dirty"),
    ]
    # discovered paths are readable, and the sink round-trips
    df = read_csv_all_string(spark, rows[0][3])
    out = str(tmp_path / "out_csv")
    write_csv(df, out)
    back = sorted(map(tuple, read_csv_all_string(spark, out).collect()))
    assert back == sorted(map(tuple, df.collect()))
    # missing root yields an empty catalog, not an error
    assert discover_dataset_folders(spark, str(tmp_path / "nope")).count() == 0


def test_strategy_predictor(spark, sf_tables):
    from datalakerulegeneration_spark.clustering.predictor import (
        predict_strategy_performance,
        train_strategy_predictor,
    )
    from datalakerulegeneration_spark.profiling import profile_tables

    profiles = profile_tables(
        spark, {k: sf_tables[k] for k in ("nation", "region", "supplier", "customer")},
        with_tokens=False,
    )
    labeled = profiles.withColumn("perf", F.col("unique_ratio"))
    model, va, feats = train_strategy_predictor(labeled, "perf")
    pred = predict_strategy_performance(profiles, model, va, feats)
    rows = {r["unique_id"]: r["predicted_performance"] for r in pred.collect()}
    assert len(rows) == profiles.count()
    # the label IS a feature → near-perfect fit expected
    truth = {r["unique_id"]: r["unique_ratio"] for r in profiles.collect()}
    err = sum(abs(rows[k] - truth[k]) for k in rows) / len(rows)
    assert err < 0.1


def test_jdbc_roundtrip_derby(spark, tmp_path):
    """S6 executed for real: embedded Apache Derby (the JDBC driver
    Spark ships in its own jars/) — write via Spark JDBC, read back
    with read_jdbc in both query mode and PARTITIONED dbtable mode,
    asserting the partitioned read actually splits into numPartitions
    range-predicated scans."""
    from datalakerulegeneration_spark.catalog import read_jdbc

    url = f"jdbc:derby:{tmp_path}/testdb;create=true"
    src = spark.range(0, 100).selectExpr(
        "id", "cast(id % 7 as double) as v", "concat('row-', id) as s"
    )
    src.write.format("jdbc").option("url", url).option("dbtable", "T1").save()

    # Derby upper-cases unquoted identifiers; Spark created the columns
    # quoted-lowercase, so the pushed query must quote them too
    out = read_jdbc(spark, url, query='SELECT * FROM T1 WHERE "v" < 6.0')
    rows = {r["id"] for r in out.collect()}
    assert rows == {i for i in range(100) if i % 7 < 6}

    part = read_jdbc(
        spark, url, dbtable="T1",
        partitionColumn="id", lowerBound=0, upperBound=100, numPartitions=4,
    )
    got = part.select("id", "v").collect()
    assert sorted(r["id"] for r in got) == list(range(100))
    n_parts = part.select(F.spark_partition_id().alias("p")).distinct().count()
    assert n_parts == 4

    with pytest.raises(ValueError):
        read_jdbc(spark, url)
    with pytest.raises(ValueError):
        read_jdbc(spark, url, query="SELECT 1", dbtable="T1")
