"""Clustering + rule sharing + threshold training."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datalakerulegeneration_spark.clustering import (
    cluster_columns_dbscan,
    cluster_columns_kmeans,
    dbscan,
    shared_rules_by_sample_column,
    shared_rules_by_threshold,
    train_profile_thresholds,
    two_stage_clustering,
    rule_centric_confidence,
)
from datalakerulegeneration_spark.clustering.sharing import thresholds_to_rules
from datalakerulegeneration_spark.profiling import profile_tables
from datalakerulegeneration_spark.rules import load_all_rules


@pytest.fixture(scope="module")
def profiles(spark, sf_tables):
    return profile_tables(
        spark,
        {k: sf_tables[k] for k in ("nation", "region", "supplier")},
        with_tokens=False,
    )


def test_dbscan_basic():
    mat = np.array([[0.0, 0.0], [0.1, 0.0], [0.0, 0.1], [5.0, 5.0], [5.1, 5.0]])
    labels = dbscan(mat, eps=0.5, min_samples=1)
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4]
    assert labels[0] != labels[3]
    # min_samples > cluster size → noise
    labels2 = dbscan(mat, eps=0.05, min_samples=2)
    assert (labels2 == -1).all()


def test_dbscan_blocked_matches_exact():
    """The lake-catalog-width hatch (r12 probe): block-wise union-find
    components must equal the exact min_samples=1 DBSCAN labels —
    including the BFS label numbering — across block boundaries and
    chain-shaped clusters that span several stripes."""
    from datalakerulegeneration_spark.clustering.dbscan import (
        dbscan_components_blocked,
    )

    rng = np.random.RandomState(7)
    centers = rng.uniform(0.0, 6.0, size=(9, 5))
    mat = np.vstack(
        [centers[rng.randint(0, 9)] + rng.normal(0, 0.04, 5) for _ in range(500)]
    )
    # a chain cluster: consecutive points within eps, endpoints far apart
    chain = np.linspace(0.0, 30.0, 120)[:, None] * np.ones((1, 5)) + 100.0
    mat = np.vstack([mat, chain])
    exact = dbscan(mat, eps=0.5, min_samples=1)
    for block in (64, 100, 1024):
        blocked = dbscan_components_blocked(mat, eps=0.5, block=block)
        assert (exact == blocked).all()


def test_cluster_columns_dbscan(spark, profiles):
    clusters = cluster_columns_dbscan(profiles, eps=0.5, min_samples=1)
    rows = clusters.collect()
    assert len(rows) == profiles.count()  # min_samples=1 → no noise
    # key-like columns (unique, numeric) should co-cluster
    byid = {r["unique_id"]: r["cluster_id"] for r in rows}
    assert byid["nation::n_nationkey"] == byid["region::r_regionkey"]


def test_cluster_columns_kmeans(spark, profiles):
    clusters = cluster_columns_kmeans(profiles, k=4)
    assert clusters.select("cluster_id").distinct().count() <= 4
    assert clusters.count() == profiles.count()
    # deterministic with fixed seed
    a = sorted(map(tuple, clusters.collect()))
    b = sorted(map(tuple, cluster_columns_kmeans(profiles, k=4).collect()))
    assert a == b


def test_two_stage(spark, profiles):
    clusters = two_stage_clustering(profiles, name_jaccard_min=0.4)
    assert clusters.count() == profiles.count()


def test_two_stage_embedding_hook(spark, profiles):
    """Pluggable name-embedding stage 1 (the reference's
    sentence-transformer path) via a deterministic fake embedder."""
    import hashlib

    import numpy as np

    def fake_embed(names):
        out = []
        for n in names:
            h = hashlib.md5(n.encode()).digest()
            out.append([b / 255.0 for b in h[:8]])
        return np.array(out)

    clusters = two_stage_clustering(profiles, name_embedding_fn=fake_embed, embedding_eps=0.05)
    assert clusters.count() == profiles.count()
    a = sorted(map(tuple, clusters.collect()))
    b = sorted(map(tuple, two_stage_clustering(
        profiles, name_embedding_fn=fake_embed, embedding_eps=0.05).collect()))
    assert a == b


def test_auto_labeler(spark, profiles):
    """Reference auto_labeler cascade: ID-like, numeric, text, date
    clusters labeled from aggregate profile features; config assembly
    merges defaults + overrides."""
    from datalakerulegeneration_spark.clustering import (
        auto_label_clusters,
        build_rule_config,
        cluster_columns_dbscan,
    )
    from datalakerulegeneration_spark.clustering.auto_labeler import to_yaml

    clusters = cluster_columns_dbscan(profiles, eps=0.5, min_samples=1)
    labeled = auto_label_clusters(profiles, clusters)
    rows = {r["cluster_id"]: r for r in labeled.collect()}
    assert rows and all(
        r["label"] in ("ID_like", "Numeric_like", "Text_like", "Date_like", "Other")
        for r in rows.values()
    )
    # key columns (unique, non-null) must label ID_like; the labeled
    # set covers every cluster
    by_member = {m: r["label"] for r in rows.values() for m in r["members"]}
    assert by_member["nation::n_nationkey"] == "ID_like"
    assert set(by_member) == {r["unique_id"] for r in clusters.collect()}

    cfg = build_rule_config(labeled, overrides={"nation::n_name": [{"rule": "is_unique"}]})
    assert cfg["cluster_profiles"]["ID_like"]["defaults"] == [{"rule": "is_unique"}]
    assert cfg["overrides"]["nation::n_name"]
    assert len(cfg["clusters"]) == len(rows)
    assert "cluster_profiles" in to_yaml(cfg)


def test_shared_rules_sample_column(spark, profiles):
    from datalakerulegeneration_spark.rules.spec import Rule

    clusters = cluster_columns_dbscan(profiles)
    rules = [
        Rule("anchored", sample_columns=("nation::n_nationkey",)),
        Rule("unanchored", sample_columns=("nope::missing",)),
    ]
    shared = shared_rules_by_sample_column(clusters, rules)
    names = {r["rule"] for r in shared.collect()}
    assert names == {"anchored"}


def test_shared_rules_threshold(spark, profiles):
    clusters = cluster_columns_dbscan(profiles)
    shared = shared_rules_by_threshold(profiles, clusters, load_all_rules(), threshold=0.7)
    rows = shared.collect()
    assert len(rows) > 0
    # every member of the nationkey/regionkey cluster is unique+non-null
    byid = {r["unique_id"]: r["cluster_id"] for r in clusters.collect()}
    cid = byid["nation::n_nationkey"]
    cluster_rules = {r["rule"] for r in rows if r["cluster_id"] == cid}
    assert "is_not_nullable" in cluster_rules


def test_train_thresholds_and_materialize(spark, profiles):
    th = train_profile_thresholds(profiles)
    rows = th.collect()
    feats = {r["feature"] for r in rows}
    assert "null_ratio" in feats and "unique_ratio" in feats
    nr = next(r for r in rows if r["feature"] == "null_ratio")
    assert nr["lo"] == 0.0 and nr["hi"] == 0.0  # all test columns null-free
    rules = thresholds_to_rules(th)
    assert any(r.name.startswith("trained_null_ratio") for r in rules)
    # trained rule applies to every clean column
    from datalakerulegeneration_spark.rules import rules_for_profiles

    matched = rules_for_profiles(profiles, [r for r in rules if "null_ratio" in r.name])
    assert matched.count() == profiles.count()


def test_rule_centric_confidence(spark, profiles):
    conf = rule_centric_confidence(profiles, load_all_rules())
    rows = conf.collect()
    assert rows and all(0.0 <= r["confidence"] <= 1.0 for r in rows)


def test_k_distance_and_eps_suggestion():
    # W7 (utils/clustering.py:9-21): sorted k-NN distance curve + knee
    import numpy as np

    from datalakerulegeneration_spark.clustering.dbscan import k_distances, suggest_eps

    # two tight clusters far apart: k-distances are small within
    # clusters, so the suggested eps must sit well under the gap
    a = np.array([[0.0, 0.0], [0.1, 0.0], [0.0, 0.1], [0.1, 0.1]])
    b = a + 10.0
    mat = np.vstack([a, b])
    d = k_distances(mat, k=2)
    assert len(d) == 8 and np.all(np.diff(d) >= 0)      # sorted curve
    assert d[-1] <= 0.15                                 # 2nd NN stays in-cluster
    eps = suggest_eps(mat, k=2)
    assert 0.0 < eps <= 0.15
    # degenerate inputs
    assert len(k_distances(np.empty((0, 2)))) == 0
    assert suggest_eps(np.array([[1.0, 1.0]])) >= 0.0


def test_cluster_columns_frozen_planted(spark):
    """Frozen column-cluster serving split (r9): micro-unit feature
    quantization → integer-shift MinMax scaling (constant features →
    0.5) → nearest frozen centroid with (dist², cid) tie-break — and
    exact parity with the DuckDB twin on a planted profile frame."""
    import duckdb
    import pandas as pd

    from datalakerulegeneration_spark.clustering.cluster import (
        cluster_columns_frozen,
        cluster_columns_frozen_sql,
    )

    params = {
        "features": ["null_ratio", "avg_len"],
        "min": [0.0, 0.0],
        "max": [1.0, 10.0],
        "centroids": [[0.1, 0.1], [0.9, 0.9]],
    }
    rows = [
        ("t::a", 0.05, 1.0),   # scaled (0.05, 0.1) → cluster 0
        ("t::b", 0.95, 9.0),   # scaled (0.95, 0.9) → cluster 1
        ("t::c", 0.5, 5.0),    # scaled (0.5, 0.5) equidistant → cid 0
        ("t::d", None, None),  # NULL fill → (0.0, 0.0) → cluster 0
    ]
    df = spark.createDataFrame(rows, "unique_id string, null_ratio double, avg_len double")
    got = {r["unique_id"]: r["cluster_id"] for r in cluster_columns_frozen(df, params).collect()}
    assert got == {"t::a": 0, "t::b": 1, "t::c": 0, "t::d": 0}
    con = duckdb.connect()
    con.register("prof", pd.DataFrame(rows, columns=["unique_id", "null_ratio", "avg_len"]))
    exp = dict(con.execute(cluster_columns_frozen_sql("SELECT * FROM prof", params)).fetchall())
    assert exp == got
    # constant feature at fit time scales to 0.5 on BOTH engines —
    # distances shift equally, assignments keep matching
    cparams = dict(params, min=[0.0, 3.0], max=[1.0, 3.0])
    got_c = {r["unique_id"]: r["cluster_id"] for r in cluster_columns_frozen(df, cparams).collect()}
    exp_c = dict(con.execute(cluster_columns_frozen_sql("SELECT * FROM prof", cparams)).fetchall())
    assert got_c == exp_c
    # loader validation
    import json as _json
    import os as _os
    import tempfile

    import pytest as _pytest

    from datalakerulegeneration_spark.clustering.cluster import load_frozen_colcluster

    good = load_frozen_colcluster()
    assert good["features"] and len(good["min"]) == len(good["features"])
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as fh:
        _json.dump({"features": ["a"], "min": [0.0], "max": [0.0, 1.0], "centroids": [[0.0]]}, fh)
    try:
        with _pytest.raises(ValueError, match="lengths differ"):
            load_frozen_colcluster(fh.name)
    finally:
        _os.unlink(fh.name)
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as fh:
        _json.dump({"features": ["a; drop"], "min": [0.0], "max": [1.0], "centroids": [[0.0]]}, fh)
    try:
        with _pytest.raises(ValueError, match="safe identifier"):
            load_frozen_colcluster(fh.name)
    finally:
        _os.unlink(fh.name)
    # the SAME validation guards a caller-supplied params dict — the
    # feature names are interpolated into SQL, so an explicit params
    # path must not bypass the identifier check (r10 advice)
    inj = dict(params, features=["null_ratio", "avg_len FROM x; --"])
    with _pytest.raises(ValueError, match="safe identifier"):
        cluster_columns_frozen(df, inj)
    with _pytest.raises(ValueError, match="safe identifier"):
        cluster_columns_frozen_sql("SELECT * FROM prof", inj)
    with _pytest.raises(ValueError, match="lengths differ"):
        cluster_columns_frozen(df, dict(params, min=[0.0]))


def test_two_stage_hashed_trigram_seam(spark, sf_tables):
    """The name_embedding_fn seam driven END-TO-END by the vendored
    deterministic embedding fixture (functions.fixture_embedding —
    seeded md5 hashed-trigram projection; the sentence-transformer
    stand-in, reference utils/two_stage_clustering.py:73-120). The
    embedding must actually CHANGE stage-1 grouping: near-identical
    table names share trigrams → one group → their twin columns can
    co-cluster; an unrelated name lands in its own group, so its
    columns can never share a cluster id with the others."""
    from datalakerulegeneration_spark.functions.fixture_embedding import (
        hashed_trigram_embedding,
    )
    from datalakerulegeneration_spark.profiling import profile_tables

    sup = sf_tables["supplier"]
    tables = {
        "supplier_2023": sup,
        "supplier_2024": sup,  # same data → identical column profiles
        "nation": sf_tables["nation"],
    }
    prof = profile_tables(spark, tables, with_tokens=False)
    emb = lambda names: hashed_trigram_embedding(names, dim=16, seed=7)

    clusters = two_stage_clustering(
        prof, name_embedding_fn=emb, embedding_eps=0.3
    )
    rows = {r["unique_id"]: r["cluster_id"] for r in clusters.collect()}
    assert len(rows) == prof.count()
    # determinism across runs
    rows2 = {
        r["unique_id"]: r["cluster_id"]
        for r in two_stage_clustering(
            prof, name_embedding_fn=emb, embedding_eps=0.3
        ).collect()
    }
    assert rows == rows2
    # the supplier twins share trigrams → same stage-1 group → their
    # identical per-column profiles co-cluster column-for-column
    for c in ("s_suppkey", "s_name", "s_nationkey", "s_acctbal"):
        assert rows[f"supplier_2023::{c}"] == rows[f"supplier_2024::{c}"]
    # nation shares no trigrams with supplier_* → its own group →
    # disjoint cluster ids from every supplier column
    nation_cids = {v for k, v in rows.items() if k.startswith("nation::")}
    supplier_cids = {v for k, v in rows.items() if k.startswith("supplier_")}
    assert nation_cids.isdisjoint(supplier_cids)
    # the fixture itself: deterministic, unit-norm, zero for empty
    import numpy as np

    e = hashed_trigram_embedding(["orders", "orders", ""], dim=16, seed=7)
    assert np.allclose(e[0], e[1]) and np.allclose(e[2], 0.0)
    assert abs(float(np.linalg.norm(e[0])) - 1.0) < 1e-9
