"""Column clustering entry points (M1-M3).

* ``cluster_columns_dbscan`` — the reference's primary path
  (utils/clustering.py:23-83): scaled profile vectors → DBSCAN →
  ``clusters`` DataFrame (unique_id, cluster_id); noise (-1) dropped.
* ``cluster_columns_kmeans`` — Spark ML KMeans variant
  (utils/clustering.py:87-165) with unique-point k clamping.
* ``two_stage_clustering`` — stage 1 groups TABLES by name-trigram
  Jaccard (a deterministic, dependency-free stand-in for the
  reference's sentence-transformer embeddings —
  utils/two_stage_clustering.py:73-120; documented delta §7.3.1),
  stage 2 DBSCANs each table-group's column profiles; noise becomes
  singletons, small groups pass through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalakerulegeneration_spark.clustering.dbscan import dbscan
from datalakerulegeneration_spark.clustering.features import profile_feature_matrix


def _labels_df(profiles: DataFrame, ids: list[str], labels) -> DataFrame:
    spark = profiles.sparkSession
    rows = [
        (uid, int(lbl)) for uid, lbl in zip(ids, labels) if lbl != -1
    ]
    return spark.createDataFrame(rows or [], "unique_id string, cluster_id int")


def cluster_columns_dbscan(
    profiles: DataFrame,
    eps: float = 0.5,
    min_samples: int = 1,
    features: list[str] | None = None,
) -> DataFrame:
    """``(unique_id, cluster_id)`` clusters of column profiles."""
    ids, mat = profile_feature_matrix(profiles, features)
    labels = dbscan(mat, eps=eps, min_samples=min_samples)
    return _labels_df(profiles, ids, labels)


def cluster_columns_kmeans(
    profiles: DataFrame, k: int = 5, features: list[str] | None = None, seed: int = 42
) -> DataFrame:
    """Spark ML KMeans over scaled profile vectors; k clamped to the
    number of distinct points (reference utils/clustering.py:97-104)."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import MinMaxScaler, VectorAssembler

    from datalakerulegeneration_spark.clustering.features import DEFAULT_FEATURES

    feats = [f for f in (features or DEFAULT_FEATURES) if f in profiles.columns]
    filled = profiles.select(
        "unique_id", *[F.coalesce(F.col(f), F.lit(0.0)).alias(f) for f in feats]
    )
    va = VectorAssembler(inputCols=feats, outputCol="__raw")
    assembled = va.transform(filled)
    scaled = MinMaxScaler(inputCol="__raw", outputCol="__vec").fit(assembled).transform(assembled)
    n_unique = scaled.select("__vec").distinct().count()
    k_eff = max(1, min(k, n_unique))
    km = KMeans(k=k_eff, featuresCol="__vec", predictionCol="cluster_id", seed=seed)
    return km.fit(scaled).transform(scaled).select(
        "unique_id", F.col("cluster_id").cast("int")
    )


def _name_trigrams(name: str) -> set[str]:
    s = f"  {name.lower()}  "
    return {s[i : i + 3] for i in range(len(s) - 2)}


def two_stage_clustering(
    profiles: DataFrame,
    name_jaccard_min: float = 0.4,
    eps: float = 0.5,
    min_samples: int = 1,
    name_embedding_fn=None,
    embedding_eps: float = 0.2,
) -> DataFrame:
    """Stage 1: table groups by name similarity; stage 2: DBSCAN per
    group; noise → singleton clusters. Returns (unique_id, cluster_id).

    Stage-1 similarity is trigram Jaccard by default (deterministic,
    dependency-free). Pass ``name_embedding_fn(names: list[str]) ->
    ndarray`` to plug a real sentence-embedding model back in — that
    restores the reference's cosine-DBSCAN stage
    (utils/two_stage_clustering.py:73-120) when a model is available.
    """
    tables = [r["table"] for r in profiles.select("table").distinct().collect()]
    tables.sort()

    if name_embedding_fn is not None:
        import numpy as np

        emb = np.asarray(name_embedding_fn(tables))
        labels = dbscan(emb, eps=embedding_eps, min_samples=1, metric="cosine")
        groups_by_label: dict[int, list[str]] = {}
        for t, lbl in zip(tables, labels):
            groups_by_label.setdefault(int(lbl), []).append(t)
        return _stage2(profiles, sorted(groups_by_label.values()), eps, min_samples)

    grams = {t: _name_trigrams(t) for t in tables}
    parent = {t: t for t in tables}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(tables):
        for b in tables[i + 1 :]:
            inter = len(grams[a] & grams[b])
            union = len(grams[a] | grams[b])
            if union and inter / union >= name_jaccard_min:
                parent[find(a)] = find(b)
    groups: dict[str, list[str]] = {}
    for t in tables:
        groups.setdefault(find(t), []).append(t)
    return _stage2(profiles, [m for _, m in sorted(groups.items())], eps, min_samples)


def _stage2(
    profiles: DataFrame, groups: list[list[str]], eps: float, min_samples: int
) -> DataFrame:
    """Per-table-group profile DBSCAN; noise → singletons."""
    spark = profiles.sparkSession
    out_rows: list[tuple[str, int]] = []
    next_cid = 0
    for members in groups:
        sub = profiles.where(F.col("table").isin(members))
        ids, mat = profile_feature_matrix(sub)
        if len(ids) == 0:
            continue
        labels = dbscan(mat, eps=eps, min_samples=min_samples)
        remap: dict[int, int] = {}
        for uid, lbl in zip(ids, labels):
            if lbl == -1:
                out_rows.append((uid, next_cid))
                next_cid += 1
            else:
                if lbl not in remap:
                    remap[lbl] = next_cid
                    next_cid += 1
                out_rows.append((uid, remap[lbl]))
    return spark.createDataFrame(out_rows or [], "unique_id string, cluster_id int")


# ---------------------------------------------------------------------------
# Frozen-parameter serving split for column clustering (r9) — the
# bpe_learn/bpe_encode pattern applied to M2: the KMeans FIT is
# iterative ML (cluster_columns_kmeans above, rows-only by nature),
# but ASSIGNMENT against a frozen scaler + centroid table is pure
# expression arithmetic with an exact DuckDB twin. Together with the
# wide-profile SQL builder (profiling.wide_sql) this gives the column
# catalog's cluster assignment an END-TO-END exact oracle: raw tables
# → per-column stats → frozen MinMax scaling → nearest centroid.
#
# Exactness recipe (the semdedup_frozen + frozen-GMM mix):
# * features quantize at DECIMAL(18,6) → BIGINT micro-units (the
#   registry's standard portable float boundary), NULL → 0.0 first
#   (profile_feature_matrix's fill);
# * the frozen scaler's min/range are micro-unit INTEGER literals, so
#   scaled = CAST(x6-min6 AS DOUBLE) / CAST(range6 AS DOUBLE) is the
#   same IEEE division of the same integers in both engines —
#   bit-identical doubles (constant features → 0.5, the Spark
#   MinMaxScaler convention);
# * centroids are frozen at 6 decimals and enter both engines as
#   CAST('<repr>' AS DOUBLE) literals; squared distances are the same
#   left-associated chain, so the (dist², cluster_id) argmin cannot
#   diverge.
# ---------------------------------------------------------------------------


def _micro6(x: float) -> int:
    """Exact micro-unit integer of a 6-decimal-quantized value
    (shared convention: functions.exact.micro6)."""
    from datalakerulegeneration_spark.functions.exact import micro6

    return micro6(x)


def load_frozen_colcluster(path: str | None = None) -> dict:
    """Load the vendored frozen column-cluster model
    (``tools/gen_frozen_fixtures.py``: the pinned sf0.01
    cluster_columns_kmeans fit — feature list, per-feature MinMax
    bounds, centroids in scaled space, all quantized at 6 decimals)."""
    import json
    import os

    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "resources",
            "fixture_colcluster.json",
        )
    with open(path) as fh:
        params = json.load(fh)
    _validate_colcluster_params(params)
    return params


def _validate_colcluster_params(params: dict) -> None:
    """Shape + safe-identifier checks for a frozen colcluster params
    dict. Runs on EVERY params source — the vendored fixture loader
    and caller-supplied dicts alike — because the feature names are
    interpolated into SQL expressions."""
    feats, mins, maxs = params["features"], params["min"], params["max"]
    if not (len(feats) == len(mins) == len(maxs)):
        raise ValueError("frozen colcluster: features/min/max lengths differ")
    if not params["centroids"] or any(
        len(c) != len(feats) for c in params["centroids"]
    ):
        raise ValueError("frozen colcluster: centroid width must match features")
    for f in feats:
        if not f.replace("_", "").isalnum() or f != f.lower():
            raise ValueError(f"frozen colcluster feature is not a safe identifier: {f!r}")


def _scaled_feature_sql(feat: str, fmin: float, fmax: float) -> str:
    """One frozen-scaled feature as a shared-verbatim SQL expression:
    micro-unit quantize → integer shift → one IEEE division."""
    min6, max6 = _micro6(fmin), _micro6(fmax)
    range6 = max6 - min6
    x6 = (
        f"CAST(CAST(COALESCE({feat}, CAST('0.0' AS DOUBLE)) AS DECIMAL(18,6))"
        f" * 1000000 AS BIGINT)"
    )
    if range6 == 0:  # constant feature at fit time → MinMaxScaler's 0.5
        return "CAST('0.5' AS DOUBLE)"
    return f"(CAST({x6} - {min6} AS DOUBLE) / CAST({range6} AS DOUBLE))"


def cluster_columns_frozen(profiles: DataFrame, params: dict | None = None) -> DataFrame:
    """Assign column profiles to the FROZEN cluster model —
    ``(unique_id, cluster_id)`` like :func:`cluster_columns_kmeans`,
    but deterministic serving with an exact oracle
    (:func:`cluster_columns_frozen_sql`).

    Scale shape: scaling is map-side arithmetic; the centroid table
    broadcasts (k rows); the argmin is a map-side-combinable
    min(struct(dist², cluster_id)) — the committed semdedup_frozen
    shape, never a per-row window. At a million-column catalog this
    is one scan of the profile frame."""
    if params is None:
        params = load_frozen_colcluster()
    else:
        _validate_colcluster_params(params)
    feats = params["features"]
    scaled = profiles.select(
        "unique_id",
        *[
            F.expr(_scaled_feature_sql(f, mn, mx)).alias(f"_s{i}")
            for i, (f, mn, mx) in enumerate(zip(feats, params["min"], params["max"]))
        ],
    )
    spark = profiles.sparkSession
    cents = spark.createDataFrame(
        [tuple([i] + [float(round(x, 6)) for x in c]) for i, c in enumerate(params["centroids"])],
        ", ".join(["cid int"] + [f"_c{i} double" for i in range(len(feats))]),
    )
    dist2 = " + ".join(
        f"((_s{i} - _c{i}) * (_s{i} - _c{i}))" for i in range(len(feats))
    )
    return (
        scaled.crossJoin(F.broadcast(cents))
        .select("unique_id", "cid", F.expr(dist2).alias("_d2"))
        .groupBy("unique_id")
        .agg(F.min(F.struct("_d2", "cid")).alias("_best"))
        .select("unique_id", F.col("_best.cid").cast("int").alias("cluster_id"))
    )


def cluster_columns_frozen_sql(profiles_sql: str, params: dict | None = None) -> str:
    """Exact DuckDB oracle for :func:`cluster_columns_frozen`:
    ``profiles_sql`` is a query producing the wide profile frame
    (profiling.wide_sql builders); the same shared-verbatim scaling
    expressions and distance chain run over it."""
    if params is None:
        params = load_frozen_colcluster()
    else:
        _validate_colcluster_params(params)
    feats = params["features"]
    scaled_cols = ",\n         ".join(
        f"{_scaled_feature_sql(f, mn, mx)} AS _s{i}"
        for i, (f, mn, mx) in enumerate(zip(feats, params["min"], params["max"]))
    )
    rows = ",\n    ".join(
        "(%d, %s)"
        % (
            i,
            ", ".join(f"CAST('{round(float(x), 6)!r}' AS DOUBLE)" for x in c),
        )
        for i, c in enumerate(params["centroids"])
    )
    cent_cols = ", ".join(["cid"] + [f"_c{i}" for i in range(len(feats))])
    dist2 = " + ".join(
        f"((_s{i} - _c{i}) * (_s{i} - _c{i}))" for i in range(len(feats))
    )
    return f"""
WITH _colprof AS ({profiles_sql}),
scaled AS (
  SELECT unique_id,
         {scaled_cols}
  FROM _colprof
),
cents(
  {cent_cols}
) AS (
  VALUES
    {rows}
),
d AS (
  SELECT unique_id, cid, {dist2} AS _d2
  FROM scaled CROSS JOIN cents
)
SELECT unique_id, CAST(cid AS INTEGER) AS cluster_id FROM (
  SELECT *, row_number() OVER (PARTITION BY unique_id ORDER BY _d2, cid) AS _rn FROM d
) WHERE _rn = 1
"""
