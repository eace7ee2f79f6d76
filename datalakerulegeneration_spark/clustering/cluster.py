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
