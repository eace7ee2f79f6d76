"""Similarity search over an embedding column (``array<float>``).

* **brute-force cosine top-k** — the exact baseline: block-nested-loop
  expressed as a crossJoin + ranked window. Correct at any k; O(n·m)
  — use only when one side is small or as the verification oracle.
* **LSH-bucketed top-k** — the scale path: random-hyperplane signatures
  bucket the vectors; candidates = same-bucket pairs; exact cosine
  re-rank inside buckets. Hyperplanes are generated deterministically
  from md5 so the plan is reproducible run-to-run (no Math.random).

Floats: cosine is computed in double; for oracle-checked outputs the
similarity is rounded to 6 decimals (sum order across 64 dims differs
at ~1e-15 between engines) and ties rank by neighbor id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str) -> str:
    # left-fold in array order — same evaluation order DuckDB's
    # list_dot_product uses; rounded downstream anyway.
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        " cast(0.0 as double), (acc, v) -> acc + v)"
    )


def cosine_expr(a: str, b: str) -> str:
    """Spark SQL cosine similarity between two float-array columns."""
    return (
        f"{_dot(a, b)} / (sqrt({_dot(a, a)}) * sqrt({_dot(b, b)}))"
    )


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    ``(query_id, neighbor_id, cos_sim, rank)``; similarity rounded to
    6 dp, rank ties broken by neighbor id. Queries are broadcast —
    at scale this is "small probe set vs huge corpus", the right
    brute-force shape.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
    )
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    scored = v.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.round(F.expr(cosine_expr("qv", "nv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def brute_force_topk_sql(
    vectors_table: str,
    queries_sql: str,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle for :func:`brute_force_topk`. ``queries_sql`` is a
    subquery yielding (query_id, qv)."""
    return f"""
WITH q AS ({queries_sql}),
scored AS (
  SELECT q.query_id, v.{id_col} AS neighbor_id,
         round(
           list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(v.{vec_col} AS DOUBLE[]))
           / (sqrt(list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(q.qv AS DOUBLE[])))
              * sqrt(list_dot_product(CAST(v.{vec_col} AS DOUBLE[]), CAST(v.{vec_col} AS DOUBLE[])))),
           6) AS cos_sim
  FROM {vectors_table} v, q
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
WHERE rank <= {k}
"""


def random_hyperplanes(dim: int, n_planes: int, seed: int = 0) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 (no RNG state).

    Component (p, d) = ±1 by md5 parity — cheap, reproducible, and
    adequate for sign-LSH bucketing. ``seed`` namespaces hash tables.
    """
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            row.append(1.0 if int(h[:2], 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def _bucket_signatures(
    df: DataFrame,
    id_alias: str,
    vec_alias: str,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int,
    n_tables: int,
) -> DataFrame:
    """(id, vec, table, bucket) — one signature row per hash table.

    Multi-table sign-LSH: each table has its own deterministic plane
    set (seeded by table index); a pair is a candidate if it collides
    in ANY table (OR-amplification → recall scales with n_tables).

    ONE scan: all n_tables signatures are computed in a single
    projection (plane literals inlined per table) and fanned out by
    posexplode — the previous union-of-per-table-frames shape re-read
    the vector source n_tables times (16 parquet scans for the default
    8-table near-dup plan; at 100 TB that is 15 wasted corpus passes).
    """

    def plane_sql(planes: list[list[float]]) -> str:
        return (
            "array("
            + ", ".join(
                "array(" + ", ".join(f"cast({x!r} as double)" for x in row) + ")"
                for row in planes
            )
            + ")"
        )

    sigs = []
    for t in range(n_tables):
        planes = random_hyperplanes(dim, n_planes, seed=t)
        sigs.append(
            f"aggregate(transform({plane_sql(planes)}, p -> "
            f"case when aggregate(zip_with(p, {vec_col}, (x, y) -> x * cast(y as double)),"
            " cast(0.0 as double), (acc, v) -> acc + v) >= 0 then 1 else 0 end),"
            " (0L, 0), (acc, b) -> (acc.col1 * 2 + b, 0), acc -> acc.col1)"
        )
    return df.select(
        F.col(id_col).alias(id_alias),
        F.col(vec_col).alias(vec_alias),
        F.posexplode(F.array(*[F.expr(s) for s in sigs])).alias("table_idx", "bucket"),
    )


def lsh_bucket_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: multi-table sign-LSH bucket join + exact
    re-rank of candidates.

    Each of ``n_tables`` hash tables has 2^n_planes buckets; a query
    compares only against vectors sharing a bucket in some table.
    Recall grows with n_tables (OR) and shrinks with n_planes (AND) —
    the standard LSH trade; compute is ~n_tables·n/2^n_planes
    candidates per query instead of n.
    """
    dim = len(vectors.select(vec_col).first()[0])
    v = _bucket_signatures(
        vectors, "neighbor_id", "nv", id_col, vec_col, dim, n_planes, n_tables
    )
    q = _bucket_signatures(
        queries, "query_id", "qv", query_id_col, query_vec_col, dim, n_planes, n_tables
    )
    cands = (
        v.join(q, ["table_idx", "bucket"])
        .select("query_id", "qv", "neighbor_id", "nv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        F.round(F.expr(cosine_expr("qv", "nv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def lsh_bucket_topk_sql(
    vectors_table: str,
    queries_sql: str,
    k: int,
    n_planes: int,
    n_tables: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle for :func:`lsh_bucket_topk` — possible because the
    hyperplanes are md5-derived ±1 literals, not RNG state: the same
    plane constants are baked into both engines' plans, the dot products
    evaluate in identical array order in double, and ranking ties break
    by neighbor id. ``queries_sql`` yields (query_id, qv)."""

    def bucket(vec_expr: str, table: int) -> str:
        planes = random_hyperplanes(dim, n_planes, seed=table)
        terms = []
        for p, row in enumerate(planes):
            lit = "[" + ", ".join(f"{x:.1f}" for x in row) + "]"
            w = 1 << (n_planes - 1 - p)
            terms.append(
                f"(CASE WHEN list_dot_product(CAST({vec_expr} AS DOUBLE[]), {lit}) >= 0"
                f" THEN {w} ELSE 0 END)"
            )
        return " + ".join(terms)

    sv = "\nUNION ALL\n".join(
        f"SELECT {id_col} AS neighbor_id, {t} AS table_idx, {bucket(vec_col, t)} AS bucket"
        f" FROM {vectors_table}"
        for t in range(n_tables)
    )
    sq = "\nUNION ALL\n".join(
        f"SELECT query_id, {t} AS table_idx, {bucket('qv', t)} AS bucket FROM q"
        for t in range(n_tables)
    )
    cos = (
        f"list_dot_product(CAST(qq.qv AS DOUBLE[]), CAST(vv.{vec_col} AS DOUBLE[]))"
        f" / (sqrt(list_dot_product(CAST(qq.qv AS DOUBLE[]), CAST(qq.qv AS DOUBLE[])))"
        f" * sqrt(list_dot_product(CAST(vv.{vec_col} AS DOUBLE[]), CAST(vv.{vec_col} AS DOUBLE[]))))"
    )
    return f"""
WITH q AS ({queries_sql}),
sv AS ({sv}),
sq AS ({sq}),
cand AS (
  SELECT DISTINCT sq.query_id, sv.neighbor_id
  FROM sv JOIN sq ON sv.table_idx = sq.table_idx AND sv.bucket = sq.bucket
),
scored AS (
  SELECT c.query_id, c.neighbor_id, round({cos}, 6) AS cos_sim
  FROM cand c
  JOIN q qq ON c.query_id = qq.query_id
  JOIN {vectors_table} vv ON c.neighbor_id = vv.{id_col}
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
WHERE rank <= {k}
"""


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: KMeans partitions the
    corpus into ``n_lists`` cells; each query probes its ``n_probe``
    nearest centroids and exact-re-ranks only those cells.

    The scale path when vectors cluster naturally: compute per query is
    ~(n_probe/n_lists)·n instead of n, and the cell assignment is a
    plain equi-join key so the probe is shuffle-friendly. Recall is
    tuned by n_probe (probe all lists ⇒ exact). Seeded KMeans keeps
    runs reproducible.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__mlvec"),
    )
    km = KMeans(k=n_lists, featuresCol="__mlvec", predictionCol="cell", seed=seed)
    model = km.fit(v)
    assigned = model.transform(v).select("neighbor_id", "nv", "cell")

    # centroid table is tiny → crossJoin queries × centroids, rank,
    # keep n_probe cells per query
    centers = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    cdf = queries.sparkSession.createDataFrame(centers, "cell int, cvec array<double>")
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
    )
    # rank centroids by EUCLIDEAN distance — the metric KMeans assigned
    # cells with; a dot-product ranking would prefer large-norm
    # centroids and probe the wrong cells for unnormalized vectors
    qc = q.crossJoin(F.broadcast(cdf)).select(
        "query_id",
        "qv",
        "cell",
        F.expr(
            "aggregate(zip_with(qv, cvec, (x, y) -> (cast(x as double) - y) * (cast(x as double) - y)),"
            " cast(0.0 as double), (acc, p) -> acc + p)"
        ).alias("cdist2"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("cdist2"), F.asc("cell"))
    probes = qc.withColumn("rn", F.row_number().over(wq)).where(F.col("rn") <= n_probe)

    scored = probes.join(assigned, "cell").select(
        "query_id",
        "neighbor_id",
        F.round(F.expr(cosine_expr("qv", "nv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def semdedup(
    vectors: DataFrame,
    k_cells: int = 16,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication by
    clustering embeddings and dropping near-identical items WITHIN each
    cluster. Returns ``(id, cell, is_kept, dup_of)`` — an item is
    dropped when some lower-id member of its cluster has cosine ≥
    ``threshold`` with it (greedy min-id representative, the same
    convention as ``dedup.dup_components``); ``dup_of`` is that lowest
    such id, NULL for kept items.

    Scale shape: the KMeans assignment is one Spark ML fit + a map-only
    transform; the quadratic compare is CONFINED to single cells by the
    self-join on ``cell`` — that bound is the whole point of SemDeDup
    (size ``k_cells`` ∝ corpus so cells stay ~constant; the LSH variant
    :func:`embedding_near_dups` is the alternative when clusters are
    unavailable). Seeded fit keeps runs reproducible; the pairwise rule
    is order-free so the output is deterministic GIVEN an assignment.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__mlvec"),
    )
    km = KMeans(k=k_cells, featuresCol="__mlvec", predictionCol="cell", seed=seed)
    assigned = km.fit(v).transform(v).select("id", "vec", "cell")
    a, b = assigned.alias("a"), assigned.alias("b")
    dup_pairs = (
        a.join(b, "cell")
        .where(F.col("b.id") < F.col("a.id"))
        .where(F.round(F.expr(cosine_expr("a.vec", "b.vec")), 6) >= threshold)
        .groupBy(F.col("a.id").alias("id"))
        .agg(F.min(F.col("b.id")).alias("dup_of"))
    )
    return (
        assigned.join(dup_pairs, "id", "left")
        .select(
            "id",
            F.col("cell").cast("long").alias("cell"),
            F.col("dup_of").isNull().alias("is_kept"),
            "dup_of",
        )
    )


def embedding_near_dups(
    vectors: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via multi-table LSH:
    ``(id_a, id_b, cos_sim)`` with cos_sim ≥ threshold. Pairs are only
    compared inside a shared bucket — the scale-safe near-dup join
    (high thresholds collide with near-certainty under sign-LSH)."""
    dim = len(vectors.select(vec_col).first()[0])
    v = _bucket_signatures(vectors, "id", "vec", id_col, vec_col, dim, n_planes, n_tables)
    a, b = v.alias("a"), v.alias("b")
    # dedup candidate pairs BEFORE scoring: a pair colliding in several
    # hash tables would otherwise be cosine-scored once per collision
    cands = (
        a.join(b, ["table_idx", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.vec").alias("va"),
            F.col("b.vec").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.select(
            "id_a",
            "id_b",
            F.round(F.expr(cosine_expr("va", "vb")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def _bucket_sql(vec_expr: str, table: int, dim: int, n_planes: int) -> str:
    """DuckDB expression for one table's sign-LSH bucket id — the same
    md5-derived ±1 plane literals :func:`_bucket_signatures` bakes into
    the Spark plan, so both engines compute identical buckets."""
    planes = random_hyperplanes(dim, n_planes, seed=table)
    terms = []
    for p, row in enumerate(planes):
        lit = "[" + ", ".join(f"{x:.1f}" for x in row) + "]"
        w = 1 << (n_planes - 1 - p)
        terms.append(
            f"(CASE WHEN list_dot_product(CAST({vec_expr} AS DOUBLE[]), {lit}) >= 0"
            f" THEN {w} ELSE 0 END)"
        )
    return " + ".join(terms)


def embedding_near_dups_sql(
    vectors_table: str,
    threshold: float,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle for :func:`embedding_near_dups`: the exact cosine
    SQL RESTRICTED to co-bucketed pairs — possible because the
    hyperplanes are md5-derived literals (same trick as
    :func:`lsh_bucket_topk_sql`), so "which pairs collide" is identical
    arithmetic in both engines, not a property of Spark's planner."""
    sv = "\nUNION ALL\n".join(
        f"SELECT {id_col} AS id, {t} AS table_idx,"
        f" {_bucket_sql(vec_col, t, dim, n_planes)} AS bucket"
        f" FROM {vectors_table}"
        for t in range(n_tables)
    )
    cos = (
        f"list_dot_product(CAST(va.{vec_col} AS DOUBLE[]), CAST(vb.{vec_col} AS DOUBLE[]))"
        f" / (sqrt(list_dot_product(CAST(va.{vec_col} AS DOUBLE[]), CAST(va.{vec_col} AS DOUBLE[])))"
        f" * sqrt(list_dot_product(CAST(vb.{vec_col} AS DOUBLE[]), CAST(vb.{vec_col} AS DOUBLE[]))))"
    )
    return f"""
WITH sv AS ({sv}),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM sv a JOIN sv b ON a.table_idx = b.table_idx AND a.bucket = b.bucket
  WHERE a.id < b.id
)
SELECT c.id_a, c.id_b, round({cos}, 6) AS cos_sim
FROM cand c
JOIN {vectors_table} va ON c.id_a = va.{id_col}
JOIN {vectors_table} vb ON c.id_b = vb.{id_col}
WHERE round({cos}, 6) >= {threshold}
"""


def rrf_fuse(
    legs: list[DataFrame], depth: int = 100, k: int = 60, n: int = 20
) -> DataFrame:
    """Reciprocal-rank fusion of retrieval legs (hybrid search: e.g. a
    BM25 keyword leg + an embedding-cosine leg). Each leg is an
    ``(id, score)`` frame; a doc's fused score is
    ``Σ_legs 1/(k + rank_leg)`` over the legs that ranked it in their
    top ``depth``.

    Scale shape: each leg reduces to its top-``depth`` rows FIRST via
    ``orderBy().limit()`` (TakeOrderedAndProject — parallel partial
    top-k, no global sort), and only the depth-row frames see a rank
    window (single-partition over ``depth`` rows — bounded by
    construction, same class as the profiler's #columns frames). Legs
    then union + one tiny groupBy. Scores should already be rounded by
    the caller so leg order is engine-stable; ranks break ties by id.
    """
    ranked = []
    for leg in legs:
        top = leg.select("id", "score").orderBy(F.desc("score"), F.asc("id")).limit(depth)
        # depth-row frame; the unpartitioned window scans only those rows
        w = Window.orderBy(F.desc("score"), F.asc("id"))
        ranked.append(
            top.withColumn("rank", F.row_number().over(w)).select(
                "id", (F.lit(1.0) / (F.lit(k) + F.col("rank"))).alias("contrib")
            )
        )
    u = ranked[0]
    for r in ranked[1:]:
        u = u.unionByName(r)
    return (
        u.groupBy("id")
        .agg(F.round(F.sum("contrib"), 6).alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc("id"))
        .limit(n)
    )
