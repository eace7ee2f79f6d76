"""Bloom filter: constant-size mergeable membership state.

The decontamination scrub a 100 TB pipeline actually ships is rarely
the exact broadcast anti-join on the raw eval-gram set — it is a Bloom
filter over the held-out set (Brown et al., GPT-3 appendix C use a
Bloom-backed n-gram scrub): ``m`` bits of state REGARDLESS of how many
benchmark fingerprints went in, false-positive-only error (a Bloom hit
may be spurious, a miss is definitive), and two filters over the same
(m, k) MERGE by cell-wise OR — the same mergeable-state contract as
the Count-Min sketch and the HLL profiler state, so per-load partial
filters fold into a running one in any order.

Determinism contract (mirrors ``ops.sketch``): the k hash functions
are md5-derived (hash i probes ``md5(i || ':' || value)``), so the
filter CONTENT — the packed bit words — is bit-identical in Spark and
DuckDB. That makes membership answers (including which specific
values false-positive) exactly oracle-checkable, not just
statistically plausible.

Shapes: building is one scan over the (small) reference side — each
value emits k (word, bit) cells map-side and a word-grain hash agg
ORs them; the shuffle is O(words × tasks) no matter the input. Bits
pack 32 per word (not 64: ``1 << 63`` flips sign and ``<<`` overflow
semantics differ across engines; 32-bit payloads stay positive in a
BIGINT everywhere). Probing joins each corpus value's k cells against
the ≤ m/32-row filter — broadcast by construction — and the corpus
side is never shuffled: membership is a map-side lookup, which is the
entire point of spending m bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sketch import _bucket_expr, _bucket_sql


def bloom_build(df: DataFrame, col: str, m: int = 4096, k: int = 5) -> DataFrame:
    """Build the filter over ``df[col]``: ``(word, bits)`` — bit
    position ``p`` (hash ``i`` of a value → ``p = h_i(v) % m``) lives
    at ``word = p div 32``, ``bit = p % 32``. Untouched words stay
    absent (zero). Merge two filters with unionByName + word-grain
    ``bit_or`` (see :func:`bloom_merge`)."""
    cells = F.array(
        *[F.expr(_bucket_expr(col, i, m)) for i in range(k)]
    )
    return (
        df.where(F.col(col).isNotNull())
        .select(F.explode(cells).alias("p"))
        .select(
            F.expr("p div 32").alias("word"),
            F.expr("shiftleft(cast(1 as bigint), cast(p % 32 as int))").alias("v"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(v)").alias("bits"))
    )


def bloom_build_sql(table: str, col: str, m: int = 4096, k: int = 5) -> str:
    """DuckDB oracle for :func:`bloom_build` (same md5 probes, same
    32-bit packing)."""
    rows = "\nUNION ALL\n".join(
        f"SELECT {_bucket_sql(col, i, m)} AS p FROM {table} WHERE {col} IS NOT NULL"
        for i in range(k)
    )
    return f"""
WITH cells AS ({rows})
SELECT p // 32 AS word, bit_or(1::BIGINT << (p % 32)::INT) AS bits
FROM cells GROUP BY p // 32
"""


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Merge filters built with the same (m, k): word-wise OR.
    Order-invariant — the per-load/streaming fold contract."""
    u = filters[0]
    for f in filters[1:]:
        u = u.unionByName(f)
    return u.groupBy("word").agg(F.expr("bit_or(bits)").alias("bits"))


def bloom_contains(
    bloom: DataFrame, probes: DataFrame, col: str, m: int = 4096, k: int = 5
) -> DataFrame:
    """Membership for each distinct ``probes[col]`` value:
    ``(value, member)`` — member iff ALL k probed bits are set.
    ``member`` may false-positive, never false-negative. The filter
    side is ≤ m/32 rows → broadcast; the probe side never shuffles
    beyond its own distinct."""
    cells = (
        probes.where(F.col(col).isNotNull())
        .select(F.col(col).alias("value"))
        .distinct()
        .select(
            "value",
            F.explode(
                F.array(*[F.expr(_bucket_expr("value", i, m)) for i in range(k)])
            ).alias("p"),
        )
        .select(
            "value",
            F.expr("p div 32").alias("word"),
            F.expr("cast(p % 32 as int)").alias("bit"),
        )
    )
    hit = F.expr("shiftright(coalesce(bits, cast(0 as bigint)), bit) % 2 = 1")
    return (
        cells.join(F.broadcast(bloom), "word", "left")
        .groupBy("value")
        .agg((F.count(F.lit(1)) == F.count(F.when(hit, 1))).alias("member"))
    )


def bloom_decontaminate(
    corpus: DataFrame,
    reference: DataFrame,
    id_col: str,
    key_col: str,
    m: int = 4096,
    k: int = 5,
) -> DataFrame:
    """Per-corpus-row Bloom verdict against ``reference[key_col]``:
    ``(id, bloom_hit, exact_hit)``. ``bloom_hit`` is what the
    m-bit-state scrub would drop; ``exact_hit`` is ground truth
    (key_col equi-semi-join), so ``bloom_hit AND NOT exact_hit`` rows
    ARE the false positives — pairing them is what proves the filter
    contract (no false negatives, bounded FP rate) on real data, the
    same audit shape as ``sketch.cm_heavy_hitters``. NULL keys carry
    ``(false, false)``: a null fingerprint matches nothing in either
    engine."""
    bloom = bloom_build(reference, key_col, m, k)
    verdict = bloom_contains(bloom, corpus, key_col, m, k)
    exact = reference.where(F.col(key_col).isNotNull()).select(
        F.col(key_col).alias("value")
    ).distinct().withColumn("exact_hit", F.lit(True))
    return (
        corpus.select(F.col(id_col).alias("id"), F.col(key_col).alias("value"))
        .join(verdict, "value", "left")
        .join(F.broadcast(exact), "value", "left")
        .select(
            "id",
            F.coalesce(F.col("member"), F.lit(False)).alias("bloom_hit"),
            F.coalesce(F.col("exact_hit"), F.lit(False)).alias("exact_hit"),
        )
    )


def bloom_ngram_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    m: int = 65536,
    k: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Gram-grain Bloom contamination audit — the actual GPT-3
    appendix-C construction: the Bloom filter is built over the eval
    set's distinct word ``n``-grams (the grain where the reference
    side genuinely gets large — millions of grams across benchmark
    suites — and m bits of state beats materializing the gram set),
    and every corpus document reports what fraction of its distinct
    grams the filter flags: ``(id, n_grams, n_flagged, flag_frac,
    flagged)``. Flags can only over-count (Bloom never
    false-negatives), so ``flagged`` is a conservative superset of
    `textqa.ngram_overlap`'s exact verdict at the same threshold.

    Shape: the corpus is ONE distinct-(doc, gram) explode and then a
    strictly map-side probe — the k hash lookups are k broadcast hash
    joins against the ≤ m/32-row word table (no gram-grain shuffle,
    no per-gram aggregation); the only exchange is the final id-grain
    count. Documents with fewer than ``n`` tokens have no grams and
    drop out, mirroring the exact audit and its oracle.
    """
    from datalakerulegeneration_spark.ops.dedup import shingles

    filt = bloom_build(
        shingles(eval_df, id_col, text_col, n).select("shingle").distinct(),
        "shingle",
        m,
        k,
    )
    g = shingles(corpus, id_col, text_col, n)
    tests = []
    for i in range(k):
        g = g.withColumn(f"_p{i}", F.expr(_bucket_expr("shingle", i, m)))
        side = filt.select(
            F.col("word").alias(f"_w{i}"), F.col("bits").alias(f"_b{i}")
        )
        g = g.join(
            F.broadcast(side), F.expr(f"_p{i} div 32") == F.col(f"_w{i}"), "left"
        )
        tests.append(
            F.expr(
                f"shiftright(coalesce(_b{i}, cast(0 as bigint)),"
                f" cast(_p{i} % 32 as int)) % 2 = 1"
            )
        )
    member = tests[0]
    for t in tests[1:]:
        member = member & t
    agg = g.groupBy(F.col("id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        F.count(F.when(member, 1)).cast("bigint").alias("n_flagged"),
    )
    frac = F.round(
        F.col("n_flagged").cast("double") / F.col("n_grams").cast("double"), 6
    )
    return agg.select(
        "id", "n_grams", "n_flagged", frac.alias("flag_frac"),
        (frac >= threshold).alias("flagged"),
    )


def bloom_ngram_decontaminate_sql(
    table: str,
    eval_pred: str,
    id_col: str,
    text_col: str,
    n: int = 3,
    m: int = 65536,
    k: int = 3,
    threshold: float = 0.2,
) -> str:
    """DuckDB oracle for :func:`bloom_ngram_decontaminate`;
    ``eval_pred`` is a SQL predicate over ``{table}`` selecting the
    eval-set rows (same convention as `textqa.ngram_overlap_sql`)."""
    from datalakerulegeneration_spark.ops.dedup import shingles_sql

    sh = shingles_sql(table, id_col, text_col, n).strip()
    bloom = bloom_build_sql(
        f"(SELECT DISTINCT shingle FROM sh WHERE id IN"
        f" (SELECT {id_col} FROM {table} WHERE {eval_pred}))",
        "shingle",
        m,
        k,
    ).strip()
    cells = "\nUNION ALL\n".join(
        f"SELECT id, shingle, {_bucket_sql('shingle', i, m)} AS p FROM sh"
        for i in range(k)
    )
    return f"""
WITH sh AS ({sh}),
bloom AS ({bloom}),
cells AS (
  SELECT id, shingle, p // 32 AS word, (p % 32)::INT AS bit FROM ({cells})
),
hits AS (
  SELECT c.id, c.shingle,
         count(*) = count(CASE WHEN (COALESCE(b.bits, 0) >> c.bit) % 2 = 1 THEN 1 END) AS member
  FROM cells c LEFT JOIN bloom b ON c.word = b.word
  GROUP BY c.id, c.shingle
),
agg AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(count(CASE WHEN member THEN 1 END) AS BIGINT) AS n_flagged
  FROM hits GROUP BY id
)
SELECT id, n_grams, n_flagged,
       round(CAST(n_flagged AS DOUBLE) / CAST(n_grams AS DOUBLE), 6) AS flag_frac,
       round(CAST(n_flagged AS DOUBLE) / CAST(n_grams AS DOUBLE), 6) >= {threshold!r} AS flagged
FROM agg
"""


def bloom_decontaminate_sql(
    corpus_sql: str,
    reference_sql: str,
    id_col: str,
    key_col: str,
    m: int = 4096,
    k: int = 5,
) -> str:
    """DuckDB oracle for :func:`bloom_decontaminate`. ``corpus_sql``
    and ``reference_sql`` are subqueries exposing (id_col, key_col)."""
    bloom = bloom_build_sql(f"({reference_sql})", key_col, m, k).strip()
    probe_rows = "\nUNION ALL\n".join(
        f"SELECT value, {_bucket_sql('value', i, m)} AS p"
        f" FROM (SELECT DISTINCT {key_col} AS value FROM ({corpus_sql})"
        f"       WHERE {key_col} IS NOT NULL)"
        for i in range(k)
    )
    return f"""
WITH bloom AS ({bloom}),
cells AS (
  SELECT value, p // 32 AS word, (p % 32)::INT AS bit FROM ({probe_rows})
),
verdict AS (
  SELECT c.value,
         count(*) = count(CASE WHEN (COALESCE(b.bits, 0) >> c.bit) % 2 = 1 THEN 1 END) AS member
  FROM cells c LEFT JOIN bloom b ON c.word = b.word
  GROUP BY c.value
),
exact AS (
  SELECT DISTINCT {key_col} AS value, TRUE AS exact_hit
  FROM ({reference_sql}) WHERE {key_col} IS NOT NULL
)
SELECT s.{id_col} AS id,
       COALESCE(v.member, FALSE) AS bloom_hit,
       COALESCE(e.exact_hit, FALSE) AS exact_hit
FROM ({corpus_sql}) s
LEFT JOIN verdict v ON s.{key_col} = v.value
LEFT JOIN exact e ON s.{key_col} = e.value
"""
