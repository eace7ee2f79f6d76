"""Sequence packing for pretraining-batch assembly (scale extension).

GPT-style training concatenates documents in a fixed deterministic
order and slices the token stream into ``seq_len`` windows; each
document therefore occupies the half-open token interval
``[offset, offset + weight)`` of the global stream and lands in packs
``floor(offset/seq_len) .. floor((offset+weight-1)/seq_len)``. This
module computes that assignment distributively and EXACTLY:

* Order is the deterministic hash shuffle (md5 bucket, id) — the same
  engine-portable ordering ``ops.sampling.deterministic_shuffle`` uses,
  so reruns/backfills produce the identical packing.
* The global exclusive prefix-sum of weights is TWO-LEVEL (the same
  trick as deterministic_shuffle): per-bucket partial sums, an
  ``n_parts``-row cumulative window for bucket offsets broadcast back,
  then a within-bucket cumulative window. No task ever sorts or scans
  the whole table, so the operator survives 100 TB; all arithmetic is
  int64, so the DuckDB oracle (single global window) hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datalakerulegeneration_spark.ops.sampling import _BUCKETS, _hash_bucket, _hash_bucket_sql


def pack_sequences(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    seq_len: int,
    salt: str = "pack",
    n_parts: int = 64,
    carry_cols: tuple[str, ...] = (),
    text_col: str | None = None,
    tokenizer_fn=None,
) -> DataFrame:
    """Assign every row a token offset in the deterministic
    concatenation order and its first/last ``seq_len`` pack ids.

    ``weight_col`` must be a non-negative integer token count;
    zero-weight rows are pinned to the pack containing their offset.
    ``carry_cols`` flow through to the output unchanged — composed
    pipelines use this instead of a join-back (which would re-derive
    the whole upstream plan for the join's other side).

    ``tokenizer_fn`` + ``text_col`` (``ops.tokenize``): derive the
    weight from REAL tokenizer counts of ``text_col`` instead of
    ``weight_col`` — pack boundaries then budget in actual BPE tokens.
    The tokenizer runs in the same map stage as the hash bucketing
    (one Arrow hop, no extra scan or shuffle).
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    if tokenizer_fn is not None:
        if text_col is None:
            raise ValueError("tokenizer_fn requires text_col")
        from datalakerulegeneration_spark.ops.tokenize import token_count_col

        df = df.withColumn("_tok_w", token_count_col(text_col, tokenizer_fn))
        weight_col = "_tok_w"
    width = _BUCKETS // n_parts
    d = (
        df.select(
            F.col(id_col).alias("id"),
            # NULL weight → 0: a NULL would silently vanish from the
            # prefix sums AND make least/greatest skip it downstream
            # (pack_manifest span clipping) — coalesce pins the contract
            F.coalesce(F.col(weight_col).cast("bigint"), F.lit(0)).alias("weight"),
            *carry_cols,
        )
        .withColumn("_h", _hash_bucket("id", salt))
        .withColumn("_pid", F.floor(F.col("_h") / width).cast("int"))
    )
    # n_parts-row frame; its unpartitioned window scans only these rows
    wp = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off = (
        d.groupBy("_pid")
        .agg(F.sum("weight").alias("_w"))
        .withColumn("_boff", F.coalesce(F.sum("_w").over(wp), F.lit(0)))
        .select("_pid", "_boff")
    )
    wl = (
        Window.partitionBy("_pid")
        .orderBy(F.col("_h").asc(), F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.col("_boff") + F.coalesce(F.sum("weight").over(wl), F.lit(0))
    last_tok = offset + F.greatest(F.col("weight"), F.lit(1)) - 1
    return (
        d.join(F.broadcast(off), "_pid")
        .withColumn("offset", offset)
        .select(
            "id",
            *carry_cols,
            "weight",
            "offset",
            F.floor(F.col("offset") / seq_len).cast("bigint").alias("pack_first"),
            F.floor(last_tok / seq_len).cast("bigint").alias("pack_last"),
        )
    )


def pack_manifest(packed: DataFrame, seq_len: int) -> DataFrame:
    """Expand a :func:`pack_sequences` assignment to (pack, document)
    SPANS — the manifest a training dataloader actually consumes: for
    each pack, which documents contribute tokens, where in the pack
    they start, and how many tokens they contribute.

    ``(pack_id, id, begin_in_pack, n_tokens_in_pack)`` with
    ``begin_in_pack`` the 0-based position inside the pack and spans
    clipped to pack boundaries (a document crossing K boundaries emits
    K+1 rows). Map-only: one ``posexplode`` over the per-doc pack
    range — no shuffle until a consumer aggregates; all arithmetic is
    int64, so the DuckDB oracle hash-matches.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    pack = F.col("pack_id")
    # coalesce: a NULL weight from a hand-built frame would make
    # least() SKIP the operand and credit the doc with tokens to the
    # pack boundary (Spark least/greatest ignore NULLs)
    w = F.coalesce(F.col("weight"), F.lit(0))
    lo = F.greatest(F.col("offset"), pack * seq_len)
    hi = F.least(F.col("offset") + w, (pack + 1) * seq_len)
    return (
        packed.select(
            "id",
            "weight",
            "offset",
            F.explode(F.expr("sequence(pack_first, pack_last)")).alias("pack_id"),
        )
        .select(
            pack.cast("bigint").alias("pack_id"),
            "id",
            (lo - pack * seq_len).cast("bigint").alias("begin_in_pack"),
            F.greatest(hi - lo, F.lit(0)).cast("bigint").alias("n_tokens_in_pack"),
        )
    )


def pack_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """Per-pack fill statistics from a :func:`pack_sequences`
    assignment: ``(pack_id, n_docs, n_tokens, fill_ratio,
    n_boundary_docs)`` — n_boundary_docs counts documents in this pack
    that continue into (or arrive from) another pack. One aggregation
    over the map-only manifest; fill_ratio is an exact integer ratio
    rounded to 6 dp. The final pack is the only one allowed to be
    underfull in concat-order packing — everything else at 1.0 is the
    zero-padding-waste property, which this report makes auditable."""
    # expand inline (not via pack_manifest + join-back on id): the join
    # would re-derive the whole packed chain a second time — the
    # boundary flag rides the SAME explode instead
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    pack = F.col("pack_id")
    w = F.coalesce(F.col("weight"), F.lit(0))
    lo = F.greatest(F.col("offset"), pack * seq_len)
    hi = F.least(F.col("offset") + w, (pack + 1) * seq_len)
    m = packed.select(
        "weight",
        "offset",
        (F.col("pack_first") != F.col("pack_last")).alias("crosses"),
        F.explode(F.expr("sequence(pack_first, pack_last)")).alias("pack_id"),
    ).select(
        pack.cast("bigint").alias("pack_id"),
        F.greatest(hi - lo, F.lit(0)).alias("n_tokens_in_pack"),
        "crosses",
    )
    return (
        m.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens_in_pack").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum("n_tokens_in_pack").cast("double") / F.lit(float(seq_len)), 6
            ).alias("fill_ratio"),
            F.count(F.when(F.col("crosses"), F.lit(1))).cast("bigint").alias("n_boundary_docs"),
        )
    )


def pack_manifest_sql(pack_sql: str, seq_len: int) -> str:
    """DuckDB oracle for :func:`pack_manifest` over a pack-assignment
    subquery (e.g. :func:`pack_sequences_sql`)."""
    return f"""
WITH packed AS ({pack_sql}),
m AS (
  SELECT id, weight, "offset",
         unnest(generate_series(pack_first, pack_last)) AS pack_id
  FROM packed
)
SELECT CAST(pack_id AS BIGINT) AS pack_id, id,
       CAST(greatest("offset", pack_id * {seq_len}) - pack_id * {seq_len} AS BIGINT) AS begin_in_pack,
       CAST(greatest(least("offset" + weight, (pack_id + 1) * {seq_len})
                   - greatest("offset", pack_id * {seq_len}), 0) AS BIGINT) AS n_tokens_in_pack
FROM m
"""


def pack_stats_sql(pack_sql: str, seq_len: int) -> str:
    """DuckDB oracle for :func:`pack_stats` (manifest re-aggregated at
    pack grain)."""
    manifest = pack_manifest_sql(pack_sql, seq_len).strip()
    return f"""
WITH packed2 AS ({pack_sql}),
manifest AS ({manifest})
SELECT m.pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(m.n_tokens_in_pack) AS BIGINT) AS n_tokens,
       round(CAST(sum(m.n_tokens_in_pack) AS DOUBLE) / {float(seq_len)!r}, 6) AS fill_ratio,
       CAST(count(CASE WHEN p.pack_first <> p.pack_last THEN 1 END) AS BIGINT) AS n_boundary_docs
FROM manifest m JOIN packed2 p ON m.id = p.id
GROUP BY m.pack_id
"""


def pack_sequences_sql(
    table: str,
    id_col: str,
    weight_expr: str,
    seq_len: int,
    salt: str = "pack",
    carry_cols: tuple[str, ...] = (),
) -> str:
    """DuckDB oracle for :func:`pack_sequences` — one global window
    (the oracle may be sequential; only the Spark side must scale).
    ``carry_cols`` mirrors the Spark side's passthrough columns."""
    carry = "".join(f" {c}," for c in carry_cols)
    return f"""
WITH w AS (
  SELECT {id_col} AS id,{carry}
         COALESCE(CAST({weight_expr} AS BIGINT), 0) AS weight,
         {_hash_bucket_sql(id_col, salt)} AS h
  FROM {table}
),
o AS (
  SELECT id,{carry} weight,
         -- cast: DuckDB sums BIGINT into HUGEINT, which pandas floats
         CAST(COALESCE(sum(weight) OVER (ORDER BY h, id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
  FROM w
)
SELECT id,{carry} weight, "offset",
       CAST(floor("offset" / {seq_len}) AS BIGINT) AS pack_first,
       CAST(floor(("offset" + greatest(weight, 1) - 1) / {seq_len}) AS BIGINT) AS pack_last
FROM o
"""


def pack_source_mix(packed: DataFrame, seq_len: int, group_col: str = "grp") -> DataFrame:
    """Per-pack PROVENANCE: which sources contribute tokens to each
    training pack and in what shares — ``(pack_id, group, n_tokens,
    share)``. The per-batch attribution record a training run keeps so
    any loss anomaly can be traced back to a data source, and the
    pack-grain audit that the corpus-level mixture (target shares)
    actually survived packing.

    Same inline explode as :func:`pack_stats` (the group column rides
    the SAME map-only expansion — no join-back through the packed
    chain); shares come from a pack-partitioned window over the
    (pack, group)-grain aggregate. All counting is exact int64; share
    rounds 6 dp.

    ``packed`` must carry ``group_col`` (build it with
    ``pack_sequences(..., carry_cols=(group_col,))``).
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    pack = F.col("pack_id")
    w = F.coalesce(F.col("weight"), F.lit(0))
    lo = F.greatest(F.col("offset"), pack * seq_len)
    hi = F.least(F.col("offset") + w, (pack + 1) * seq_len)
    m = packed.select(
        F.col(group_col).alias("grp_"),
        "weight",
        "offset",
        F.explode(F.expr("sequence(pack_first, pack_last)")).alias("pack_id"),
    ).select(
        pack.cast("bigint").alias("pack_id"),
        "grp_",
        F.greatest(hi - lo, F.lit(0)).alias("t"),
    )
    per = m.groupBy("pack_id", "grp_").agg(F.sum("t").cast("bigint").alias("n_tokens"))
    tot = F.sum("n_tokens").over(Window.partitionBy("pack_id"))
    # nullif: a pack of only zero-weight docs has 0 total tokens — its
    # shares are NULL, not a division error (Spark 4 ANSI throws on /0)
    return per.select(
        "pack_id",
        F.col("grp_").alias(group_col),
        "n_tokens",
        F.round(
            F.col("n_tokens").cast("double") / F.nullif(tot.cast("double"), F.lit(0.0)), 6
        ).alias("share"),
    )


def pack_source_mix_sql(pack_sql: str, seq_len: int, group_col: str = "grp") -> str:
    """DuckDB oracle for :func:`pack_source_mix` over a pack-assignment
    subquery that carries ``group_col``."""
    manifest = pack_manifest_sql(pack_sql, seq_len).strip()
    return f"""
WITH packed3 AS ({pack_sql}),
manifest AS ({manifest}),
per AS (
  SELECT m.pack_id, p.{group_col},
         CAST(sum(m.n_tokens_in_pack) AS BIGINT) AS n_tokens
  FROM manifest m JOIN packed3 p ON m.id = p.id
  GROUP BY 1, 2
)
SELECT pack_id, {group_col}, n_tokens,
       round(CAST(n_tokens AS DOUBLE)
             / nullif(CAST(sum(n_tokens) OVER (PARTITION BY pack_id) AS DOUBLE), 0.0), 6) AS share
FROM per
"""


# power-of-two ceiling, bit-exact in both engines: length(bin(w-1)) is
# ceil(log2(w)) for w >= 2 as pure integer/string arithmetic (no float
# log2 near exact powers)
_CEIL2 = "CASE WHEN {w} <= 1 THEN 1 ELSE shiftleft(1, length(bin({w} - 1))) END"
_CEIL2_SQL = "CASE WHEN {w} <= 1 THEN CAST(1 AS BIGINT) ELSE CAST((1 << length(bin({w} - 1))) AS BIGINT) END"


def length_bucket_batches(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    max_tokens: int,
    salt: str = "batch",
    n_parts: int = 64,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """PADDED-batch assignment — the SFT/fine-tuning counterpart of
    concat packing: sequences are padded to a common length per batch,
    so batching mixed lengths wastes compute as padding. Standard fix:
    bucket documents by the power-of-two ceiling of their length, then
    fill fixed-cost batches within each bucket (every batch pads to
    the bucket ceiling; batch cost = ceiling × batch_size ≤
    ``max_tokens``).

    ``(id, weight, bucket, batch_idx)`` — bucket is the pad-to length;
    batch_idx numbers batches within the bucket in the deterministic
    hash order (two-level per-bucket rank, the target_mixture_exact
    machinery: a bucket holding most of the corpus never sorts in one
    task). Documents longer than ``max_tokens`` (ceiling > budget) get
    batch_idx NULL — unbatchable at this cost cap; chunk them first.
    All arithmetic int64 → exact DuckDB oracle.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    from datalakerulegeneration_spark.ops.sampling import _hash_bucket

    w = f"coalesce(cast({weight_col} as bigint), 0)"
    bucket = F.expr(_CEIL2.format(w=w)).cast("bigint")
    width = _BUCKETS // n_parts
    d = (
        df.select(
            F.col(id_col).alias("id"),
            *carry_cols,
            F.expr(w).alias("weight"),
            bucket.alias("bucket"),
        )
        .withColumn("_h", _hash_bucket("id", salt))
        .withColumn("_pid", F.floor(F.col("_h") / width).cast("int"))
    )
    # (#buckets × n_parts)-row frame; cumulative window partitioned by bucket
    wg = Window.partitionBy("_gk").orderBy("_opid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = (
        d.groupBy(F.col("bucket").alias("_gk"), F.col("_pid").alias("_opid"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_off", F.coalesce(F.sum("_n").over(wg), F.lit(0)))
        .select("_gk", "_opid", "_off")
    )
    wl = Window.partitionBy("bucket", "_pid").orderBy(F.col("_h").asc(), F.col("id").asc())
    batch_size = F.floor(F.lit(max_tokens) / F.col("bucket")).cast("bigint")
    rank = F.row_number().over(wl) + F.col("_off")
    return (
        d.join(
            F.broadcast(off),
            (F.col("bucket") == F.col("_gk")) & (F.col("_pid") == F.col("_opid")),
        )
        .select(
            "id",
            *carry_cols,
            "weight",
            "bucket",
            F.when(
                batch_size >= 1, F.floor((rank - 1) / batch_size).cast("bigint")
            ).alias("batch_idx"),
        )
    )


def length_bucket_batches_sql(
    table: str, id_col: str, weight_expr: str, max_tokens: int, salt: str = "batch"
) -> str:
    """DuckDB oracle for :func:`length_bucket_batches` (single
    bucket-partitioned rank window)."""
    from datalakerulegeneration_spark.ops.sampling import _hash_bucket_sql

    w = f"COALESCE(CAST({weight_expr} AS BIGINT), 0)"
    return f"""
WITH d AS (
  SELECT {id_col} AS id, {w} AS weight,
         {_CEIL2_SQL.format(w=w)} AS bucket,
         {_hash_bucket_sql(id_col, salt)} AS h
  FROM {table}
),
r AS (
  SELECT id, weight, bucket,
         row_number() OVER (PARTITION BY bucket ORDER BY h, id) AS rnk,
         CAST(floor({max_tokens} / bucket) AS BIGINT) AS bs
  FROM d
)
SELECT id, weight, bucket,
       CASE WHEN bs >= 1 THEN CAST(floor((rnk - 1) / bs) AS BIGINT) END AS batch_idx
FROM r
"""


def padding_waste_stats(batched: DataFrame) -> DataFrame:
    """Padding-efficiency audit over a :func:`length_bucket_batches`
    assignment: per bucket — batches, docs, real tokens, padded tokens
    (Σ bucket × batch population), waste ratio. Unbatchable docs
    (NULL batch_idx) report as bucket −1 with NULL ratio. Two hash
    aggregations over the slim assignment frame."""
    per_batch = (
        batched.withColumn(
            "_b", F.when(F.col("batch_idx").isNotNull(), F.col("bucket")).otherwise(F.lit(-1))
        )
        .groupBy("_b", "batch_idx")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("weight").alias("_t"),
        )
    )
    padded = F.when(F.col("batch_idx").isNotNull(), F.col("_b") * F.col("_n")).otherwise(
        F.lit(None).cast("bigint")
    )
    return (
        per_batch.withColumn("_p", padded)
        .groupBy(F.col("_b").alias("bucket"))
        .agg(
            F.count(F.when(F.col("batch_idx").isNotNull(), F.lit(1))).cast("bigint").alias("n_batches"),
            F.sum("_n").cast("bigint").alias("n_docs"),
            F.sum("_t").cast("bigint").alias("n_tokens"),
            F.sum("_p").cast("bigint").alias("padded_tokens"),
        )
        .withColumn(
            "waste_ratio",
            F.round(
                F.lit(1.0)
                - F.col("n_tokens").cast("double")
                / F.nullif(F.col("padded_tokens").cast("double"), F.lit(0.0)),
                6,
            ),
        )
    )


def padding_waste_stats_sql(batched_sql: str) -> str:
    """DuckDB oracle for :func:`padding_waste_stats` over a
    :func:`length_bucket_batches_sql` subquery."""
    return f"""
WITH b AS ({batched_sql}),
pb AS (
  SELECT CASE WHEN batch_idx IS NOT NULL THEN bucket ELSE -1 END AS bkt,
         batch_idx, count(*) AS n, sum(weight) AS t
  FROM b GROUP BY 1, 2
)
SELECT bkt AS bucket,
       CAST(count(CASE WHEN batch_idx IS NOT NULL THEN 1 END) AS BIGINT) AS n_batches,
       CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(sum(t) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN batch_idx IS NOT NULL THEN bkt * n END) AS BIGINT) AS padded_tokens,
       round(1.0 - CAST(sum(t) AS DOUBLE)
             / nullif(CAST(sum(CASE WHEN batch_idx IS NOT NULL THEN bkt * n END) AS DOUBLE), 0.0), 6) AS waste_ratio
FROM pb GROUP BY 1
"""
