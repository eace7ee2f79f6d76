"""Stateless streaming embedding decontamination.

The batch audit (``ops.similarity.embedding_decontaminate``) scores a
finished corpus; a live ingestion pipeline wants every ARRIVING vector
scrubbed against the benchmark set before it lands. Because the eval
set is small by contract, the whole check is expressible WITHOUT
aggregation state: the eval vectors fold into ONE static row (an array
of (vector, norm) structs), that row broadcasts into the stream via a
stream-static join, and each incoming row computes its max cosine with
a higher-order fold — map-only, append-mode safe, no watermark, no
state store. A restart re-scrubs nothing and forgets nothing because
there is nothing to remember.

Batch twin: on a static frame the same function returns exactly the
batch audit's (max_eval_cos, contaminated) per id (tested equal) —
``greatest`` over the rounded per-eval cosines is order-insensitive,
so the fold and the batch per-id max agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalakerulegeneration_spark.ops.similarity import norm_expr


def embedding_decontaminate_stream(
    stream: DataFrame,
    eval_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    mode: str = "audit",
) -> DataFrame:
    """Scrub a vector stream against a static eval set.

    ``mode="audit"`` appends (max_eval_cos, contaminated) to every row;
    ``mode="drop"`` emits only clean rows with the original schema —
    the filter an ingestion sink actually wants.
    """
    if eval_vectors.isStreaming:
        raise ValueError("eval_vectors must be a static frame (it broadcasts)")
    if mode not in ("audit", "drop"):
        raise ValueError(f"mode must be 'audit' or 'drop', got {mode!r}")
    evs = eval_vectors.select(
        F.struct(
            F.col(vec_col).alias("v"), F.expr(norm_expr(vec_col)).alias("n")
        ).alias("e")
    ).agg(F.collect_list("e").alias("_evs"))
    scored = (
        stream.withColumn("_cn", F.expr(norm_expr(vec_col)))
        .crossJoin(F.broadcast(evs))
        .withColumn(
            "max_eval_cos",
            F.expr(
                "aggregate(_evs, cast(-1.0 as double), (acc, e) -> greatest(acc, "
                f"round(aggregate(zip_with({vec_col}, e.v,"
                " (x, y) -> cast(x as double) * cast(y as double)),"
                " cast(0.0 as double), (a2, v2) -> a2 + v2)"
                " / (_cn * e.n), 6)))"
            ),
        )
        .withColumn("contaminated", F.col("max_eval_cos") >= F.lit(threshold))
        .drop("_evs", "_cn")
    )
    if mode == "drop":
        return scored.where(~F.col("contaminated")).drop(
            "max_eval_cos", "contaminated"
        )
    return scored
