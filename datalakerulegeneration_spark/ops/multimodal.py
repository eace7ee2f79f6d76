"""Multimodal columns: images/audio/video as opaque binary + metadata.

The Spark-side plumbing is real and tested — schema contract, Arrow
batch shape, size-aware repartitioning, ``mapInPandas`` feature
extraction — while the actual codec work (image decode, resampling,
frame sampling) is STUBBED: the container has no image/audio libraries,
so ``decode_stub`` derives deterministic fake features (dimensions,
channel stats) from the bytes. Swap ``_decode_one`` for a real decoder
(PIL/libsndfile/pyav) in production; nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Contract for a multimodal asset table: payload + typed metadata.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "asset_id long, modality string, n_bytes long, sha256 string,"
    " width int, height int, mean_luma double, frames_sampled int"
)


def make_assets_from_documents(docs: DataFrame, n: int | None = None) -> DataFrame:
    """Build a synthetic asset table from the documents fixture: text
    bytes stand in for encoded payloads (the plumbing under test is
    schema/partitioning/batching, not codecs)."""
    d = docs if n is None else docs.limit(n)
    return d.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def extract_features(assets: DataFrame, frames_per_video: int = 4) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas`` (not a scalar UDF): each batch is one pandas
    DataFrame, so a real decoder can amortize setup per batch; output
    rows stay 1:1 with assets (frame sampling is metadata here).
    At scale, repartition by size bands first so one huge video
    doesn't skew a task (see :func:`repartition_by_payload_size`).

    The decoder is nested so cloudpickle ships it BY VALUE: a
    module-level helper would serialize as a reference to this package,
    which Python workers cannot import when the driver runs outside
    the repo (only nested functions + stdlib/site-packages references
    are safe inside worker-side closures).
    """

    def _decode_one(payload: bytes) -> dict:
        # STUB decoder. Replace with a real codec (PIL/soundfile/pyav):
        # deterministic fake "dimensions"/"luma" from the sha256 digest.
        if payload is None:
            raise NotImplementedError("real decode requires payload bytes")
        digest = hashlib.sha256(payload).digest()
        return {
            "sha256": hashlib.sha256(payload).hexdigest(),
            "width": 64 + digest[0] % 192,
            "height": 64 + digest[1] % 192,
            "mean_luma": round(digest[2] / 255.0, 6),
        }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "sha256": [f["sha256"] for f in feats],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "mean_luma": [f["mean_luma"] for f in feats],
                    "frames_sampled": [
                        frames_per_video if m == "video" else 1
                        for m in pdf["modality"]
                    ],
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def repartition_by_payload_size(assets: DataFrame, target_mb: int = 64) -> DataFrame:
    """Skew guard: spread assets so each task sees ~target_mb of
    payload. Large blobs dominate task time; hashing on a size band +
    id keeps partitions balanced without a global sort."""
    bytes_per_part = target_mb * 1024 * 1024
    sized = assets.withColumn("__sz", F.coalesce(F.length("payload"), F.lit(0)))
    n = max(
        assets.sparkSession.sparkContext.defaultParallelism,
        int((sized.agg(F.sum("__sz")).first()[0] or 0) / bytes_per_part) + 1,
    )
    return sized.repartition(n, F.col("asset_id")).drop("__sz")


FRAME_SCHEMA = "asset_id long, frame_idx int, ts_ms long, frame_payload binary"


def sample_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling: one asset row → ``n_frames`` frame rows (the 1:N
    ``mapInPandas`` shape a real video pipeline needs — output batches
    are NOT 1:1 with input rows).

    Frames are spaced evenly across the asset's ``duration_ms`` (or
    index-spaced when unknown). The frame decode itself is STUBBED:
    deterministic fake frame bytes derived from (payload digest,
    frame index) — swap ``_fake_frame`` for a pyav/ffmpeg seek+decode;
    the plan shape, schema, and partitioning carry over unchanged.
    """

    def _fake_frame(payload: bytes, idx: int) -> bytes:
        if payload is None:
            raise NotImplementedError("real frame decode requires payload bytes")
        return hashlib.sha256(payload + idx.to_bytes(4, "big")).digest()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for aid, payload, dur in zip(
                pdf["asset_id"], pdf["payload"], pdf["meta"].apply(lambda m: m["duration_ms"] if m is not None else None)
            ):
                step = (dur // n_frames) if dur else 1000
                for i in range(n_frames):
                    ids.append(aid)
                    idxs.append(i)
                    tss.append(i * step)
                    frames.append(_fake_frame(payload, i))
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "ts_ms": tss, "frame_payload": frames}
            )

    return assets.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_stub(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: plan-level contract only (payload passthrough +
    target dims recorded). A real implementation swaps the identity
    transform for a codec call inside the same mapInPandas shape."""
    return assets.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.col("meta.sample_rate").alias("sample_rate"),
        ),
    )
