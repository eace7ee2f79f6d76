"""Streaming operator micro-bench (r13 — VERDICT r12 item 8: the 16
streaming operators had zero perf evidence).

Drives the two heaviest streaming operators over the sf0.1 documents
corpus split into N file-source batches (maxFilesPerTrigger=1, the
same mechanism the streaming tests use) and records PER-BATCH
latencies from the streaming query's own progress events:

* ``curate_stream`` — score→filter→watermark-dedup→decon, a stateful
  map-heavy pipeline (dropDuplicatesWithinWatermark state store).
* ``neardup_dedup_stream`` — the persisted-signature near-dup deduper
  (foreachBatch: probe the band index, greedy admit, append index +
  survivors) — per batch it runs a full minhash band probe against
  the accumulated index.

Prints one JSON line and writes .bench/streaming_latest.json +
appends .bench/streaming_history.jsonl. This is a BASELINE artifact:
batch latency at sf0.1 split N ways, so the next optimization round
has numbers to move.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datalakerulegeneration_spark.session import get_spark
from datalakerulegeneration_spark.catalog import load_sf_tables

N_BATCHES = 8


def _progress_ms(query) -> list[dict]:
    out = []
    for p in query.recentProgress:
        out.append(
            {
                "batch_id": p["batchId"],
                "rows": p["numInputRows"],
                "trigger_ms": p["durationMs"].get("triggerExecution"),
                "addBatch_ms": p["durationMs"].get("addBatch"),
            }
        )
    return [r for r in out if r["rows"] > 0]


def bench_curate_stream(spark, src_dir: str, work: str) -> dict:
    from datalakerulegeneration_spark.ops import textqa
    from datalakerulegeneration_spark.streaming.curate_stream import curate_stream

    docs = spark.read.parquet(src_dir)
    eval_fps = (
        docs.where(F.col("doc_id") % 37 == 0)
        .select(textqa.fingerprint_col("text").alias("eval_fp"))
        .distinct()
    )
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, source string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = curate_stream(stream, eval_fps)
    t0 = time.time()
    q = (
        out.writeStream.format("noop")
        .option("checkpointLocation", os.path.join(work, "ckpt_curate"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    return {"wall_s": round(wall, 2), "batches": _progress_ms(q)}


def bench_neardup_stream(spark, src_dir: str, work: str) -> dict:
    from datalakerulegeneration_spark.streaming.neardup_index_stream import (
        neardup_dedup_stream,
    )

    stream = (
        spark.readStream.schema(
            "doc_id long, text string, source string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    state_dir = os.path.join(work, "neardup_state")
    t0 = time.time()
    q, _dd = neardup_dedup_stream(
        spark,
        stream,
        state_dir=state_dir,
        threshold=0.5,
        checkpoint_dir=os.path.join(work, "ckpt_neardup"),
    )
    q.awaitTermination()
    wall = time.time() - t0
    return {"wall_s": round(wall, 2), "batches": _progress_ms(q)}


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "bench-streaming", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.range(0, 1_000_000).selectExpr("sum(id)").collect()
    work = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        # split the corpus into N_BATCHES files, ascending doc_id ranges
        # (the deduper's greedy contract is ascending-id batches)
        docs = load_sf_tables(spark, sf_dir, ("documents",))["documents"]
        if "ts" not in docs.columns:
            docs = docs.withColumn(
                "ts", F.timestamp_seconds(F.lit(1_600_000_000) + F.col("doc_id"))
            )
        docs = docs.select("doc_id", "text", "source", "ts")
        n = docs.count()
        per = -(-n // N_BATCHES)
        src_dir = os.path.join(work, "src")
        os.makedirs(src_dir)
        for b in range(N_BATCHES):
            (
                docs.where(
                    (F.col("doc_id") >= b * per) & (F.col("doc_id") < (b + 1) * per)
                )
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(os.path.join(work, f"batch_{b}"))
            )
            for f in os.listdir(os.path.join(work, f"batch_{b}")):
                if f.endswith(".parquet"):
                    shutil.copy(
                        os.path.join(work, f"batch_{b}", f),
                        os.path.join(src_dir, f"{b:04d}.parquet"),
                    )
        result = {
            "sf_dir": sf_dir,
            "n_docs": n,
            "n_batches": N_BATCHES,
            "curate_stream": bench_curate_stream(spark, src_dir, work),
            "neardup_dedup_stream": bench_neardup_stream(spark, src_dir, work),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
    for name in ("curate_stream", "neardup_dedup_stream"):
        b = result[name]["batches"]
        ms = [x["trigger_ms"] for x in b if x["trigger_ms"]]
        result[name]["batch_ms_median"] = sorted(ms)[len(ms) // 2] if ms else None
        result[name]["batch_ms_max"] = max(ms) if ms else None
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "streaming_latest.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    result["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open(os.path.join(out_dir, "streaming_history.jsonl"), "a") as fh:
        fh.write(json.dumps(result) + "\n")
    compact = {
        k: {
            "wall_s": result[k]["wall_s"],
            "batch_ms_median": result[k]["batch_ms_median"],
            "batch_ms_max": result[k]["batch_ms_max"],
        }
        for k in ("curate_stream", "neardup_dedup_stream")
    }
    compact["n_docs"] = n
    compact["n_batches"] = N_BATCHES
    print(json.dumps(compact))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
