"""Streaming domain guard: blocklist + per-registered-domain caps over
an arriving document stream — the arrival-order twin of the batch
``ops.domains.blocklist_filter`` + ``ops.domains.domain_cap`` pair
(batch caps keep the N smallest-hash members of each domain; a stream
can't see members that haven't arrived, so admission is greedy by
arrival, deterministic within each micro-batch).

Per micro-batch: registered domains extract map-side (the same
public-suffix expression fold as the batch ops), blocklisted domains
drop statelessly, and each domain admits documents in deterministic
``md5(salt:id)`` order until its whole-stream admitted count reaches
``max_per_domain``. NULL-domain documents (no URL, IP hosts, bare
public suffixes) are a capped group like any other — exempt them
upstream if unattributed docs must all survive.

State is the (domain, n_admitted) count table — O(distinct domains)
rows, independent of stream history length — committed per batch
through the same versioned-dir + atomic-marker flip as the sketch
monitors and the budget admitter, so a replayed committed batch is a
full no-op. Crash between the survivors append and the marker flip
re-admits at most that one batch on replay (duplicate rows,
recoverable by exact dedup on id) — the fail-safe order the persisted
dedup index uses: re-admit, never drop.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datalakerulegeneration_spark.ops.domains import (
    blocklist_filter,
    with_registered_domain,
)
from datalakerulegeneration_spark.ops.sampling import _hash_bucket

_STATE_SCHEMA = "domain string, n_admitted bigint"


class DomainGuard:
    """foreachBatch sink admitting at most ``max_per_domain`` documents
    per registered domain across the whole stream history, after
    dropping blocklisted domains."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        max_per_domain: int,
        blocked_domains=(),
        id_col: str = "doc_id",
        url_col: str = "url",
        suffixes=None,
        salt: str = "domain_cap",
    ):
        if max_per_domain < 1:
            raise ValueError(f"max_per_domain must be >= 1, got {max_per_domain}")
        self.spark = spark
        self.state_dir = state_dir
        self.max_per_domain = int(max_per_domain)
        self.blocked = sorted(set(blocked_domains))
        self.id_col = id_col
        self.url_col = url_col
        self.suffixes = suffixes
        self.salt = salt
        self.out_path = os.path.join(state_dir, "survivors")
        self._prefix = os.path.join(state_dir, "domain_state")
        self._marker = os.path.join(state_dir, "domain_APPLIED")

    # -- exactly-once state plumbing (sketch-monitor pattern) -------------

    def applied_batch_id(self) -> int | None:
        if os.path.exists(self._marker):
            with open(self._marker) as f:
                return int(f.read().strip())
        return None

    def admitted_counts(self) -> DataFrame:
        """Whole-stream (domain, n_admitted) — empty before batch 0."""
        b = self.applied_batch_id()
        if b is None:
            return self.spark.createDataFrame([], _STATE_SCHEMA)
        return self.spark.read.parquet(f"{self._prefix}_{b}")

    # -- foreachBatch hook -------------------------------------------------

    def update(self, batch: DataFrame, batch_id: int) -> None:
        last = self.applied_batch_id()
        if last is not None and batch_id <= last:
            return  # replayed committed batch: exactly-once no-op
        prior = (
            self.spark.read.parquet(f"{self._prefix}_{last}")
            if last is not None
            else self.spark.createDataFrame([], _STATE_SCHEMA)
        )
        d = batch
        if self.blocked:
            d = blocklist_filter(d, self.url_col, self.blocked, self.suffixes)
        d = with_registered_domain(d, self.url_col, "_dom", self.suffixes)
        w = Window.partitionBy("_dom").orderBy(
            _hash_bucket(self.id_col, self.salt).asc(), F.col(self.id_col).asc()
        )
        ranked = d.withColumn("_rn", F.row_number().over(w)).join(
            F.broadcast(
                prior.select(F.col("domain").alias("_pdom"), "n_admitted")
            ),
            F.col("_dom").eqNullSafe(F.col("_pdom")),
            "left",
        )
        adm = ranked.where(
            F.coalesce(F.col("n_admitted"), F.lit(0)) + F.col("_rn")
            <= F.lit(self.max_per_domain)
        )
        # stage once; the survivor append and the per-domain totals
        # derive from the SAME persisted rows (the dedup-index trick)
        staging = os.path.join(self.state_dir, f".staging_{batch_id}")
        adm.select(*batch.columns, "_dom").write.mode("overwrite").parquet(staging)
        staged = self.spark.read.parquet(staging)
        batch_counts = staged.groupBy(F.col("_dom").alias("domain")).agg(
            F.count(F.lit(1)).cast("bigint").alias("_n_new")
        )
        staged.drop("_dom").write.mode("append").parquet(self.out_path)
        new_state = (
            prior.join(batch_counts, prior["domain"].eqNullSafe(batch_counts["domain"]), "full")
            .select(
                F.coalesce(prior["domain"], batch_counts["domain"]).alias("domain"),
                (
                    F.coalesce(prior["n_admitted"], F.lit(0))
                    + F.coalesce(F.col("_n_new"), F.lit(0))
                )
                .cast("bigint")
                .alias("n_admitted"),
            )
        )
        new_state.write.mode("overwrite").parquet(f"{self._prefix}_{batch_id}")
        shutil.rmtree(staging, ignore_errors=True)
        os.makedirs(self.state_dir, exist_ok=True)
        tmp = self._marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, self._marker)  # atomic commit point
        if last is not None:
            shutil.rmtree(f"{self._prefix}_{last}", ignore_errors=True)

    def survivors(self) -> DataFrame:
        return self.spark.read.parquet(self.out_path)


def domain_guard_stream(
    spark: SparkSession,
    stream: DataFrame,
    state_dir: str,
    max_per_domain: int,
    blocked_domains=(),
    id_col: str = "doc_id",
    url_col: str = "url",
    suffixes=None,
    checkpoint_dir: str | None = None,
):
    """Wire a streaming document DataFrame into the domain guard;
    returns ``(StreamingQuery, DomainGuard)``."""
    g = DomainGuard(
        spark, state_dir, max_per_domain, blocked_domains, id_col, url_col, suffixes
    )
    writer = (
        stream.writeStream.foreachBatch(g.update)
        .outputMode("update")
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start(), g
