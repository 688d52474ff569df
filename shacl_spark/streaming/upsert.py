"""Exactly-once streaming triple upsert via foreachBatch (SURVEY.md
§2.E "stateful dedup/CDC").

Without a Delta/Iceberg MERGE target in this container, the upsert is
emulated scale-correctly: the target is hash-partitioned on the triple
identity (``part=pmod(xxhash64(tid), n_parts)``) and each micro-batch

1. dedups itself on ``tid``,
2. anti-joins against ONLY the touched partitions of the target
   (partition pruning: the scan reads just those directories, just the
   identity columns), and
3. APPENDS the genuinely-new rows through Spark's file-commit protocol.

This is O(|batch| + |touched partitions|) per batch — not O(|target|)
— and there is no delete/rename swap window at all: a crash mid-write
leaves only uncommitted ``_temporary`` files, which parquet reads
ignore, and a foreachBatch epoch replay re-runs the anti-join and
appends nothing (idempotent).  The one non-atomic edge is a crash
DURING job commit (some task files renamed, some not); a replay then
re-appends rows whose files already committed, so :meth:`current`
dedups on the content identity by default — belt to the commit
protocol's braces.  On a cluster with Delta/Iceberg the body of
``_merge_batch`` becomes a single MERGE INTO; the streaming
scaffolding is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from shacl_spark.functions.terms import TRIPLE_SCHEMA, triple_id

_PARTED_SCHEMA = T.StructType(
    list(TRIPLE_SCHEMA.fields) + [T.StructField("part", T.IntegerType(), True)]
)


class TripleUpsertSink:
    def __init__(self, spark: SparkSession, target_dir: str, n_parts: int = 16):
        """``n_parts`` fixes the target's hash-partition count — pick
        ~(total size / healthy file size) at deployment scale; it must
        stay constant for the lifetime of a target directory."""
        self.spark = spark
        self.target_dir = target_dir
        self.n_parts = n_parts

    def _part(self):
        return F.pmod(F.xxhash64(F.col("tid")), F.lit(self.n_parts)).cast("int")

    def _read_target(self) -> DataFrame | None:
        if not os.path.isdir(self.target_dir):
            return None
        has_data = any(
            f.startswith("part=") for f in os.listdir(self.target_dir)
        )
        if not has_data:
            return None
        return self.spark.read.schema(_PARTED_SCHEMA).parquet(self.target_dir)

    def current(self, dedup: bool = True) -> DataFrame:
        """The merged triple state.  ``dedup=True`` (default) collapses
        the rare duplicate left by a crash during job commit + epoch
        replay; pass False on the fast path when no crash recovery is
        in play."""
        existing = self._read_target()
        if existing is None:
            return self.spark.createDataFrame([], TRIPLE_SCHEMA)
        out = existing.drop("part")
        if dedup:
            out = out.withColumn("tid", triple_id()).dropDuplicates(["tid"]).drop("tid")
        return out

    def _compute_delta(self, batch: DataFrame) -> DataFrame:
        """The rows of ``batch`` genuinely absent from the target
        (materialized; carries ``tid``/``part``) — the anti-join half
        of the merge, split out so a consumer can durably record the
        delta BEFORE the append (streaming/validate_stream.py's
        crash-atomicity protocol)."""
        batch = (
            batch.withColumn("tid", triple_id())
            .dropDuplicates(["tid"])
            .withColumn("part", self._part())
        )
        existing = self._read_target()
        if existing is not None:
            # touched partitions only: the IN-list predicate prunes the
            # partitioned scan to those directories, and only the
            # identity columns are read
            touched = [r["part"] for r in batch.select("part").distinct().collect()]
            if touched:
                seen = (
                    existing.where(F.col("part").isin(touched))
                    .withColumn("tid", triple_id())
                    .select("tid")
                )
                batch = batch.join(seen, "tid", "left_anti")
        return batch.localCheckpoint(eager=True)

    def _append(self, applied: DataFrame) -> None:
        """Append a precomputed delta (from :meth:`_compute_delta`)
        through the file-commit protocol."""
        (
            applied.drop("tid")
            .write.mode("append")
            .partitionBy("part")
            .parquet(self.target_dir)
        )

    def _merge_batch(self, batch: DataFrame, epoch_id: int) -> DataFrame:
        """Merge one micro-batch; returns the genuinely-NEW rows (the
        applied delta, materialized) — streaming consumers like the
        incremental validator key their work off it."""
        applied = self._compute_delta(batch)
        self._append(applied)
        return applied.drop("tid", "part")

    def start(self, stream: DataFrame, trigger_available_now: bool = True):
        writer = stream.writeStream.foreachBatch(self._merge_batch).outputMode("append")
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
