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
        through the file-commit protocol.  The delta is clustered by
        ``part`` first so each touched partition directory receives ONE
        file per batch instead of one per (task × part) — a k-task
        delta otherwise commits k×|touched| tiny files, and the commit
        protocol's per-file rename dominates small-batch appends
        (guide §6 "small files hurt twice")."""
        (
            applied.drop("tid")
            .repartition(F.col("part"))
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


class TombstoneTripleSink:
    """CDC upsert WITH DELETES (r04): merge-on-read tombstones.

    The append-only :class:`TripleUpsertSink` models adds-only feeds;
    real CDC streams retract.  Here each batch row carries an ``op``
    column (``'+'`` upsert / ``'-'`` delete) and the target stays
    APPEND-ONLY anyway: every accepted change is written as
    ``(triple, op, seq=epoch)`` into the same hash-partitioned layout,
    and :meth:`current` reconstructs the live set by keeping the
    highest-``seq`` op per triple identity and filtering to ``'+'`` —
    the merge-on-read shape (Hudi/Iceberg MOR); on a real table a
    background compaction folds tombstones, here :meth:`compact` does.

    Scale: merges stay O(batch + touched partitions) via partition
    pruning exactly like the adds-only sink; the read side pays one
    window over the touched data (compaction amortizes it away).

    Within one batch, ``'-'`` wins over ``'+'`` for the same triple
    (net effect of a same-batch add+retract is absence) — documented
    determinism, not an ordering guess."""

    def __init__(self, spark: SparkSession, target_dir: str, n_parts: int = 16):
        self.spark = spark
        self.target_dir = target_dir
        self.n_parts = n_parts

    def _part(self):
        return F.pmod(F.xxhash64(F.col("tid")), F.lit(self.n_parts)).cast("int")

    def _read_target(self) -> DataFrame | None:
        if not os.path.isdir(self.target_dir):
            return None
        if not any(f.startswith("part=") for f in os.listdir(self.target_dir)):
            return None
        return self.spark.read.parquet(self.target_dir)

    @staticmethod
    def _latest(df: DataFrame) -> DataFrame:
        """Keep the highest-seq row per triple identity; op DESC on seq
        ties so ``'-'`` wins ('-' > '+' in ASCII — a crash-replayed
        append only ever duplicates (tid, seq) with the SAME op, so
        ties are equal-op duplicates or a same-batch +/- pair)."""
        from pyspark.sql import Window as W

        df = df.withColumn("tid", triple_id())
        w = W.partitionBy("tid").orderBy(F.desc("seq"), F.desc("op"))
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )

    def current(self) -> DataFrame:
        """The live triple set (6-column frame)."""
        existing = self._read_target()
        if existing is None:
            return self.spark.createDataFrame([], TRIPLE_SCHEMA)
        live = self._latest(existing).where(F.col("op") == "+")
        return live.drop("op", "seq", "part", "tid")

    def _compute_delta(self, batch: DataFrame, epoch_id: int):
        """(applied, added, removed): ``applied`` carries tid/part/op/seq
        rows to append; ``added``/``removed`` are 6-column frames of the
        NET state changes (the incremental validator's ``changed``).

        ``seq`` is derived from the TARGET (max existing seq over the
        touched partitions + 1), never from ``epoch_id``: a stream
        restarted without a checkpoint location renumbers epochs from 0,
        and an epoch-derived seq would let an old row outrank a newer
        tombstone in :meth:`_latest` (ADVICE r04, medium).  Per-tid
        ordering only needs the max over the tid's own partition (a tid
        hashes to exactly one partition), so the pruned scan below is
        sufficient AND O(touched), not O(target).  Crash-replay safety
        is unchanged: the journal persists the assigned seq, so a replay
        re-appends identical (tid, seq, op) rows (idempotent ties)."""
        batch = batch.withColumn("tid", triple_id())
        # net op per tid within the batch: '-' wins (max in ASCII)
        net = (
            batch.groupBy("tid")
            .agg(F.max("op").alias("op"))
        )
        rows = batch.drop("op").dropDuplicates(["tid"]).join(net, "tid")
        rows = rows.withColumn("part", self._part())
        existing = self._read_target()
        next_seq = 1
        if existing is None:
            live_tids = self.spark.createDataFrame([], "tid string")
        else:
            touched = [r["part"] for r in rows.select("part").distinct().collect()]
            pruned = existing.where(F.col("part").isin(touched)) if touched else existing.limit(0)
            pruned = pruned.localCheckpoint(eager=False)
            live_tids = (
                self._latest(pruned).where(F.col("op") == "+").select("tid")
            )
            max_seq = pruned.agg(F.max("seq")).collect()[0][0]
            next_seq = (max_seq or 0) + 1
        adds = rows.where(F.col("op") == "+").join(live_tids, "tid", "left_anti")
        removes = rows.where(F.col("op") == "-").join(live_tids, "tid", "left_semi")
        applied = (
            adds.unionByName(removes)
            .withColumn("seq", F.lit(next_seq).cast("long"))
            .localCheckpoint(eager=True)
        )
        six = [f.name for f in TRIPLE_SCHEMA.fields]
        return (
            applied,
            applied.where(F.col("op") == "+").select(six),
            applied.where(F.col("op") == "-").select(six),
        )

    def _append(self, applied: DataFrame) -> None:
        (
            applied.drop("tid")
            .write.mode("append")
            .partitionBy("part")
            .parquet(self.target_dir)
        )

    def _merge_batch(self, batch: DataFrame, epoch_id: int) -> DataFrame:
        """Merge one op-tagged micro-batch; returns the NET change rows
        (6-column; additions and removals — both seed revalidation)."""
        applied, added, removed = self._compute_delta(batch, epoch_id)
        self._append(applied)
        return added.unionByName(removed)

    def compact(self) -> None:
        """Fold tombstones: rewrite the target to only the live rows
        (the background-compaction step a MOR table runs; after it the
        read-side window is over singleton groups)."""
        existing = self._read_target()
        if existing is None:
            return
        live = self._latest(existing).where(F.col("op") == "+").localCheckpoint(
            eager=True
        )
        import shutil as _shutil

        _shutil.rmtree(self.target_dir, ignore_errors=True)
        live.drop("tid").write.mode("overwrite").partitionBy("part").parquet(
            self.target_dir
        )
