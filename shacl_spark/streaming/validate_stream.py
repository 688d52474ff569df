"""Continuous SHACL validation of a triple CDC stream (r03): the
capstone composition — Structured Streaming + the partitioned
exactly-once upsert + incremental revalidation.

Each micro-batch:

1. upserts into the hash-partitioned triple target
   (:class:`~shacl_spark.streaming.upsert.TripleUpsertSink` — O(batch),
   idempotent on epoch replay) and gets back the GENUINELY-new rows,
2. incrementally revalidates only the focus nodes that delta can
   affect (shacl/incremental.py — work scales with |delta|, not
   |graph|),
3. persists the merged report under a new version directory
   (``report_dir/v=<n>``) — versioned, append-only, so reading the
   previous report and writing the next one never self-overwrites, and
   a crash mid-write leaves the previous version intact.

Adds-only stream (the upsert target is append-only); on a
Delta/Iceberg cluster the same loop runs against MERGE + snapshot
reads.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from shacl_spark.shacl.engine import REPORT_OUT_SCHEMA
from shacl_spark.shacl.incremental import incremental_revalidate
from shacl_spark.shacl.parser import parse_shapes_graph
from shacl_spark.shacl.shapes import ShapesGraph
from shacl_spark.streaming.upsert import TripleUpsertSink


class StreamingValidator:
    def __init__(
        self,
        spark: SparkSession,
        shapes_rows_or_graph,
        target_dir: str,
        report_dir: str,
        n_parts: int = 16,
    ):
        self.spark = spark
        self.shapes: ShapesGraph = (
            shapes_rows_or_graph
            if isinstance(shapes_rows_or_graph, ShapesGraph)
            else parse_shapes_graph(shapes_rows_or_graph)
        )
        self.sink = TripleUpsertSink(spark, target_dir, n_parts=n_parts)
        self.report_dir = report_dir

    # --- report versions --------------------------------------------------------

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.report_dir):
            return []
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(self.report_dir)
            if d.startswith("v=")
        )

    def current_report(self) -> DataFrame:
        vs = self._versions()
        if not vs:
            return self.spark.createDataFrame([], REPORT_OUT_SCHEMA)
        return self.spark.read.schema(REPORT_OUT_SCHEMA).parquet(
            os.path.join(self.report_dir, f"v={vs[-1]}")
        )

    # --- the per-batch loop -------------------------------------------------------

    def _on_batch(self, batch: DataFrame, epoch_id: int) -> None:
        delta = self.sink._merge_batch(batch, epoch_id)
        if delta.isEmpty():
            return  # epoch replay or fully-duplicate batch: report stands
        prev = self.current_report()
        report = incremental_revalidate(
            self.spark,
            # the upsert target is append-only and per-batch deduped on
            # triple identity — skip the defensive re-dedup scan
            self.sink.current(dedup=False),
            delta,
            self.shapes,
            prev,
            assume_distinct=True,
        )
        nxt = (self._versions() or [0])[-1] + 1
        report.write.mode("overwrite").parquet(
            os.path.join(self.report_dir, f"v={nxt}")
        )

    def start(self, stream: DataFrame, trigger_available_now: bool = True):
        """Attach to a streaming triple frame (canonical 6-column
        schema).  Returns the StreamingQuery."""
        writer = stream.writeStream.foreachBatch(self._on_batch).outputMode("append")
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
