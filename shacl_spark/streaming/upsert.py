"""Exactly-once streaming triple upsert via foreachBatch (SURVEY.md
§2.E "stateful dedup/CDC").

Without a Delta/Iceberg MERGE target in this container, the upsert is
emulated the standard way: each micro-batch is deduplicated, anti-
joined against the current target state on the triple identity, and
the union is atomically committed (write-to-temp + swap).  On a
cluster with Delta/Iceberg the body of ``_merge_batch`` becomes a
single MERGE INTO statement — the streaming scaffolding is unchanged.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from shacl_spark.functions.terms import TRIPLE_SCHEMA, triple_id


class TripleUpsertSink:
    def __init__(self, spark: SparkSession, target_dir: str):
        self.spark = spark
        self.target_dir = target_dir

    def current(self) -> DataFrame:
        if os.path.isdir(self.target_dir) and any(
            f.endswith(".parquet") for f in os.listdir(self.target_dir)
        ):
            return self.spark.read.parquet(self.target_dir)
        return self.spark.createDataFrame([], TRIPLE_SCHEMA)

    def _merge_batch(self, batch: DataFrame, epoch_id: int) -> None:
        batch = batch.withColumn("tid", triple_id()).dropDuplicates(["tid"])
        existing = self.current().withColumn("tid", triple_id())
        new_rows = batch.join(existing.select("tid"), "tid", "left_anti")
        merged = existing.unionByName(new_rows).drop("tid")
        tmp = self.target_dir + f".tmp-{epoch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(self.target_dir):
            shutil.rmtree(self.target_dir)
        os.rename(tmp, self.target_dir)

    def start(self, stream: DataFrame, trigger_available_now: bool = True):
        writer = stream.writeStream.foreachBatch(self._merge_batch).outputMode("append")
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
