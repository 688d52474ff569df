"""Structured Streaming operators (SURVEY.md §2.E streaming rows).

The batch parquet `events` table replays as a file-source stream
(schema pinned, one file per micro-batch via maxFilesPerTrigger); all
operators are plain streaming transforms, so they run unchanged
against Kafka/rate sources on a real cluster.  Batch-equivalent SQL
exists for the windowed aggregations (the driver's oracle checks the
batch twins registered in __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def replay_stream(spark: SparkSession, events_path: str) -> DataFrame:
    """File-source replay of the events parquet as a stream.

    Accepts either a directory or a single parquet file (the streaming
    file source requires a directory, so a file path becomes its parent
    dir + a glob filter).
    """
    import os

    reader = spark.readStream.schema(EVENTS_SCHEMA).option("maxFilesPerTrigger", 1)
    if os.path.isfile(events_path):
        reader = reader.option("pathGlobFilter", os.path.basename(events_path))
        events_path = os.path.dirname(events_path)
    return reader.parquet(events_path)


def windowed_counts(
    stream: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` given) per-type counts with
    a watermark bounding state for late data."""
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_windows(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Per-user session windows (native session_window, Spark 3.2+)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def stateful_dedup(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once-style dedup on event_id bounded by the watermark —
    the streaming twin of the pipeline's dropDuplicates (A12)."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_completion(stream_df: DataFrame, name: str, output_mode: str = "append") -> DataFrame:
    """Drive a streaming frame over the finite file replay to
    completion via the memory sink; returns the materialized result
    as a batch DataFrame (test/bench harness).

    For aggregations use output_mode='complete': in append mode the
    final windows wait for the watermark to pass, which never happens
    on a finite replay.
    """
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")
