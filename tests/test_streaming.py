"""Structured Streaming operators vs their batch twins (SURVEY.md §2.E)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from shacl_spark.streaming.events import (
    replay_stream,
    run_to_completion,
    session_windows,
    stateful_dedup,
    windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"
EVENTS = os.path.join(SF_DIR, "events.parquet")


def _batch_events(spark):
    return spark.read.parquet(EVENTS)


def test_windowed_counts_match_batch(spark):
    stream = replay_stream(spark, EVENTS)
    out = run_to_completion(windowed_counts(stream), "tumbling_t", "complete")
    got = {
        (r["window_start"], r["event_type"]): r["n"] for r in out.collect()
    }
    batch = (
        _batch_events(spark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )
    want = {(r["ws"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want


def test_session_windows_run(spark):
    stream = replay_stream(spark, EVENTS)
    out = run_to_completion(session_windows(stream), "session_t", "complete")
    rows = out.collect()
    assert rows
    # session invariant: end = start + >=gap, events >= 1
    for r in rows[:50]:
        assert r["n_events"] >= 1
        assert r["session_end"] > r["session_start"]


def test_stateful_dedup_drops_dupes(spark):
    stream = replay_stream(spark, EVENTS)
    out = run_to_completion(stateful_dedup(stream), "dedup_t", "append")
    n_unique = out.select("event_id").distinct().count()
    assert out.count() == n_unique
    assert n_unique == _batch_events(spark).select("event_id").distinct().count()


def test_stateful_user_stats_across_batches(spark, tmp_path):
    """applyInPandasWithState: state persists across micro-batches —
    the second batch's emission continues the first batch's counts."""
    import os

    from shacl_spark.streaming.events import EVENTS_SCHEMA
    from shacl_spark.streaming.stateful import user_running_stats

    src = str(tmp_path / "ev")
    os.makedirs(src)

    def rows(ids, val):
        from datetime import datetime

        return [(i, datetime(2024, 1, 1, 0, 0, i % 60), 7, "c", val, None) for i in ids]

    spark.createDataFrame(rows(range(3), 1.0), EVENTS_SCHEMA).coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame(rows(range(3, 5), 2.0), EVENTS_SCHEMA).coalesce(1).write.parquet(src + "/b2")

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
    )
    q = (
        user_running_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("ustats_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM ustats_t WHERE user_id = 7").collect()
    }
    # one emission per batch: after b1 (3 events, 3.0), after b2 (5, 7.0)
    assert (5, 7.0) in got and len(got) == 2


def test_transform_with_state_matches_apply_in_pandas(spark, tmp_path):
    """Spark 4.x transformWithStateInPandas (StatefulProcessor + RocksDB
    state store) computes the same running stats as the
    applyInPandasWithState implementation.  The TWS state-server
    protocol needs the protobuf package — skipped where absent."""
    import os

    pytest.importorskip("google.protobuf")

    from shacl_spark.streaming.events import EVENTS_SCHEMA
    from shacl_spark.streaming.stateful import user_running_stats_tws

    src = str(tmp_path / "ev")
    os.makedirs(src)

    def rows(ids, val):
        from datetime import datetime

        return [(i, datetime(2024, 1, 1, 0, 0, i % 60), i % 3, "c", val, None) for i in ids]

    spark.createDataFrame(rows(range(9), 1.5), EVENTS_SCHEMA).coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame(rows(range(9, 12), 2.0), EVENTS_SCHEMA).coalesce(1).write.parquet(src + "/b2")

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/b*")
        )
        q = (
            user_running_stats_tws(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("ustats_tws")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    final = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql(
            "SELECT user_id, MAX(n_events) AS n_events, MAX_BY(total_value, n_events) AS total_value "
            "FROM ustats_tws GROUP BY user_id"
        ).collect()
    }
    # 12 events over users 0..2: user 0 gets ids 0,3,6,9 -> 3*1.5+2.0
    assert final[0] == (4, 6.5)
    assert final[1] == (4, 6.5) and final[2] == (4, 6.5)
