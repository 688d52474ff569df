"""Structured Streaming operators vs their batch twins (SURVEY.md §2.E)."""

from __future__ import annotations

import os

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
