"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.E stateful rows; the API class not expressible with
built-in windowed aggregations).

Per-user running statistics: the state (event count, value total,
last-seen timestamp) lives in the state store across micro-batches;
each batch emits the UPDATED stats per user touched in that batch.
Counts are monotone, so the final answer per user is the row with the
maximum count — giving the operator an exact batch-equivalent oracle
(GROUP BY user) despite being genuinely incremental.

Scale: state is partitioned by the grouping key across executors
(spark.sql.streaming.statefulOperator partitioning); the pandas
function sees one key's batch slice at a time via Arrow.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("total", T.DoubleType(), False),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def user_running_stats(events: DataFrame) -> DataFrame:
    """Streaming frame → per-batch updated (user_id, n_events,
    total_value) rows; state persists across micro-batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_running_stats_tws(events: DataFrame) -> DataFrame:
    """Same operator through Spark 4.x's ``transformWithStateInPandas``
    (the StatefulProcessor successor API: named state handles, timers,
    TTL).  Requires the RocksDB state-store provider
    (``spark.sql.streaming.stateStore.providerClass``) AND the
    ``protobuf`` python package (the state-server protocol) — absent in
    this sandbox, so the pytest is import-gated; the
    applyInPandasWithState twin above is the tested path."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState("stats", "n LONG, total DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            cur = self._stats.get() if self._stats.exists() else (0, 0.0)
            n, total = cur[0], cur[1]
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._stats.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningStats(),
        outputStructType=OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
