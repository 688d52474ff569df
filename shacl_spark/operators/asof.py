"""As-of join (Spark has no native one — SURVEY.md §2.E).

Union-based implementation: tag both sides, sort within key by
(ts, side), and carry the latest left-side payload forward with a
``last(ignorenulls)`` window.  ONE shuffle on the key, no range
explosion, no per-group Python — this is the 100 TB-safe shape (the
pd.merge_asof-per-group alternative ships every row through Arrow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the payload of the latest right row
    with ``right.ts <= left.ts`` (direction='backward'; 'forward'
    symmetric).  Returns left columns + payload columns (nullable)."""
    assert direction in ("backward", "forward")

    lcols = left.columns
    l = left.withColumn("__ts", F.col(left_ts).cast("timestamp")).withColumn(
        "__is_left", F.lit(1)
    )
    for c in payload_cols:
        l = l.withColumn(f"__p_{c}", F.lit(None).cast(right.schema[c].dataType))

    r = right.withColumn("__ts", F.col(right_ts).cast("timestamp")).withColumn(
        "__is_left", F.lit(0)
    )
    for c in payload_cols:
        r = r.withColumn(f"__p_{c}", F.col(c))
    r = r.select(
        F.col(on), "__ts", "__is_left", *[f"__p_{c}" for c in payload_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
    )
    l = l.select(F.col(on), "__ts", "__is_left", *[f"__p_{c}" for c in payload_cols],
                 *[c for c in lcols if c != on])

    u = l.unionByName(r)
    if direction == "backward":
        # right rows sort before left rows at equal ts (<= semantics)
        w = W.partitionBy(on).orderBy(F.asc("__ts"), F.asc("__is_left")).rowsBetween(
            W.unboundedPreceding, 0
        )
    else:
        w = W.partitionBy(on).orderBy(F.desc("__ts"), F.asc("__is_left")).rowsBetween(
            W.unboundedPreceding, 0
        )
    for c in payload_cols:
        u = u.withColumn(f"__p_{c}", F.last(f"__p_{c}", ignorenulls=True).over(w))
    return (
        u.where(F.col("__is_left") == 1)
        .select(
            on,
            *[c for c in lcols if c != on],
            *[F.col(f"__p_{c}").alias(c) for c in payload_cols],
        )
    )
