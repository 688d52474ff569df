"""Explicit salted-key skew handling for hub entities (SURVEY.md §2.A
A15; BASELINE.json:14 — e.g. stdlib imports appearing in 30% of 10^12
files).

AQE's skew-join splits oversized *partitions*, but a single hot key
still lands on one reducer for aggregations and non-AQE-eligible
joins.  The fix: detect heavy hitters on a sample, salt only those
keys on the big side, and replicate only those keys ×S on the small
side — the non-skewed flow is untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame, key: str, threshold: int = 100_000, sample_fraction: float = 0.01
) -> DataFrame:
    """Keys whose estimated count exceeds ``threshold`` — counted on a
    deterministic sample (seeded), scaled back up."""
    est = (
        df.sample(fraction=sample_fraction, seed=42)
        .groupBy(key)
        .agg((F.count("*") / sample_fraction).alias("est_n"))
        .where(F.col("est_n") >= threshold)
        .select(key)
    )
    return est


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    hot_keys: DataFrame | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with hot keys salted.

    - big side: hot rows get ``salt_id = pmod(xxhash64(all cols), S)``,
      cold rows get 0;
    - small side: hot rows are replicated ×S (explode), cold once.
    Join on (key, salt_id).  With ``hot_keys=None`` every key is salted
    (uniform small side; fine when `small` is tiny).
    """
    sdf = F.broadcast(hot_keys.select(F.col(key)).withColumn("__hot", F.lit(True))) if hot_keys is not None else None

    b = big
    if sdf is not None:
        b = b.join(sdf, key, "left")
        hot = F.coalesce(F.col("__hot"), F.lit(False))
    else:
        hot = F.lit(True)
    b = b.withColumn(
        "__salt",
        F.when(hot, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)))
        .otherwise(F.lit(0))
        .cast("int"),
    ).drop("__hot")

    s = small
    if sdf is not None:
        s = s.join(sdf, key, "left")
        s_hot = F.coalesce(F.col("__hot"), F.lit(False))
    else:
        s_hot = F.lit(True)
    s = (
        s.withColumn(
            "__salts",
            F.when(s_hot, F.sequence(F.lit(0), F.lit(salt - 1))).otherwise(F.array(F.lit(0))),
        )
        .withColumn("__salt", F.explode("__salts"))
        .drop("__salts", "__hot")
    )
    return b.join(s, [key, "__salt"], how).drop("__salt")


def salted_count(df: DataFrame, key: str, salt: int = 32) -> DataFrame:
    """Two-phase aggregation for skewed counts: partial count per
    (key, salt) then final per key — the hot key's work spreads over
    ``salt`` reducers.  The salt hashes ALL columns (deterministic; rows
    of a hot key differ in their other columns, so they spread).
    (groupBy already does map-side partial aggregation; this helper is
    for *chained* aggs where the partial isn't enough, and documents
    the pattern.)"""
    return (
        df.withColumn(
            "__salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt)),
        )
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("partial_n"))
        .groupBy(key)
        .agg(F.sum("partial_n").alias("n"))
    )
