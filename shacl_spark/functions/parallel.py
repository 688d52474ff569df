"""Adaptive parallelism helper (r06).

Single-file parquet inputs with one row group scan as ONE task no
matter the session size (a parquet row group is indivisible), so any
per-row-expensive stage downstream of such a scan — Arrow UDFs,
shingling, regex extraction — runs on one core while the rest idle.

``ensure_min_parallelism`` repartitions a frame up to the session's
default parallelism ONLY when its current partitioning is narrower:
at deployment scale inputs arrive in hundreds of splits and this is a
no-op; in the degenerate small-file case it costs one narrow shuffle
of the raw rows and buys full-width execution of everything after it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` to ``min_parts`` (default: the
    session's defaultParallelism) when it currently has fewer
    partitions; otherwise return it unchanged."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
