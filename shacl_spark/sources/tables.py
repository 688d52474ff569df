"""Readers for the driver testdata and (at scale) Iceberg tables.

In the sandbox everything is parquet; ``load_table`` keeps an
import-try Iceberg path so the same call works on a real cluster with
the Iceberg runtime jar on the classpath (FIXTURES.md §3, SURVEY.md
§2.A A1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table; at cluster scale, an ``iceberg://`` or
    catalog-qualified name routes through the Iceberg DataSource V2
    (partition pruning + hidden-partition pushdown for free)."""
    if "://" in sf_dir or "." in os.path.basename(sf_dir.rstrip("/")) and not os.path.isdir(sf_dir):
        pass  # catalog path handled below
    if os.path.isdir(sf_dir):
        return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # catalog-qualified (e.g. "iceberg_cat.db") — DataSource V2 path
    return spark.read.table(f"{sf_dir}.{name}")


def load_tables(spark: SparkSession, sf_dir: str, names=None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TPCH_TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names=None) -> None:
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
