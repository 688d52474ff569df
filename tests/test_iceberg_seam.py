"""Iceberg seam (VERDICT r04 next-round #9): the container has no
Iceberg runtime jar, so execution is env-blocked — these tests pin the
parts that CAN run in-sandbox so the seam can't rot silently:

- ``iceberg_writer`` plan construction (DataFrameWriterV2 + bucket /
  identity partition transforms) must build without touching a catalog;
- executing it must fail with the expected missing-catalog/provider
  error (if a future image ships the jars, the gate flips to a real
  round-trip instead of rotting);
- ``load_table``'s catalog-qualified routing (``spark.read.table``)
  must work against any V2-capable catalog — proven with the built-in
  session catalog.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shacl_spark.sources.tables import iceberg_writer, load_table


def _frame(spark):
    return spark.range(10).select(
        F.concat(F.lit("s"), F.col("id")).alias("subj"),
        F.lit("p").alias("pred"),
        F.col("id").cast("string").alias("obj"),
    )


def test_writer_plan_construction(spark):
    """Builds the V2 writer with bucket + identity transforms — no
    execution, no catalog needed; signature drift fails here."""
    w = iceberg_writer(
        _frame(spark), "ice.db.triples", bucket_col="subj", n_buckets=8,
        partition_cols=["pred"],
    )
    # the unexecuted writer is inert; building a second variant with
    # defaults must also succeed
    assert w is not None
    assert iceberg_writer(_frame(spark), "ice.db.plain") is not None


def test_writer_execution_gate(spark):
    """Executing against an unconfigured catalog must raise the
    documented missing-catalog error — if this ever PASSES, the image
    gained Iceberg jars and the seam should be promoted to a real
    round-trip test."""
    w = iceberg_writer(_frame(spark), "no_such_cat.db.t", bucket_col="subj")
    try:
        w.createOrReplace()
    except Exception as e:  # pragma: no cover - message varies by env
        msg = str(e).lower()
        assert "catalog" in msg or "iceberg" in msg or "not found" in msg
    else:
        df = spark.read.table("no_such_cat.db.t")
        assert df.count() == 10
        pytest.fail(
            "Iceberg catalog unexpectedly available — promote "
            "test_iceberg_seam to a real round-trip"
        )


def test_catalog_qualified_load_table_routing(spark, tmp_path):
    """`load_table` with a non-directory, catalog-qualified prefix must
    route through spark.read.table (the Iceberg DataSource V2 path).
    The session catalog stands in for an Iceberg catalog — the routing
    logic is identical."""
    spark.sql("CREATE DATABASE IF NOT EXISTS icebergseam")
    _frame(spark).write.mode("overwrite").saveAsTable("icebergseam.region")
    try:
        out = load_table(spark, "icebergseam", "region")
        assert out.count() == 10
        assert set(out.columns) == {"subj", "pred", "obj"}
    finally:
        spark.sql("DROP TABLE IF EXISTS icebergseam.region")
        spark.sql("DROP DATABASE IF EXISTS icebergseam")
