"""Checkpoint/resume manifest (SURVEY.md §2.A A14; BASELINE.json:14
"resumable from checkpoint with per-partition lineage + metrics").

The unit of resumability is the deterministic extraction partition
``part_id`` (a pure hash of file identity — stable across reruns and
physical repartitioning).  Each completed partition writes its triples
under ``part_id=<k>/`` plus a manifest row; a rerun anti-joins the
manifest and processes only pending partitions.  Writes are idempotent
per partition (overwrite of the partition directory).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def manifest_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, "_manifest")


def completed_partitions(spark: SparkSession, ckpt_dir: str) -> set[int]:
    path = manifest_path(ckpt_dir)
    if not os.path.isdir(path):
        return set()
    rows = spark.read.json(path).collect()
    return {int(r["part_id"]) for r in rows}


def run_with_checkpoints(
    triples: DataFrame,
    ckpt_dir: str,
    group_size: int = 256,
    n_parts: int = 1024,
) -> DataFrame:
    """Write ``triples`` partitioned by part_id, skipping completed
    groups; returns the full checkpointed triple set (reader over the
    checkpoint dir).

    Partitions are processed in ``group_size`` batches (one Spark job
    per batch, metrics per batch) so a mid-run kill loses at most one
    batch of work.
    """
    spark = triples.sparkSession
    done = completed_partitions(spark, ckpt_dir)
    all_groups = sorted({p // group_size for p in range(n_parts)})
    pending = [
        g
        for g in all_groups
        if not all(p in done for p in range(g * group_size, (g + 1) * group_size))
    ]

    os.makedirs(manifest_path(ckpt_dir), exist_ok=True)
    data_dir = os.path.join(ckpt_dir, "triples")

    for g in pending:
        lo, hi = g * group_size, (g + 1) * group_size
        batch = triples.where((F.col("part_id") >= lo) & (F.col("part_id") < hi))
        (
            batch.write.mode("overwrite")
            .partitionBy("part_id")
            .parquet(os.path.join(data_dir, f"group={g}"))
        )
        # manifest rows are written AFTER the data commit — a kill between
        # the two re-does the group idempotently
        rows = [
            json.dumps({"part_id": p, "group": g})
            for p in range(lo, hi)
        ]
        with open(os.path.join(manifest_path(ckpt_dir), f"group-{g}.json"), "w") as f:
            f.write("\n".join(rows) + "\n")

    return spark.read.option("basePath", data_dir).parquet(
        os.path.join(data_dir, "group=*")
    )
