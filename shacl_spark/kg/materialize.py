"""Node/edge table materialization with lineage + metrics (SURVEY.md
§2.A A13, A16; BASELINE.json:6 "materializes node/edge Iceberg tables
with per-partition lineage").

In-sandbox the sink is parquet; on a cluster with the Iceberg runtime
the same frames go through ``writeTo(...).partitionedBy(bucket(N,
"subj"))`` — the writer is isolated here so that swap is one function.
Writes are range-partitioned on the key (A16) so files are balanced
and downstream scans get sorted, prunable files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shacl_spark.functions.terms import KG, RDF_TYPE, triple_id


def node_table(triples: DataFrame) -> DataFrame:
    """Distinct IRIs with their rdf:type labels (if any)."""
    subj = triples.select(F.col("subj").alias("iri"))
    obj = triples.where(F.col("obj_kind") == "iri").select(F.col("obj").alias("iri"))
    nodes = subj.unionByName(obj).distinct()
    labels = (
        triples.where(F.col("pred") == RDF_TYPE)
        .groupBy(F.col("subj").alias("iri"))
        .agg(F.sort_array(F.collect_set("obj")).alias("types"))
    )
    return nodes.join(labels, "iri", "left").select(
        "iri", F.coalesce("types", F.array().cast("array<string>")).alias("types")
    )


def edge_table(triples: DataFrame) -> DataFrame:
    """Triples + the deterministic content-addressed row id (§1.4)."""
    return triples.withColumn("triple_id", triple_id())


def write_graph(
    triples: DataFrame,
    out_dir: str,
    num_files: int | None = None,
) -> dict[str, int]:
    """Materialize node + edge tables; returns observed row metrics.

    Uses ``df.observe`` for metrics (no extra pass over the data) and
    ``repartitionByRange`` for balanced, sorted output files.
    """
    from pyspark.sql import Observation

    n = num_files or max(triples.sparkSession.sparkContext.defaultParallelism, 8)

    # observe ABOVE the range exchange: repartitionByRange makes a
    # sampling pass over its child to pick boundaries, which would run a
    # child-side CollectMetrics twice and double the counts
    edge_obs = Observation("edges")
    edges = (
        edge_table(triples)
        .repartitionByRange(n, "subj")
        .observe(edge_obs, F.count(F.lit(1)).alias("rows"))
    )
    edges.write.mode("overwrite").parquet(os.path.join(out_dir, "edges"))

    node_obs = Observation("nodes")
    nodes = (
        node_table(triples)
        .repartitionByRange(n, "iri")
        .observe(node_obs, F.count(F.lit(1)).alias("rows"))
    )
    nodes.write.mode("overwrite").parquet(os.path.join(out_dir, "nodes"))
    return {"edges": edge_obs.get["rows"], "nodes": node_obs.get["rows"]}
