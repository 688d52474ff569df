"""End-to-end KG construction plan (SURVEY.md §3.3, BASELINE.json:14):

    scan → extract (A1–A6, one Arrow-UDF stage) → dedup (A12)
      → checkpoint triples (A14)
      → link + canonicalize (A7–A11)
      → validate against the SHACL metamodel (§2.B)
      → materialize node/edge tables + metrics (A13, A16)

Everything except the CC loop is ONE lazy DAG; control returns to the
driver only at checkpoint writes and CC convergence checks.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from shacl_spark.kg.canon import canonicalize
from shacl_spark.kg.checkpoint import run_with_checkpoints
from shacl_spark.kg.extract import extract_triples
from shacl_spark.kg.materialize import write_graph
from shacl_spark.shacl import validate


@dataclass
class KgBuildResult:
    triples: DataFrame
    report: DataFrame
    metrics: dict = field(default_factory=dict)


def build_kg(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    shapes_rows=None,
    n_parts: int = 1024,
    ckpt: bool = True,
    link_threshold: float = 0.75,
) -> KgBuildResult:
    """Run the full pipeline over a source-code corpus
    ``(repo, path, commit, lang, content)``; returns the canonical
    triples, the validation report, and write metrics."""
    triples = extract_triples(corpus, n_parts=n_parts)

    if ckpt:
        ckpt_dir = os.path.join(out_dir, "checkpoint")
        triples = run_with_checkpoints(triples, ckpt_dir, n_parts=n_parts)

    canonical = canonicalize(triples, threshold=link_threshold)

    report = (
        # canonical triples are distinct by construction (A12 dedup)
        validate(spark, canonical, shapes_rows, assume_distinct=True)
        if shapes_rows
        else spark.createDataFrame([], "focus string, component string")
    )

    metrics = write_graph(canonical, out_dir)
    return KgBuildResult(triples=canonical, report=report, metrics=metrics)
