"""E2E pipeline tests (SURVEY.md §5.2): golden counts, metamodel
validation of pipeline output, resume-after-kill identity."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from shacl_spark.kg.checkpoint import completed_partitions, run_with_checkpoints
from shacl_spark.kg.extract import extract_triples
from shacl_spark.plans.kg_pipeline import build_kg
from shacl_spark.shacl.kg_shapes import KG_METAMODEL
from shacl_spark.sources.corpus import synth_corpus

N_FILES = 120
N_PARTS = 64


def _sorted_triples(df):
    return sorted(
        (r["subj"], r["pred"], r["obj"], r["obj_dt"], r["obj_lang"])
        for r in df.select("subj", "pred", "obj", "obj_dt", "obj_lang").collect()
    )


def test_build_kg_end_to_end(spark, tmp_path):
    corpus = synth_corpus(spark, N_FILES, parts=4)
    result = build_kg(
        spark, corpus, str(tmp_path / "kg"), shapes_rows=KG_METAMODEL,
        n_parts=N_PARTS,
    )
    assert result.metrics["edges"] > 0
    assert result.metrics["nodes"] > 0

    # pipeline output conforms to its own metamodel
    bad = result.report.collect()
    assert not bad, f"metamodel violations: {bad[:5]}"

    # materialized tables readable + consistent
    edges = spark.read.parquet(str(tmp_path / "kg" / "edges"))
    nodes = spark.read.parquet(str(tmp_path / "kg" / "nodes"))
    assert edges.count() == result.metrics["edges"]
    assert nodes.count() == result.metrics["nodes"]
    assert edges.where(F.col("triple_id").isNull()).count() == 0

    # every file emitted provenance
    n_files_out = edges.where(F.col("pred") == "kg:sha256").count()
    assert n_files_out == N_FILES


def test_resume_after_kill_produces_identical_tables(spark, tmp_path):
    corpus = synth_corpus(spark, 40, parts=4)
    triples = extract_triples(corpus, n_parts=N_PARTS)

    full_dir = tmp_path / "full"
    out_full = run_with_checkpoints(triples, str(full_dir), group_size=16, n_parts=N_PARTS)
    golden = _sorted_triples(out_full)

    # simulate a kill: run only the first group, delete the rest's manifest
    partial_dir = tmp_path / "partial"
    run_with_checkpoints(triples, str(partial_dir), group_size=16, n_parts=N_PARTS)
    # wipe manifests + data for groups >= 2 → "killed" mid-run
    import os

    for name in os.listdir(partial_dir / "_manifest"):
        if name not in ("group-0.json", "group-1.json"):
            os.remove(partial_dir / "_manifest" / name)
    for name in os.listdir(partial_dir / "triples"):
        if name not in ("group=0", "group=1"):
            shutil.rmtree(partial_dir / "triples" / name)

    done_before = completed_partitions(spark, str(partial_dir))
    assert done_before == set(range(32))

    # resume: only the missing groups are reprocessed
    out_resumed = run_with_checkpoints(
        triples, str(partial_dir), group_size=16, n_parts=N_PARTS
    )
    assert _sorted_triples(out_resumed) == golden


def test_lineage_columns_populated(spark, tmp_path):
    corpus = synth_corpus(spark, 20, parts=2)
    triples = extract_triples(corpus, n_parts=N_PARTS)
    row = triples.where(F.col("pred") == "kg:sha256").first()
    assert row["src_repo"] and row["src_path"] and row["src_commit"]
    assert 0 <= row["part_id"] < N_PARTS
