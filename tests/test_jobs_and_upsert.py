"""spark-submit job smoke + streaming upsert sink."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F


def test_build_kg_job_main(spark, tmp_path, capsys):
    from jobs.build_kg import main

    rc = main(
        [
            "--synthetic", "80",
            "--output", str(tmp_path / "kg"),
            "--partitions", "32",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = json.loads(out)
    assert metrics["metrics"]["edges"] > 0
    assert metrics["violations"] == 0
    assert metrics["triples_per_sec"] > 0


def test_streaming_triple_upsert(spark, tmp_path):
    from shacl_spark.functions.terms import TRIPLE_SCHEMA
    from shacl_spark.streaming.upsert import TripleUpsertSink

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    target = str(tmp_path / "triples_target")

    def rows(ids):
        return [
            (f"ex:s{i}", "ex:p", f"v{i}", "literal", None, None, None, None, None, None)
            for i in ids
        ]

    # batch 1 with an internal duplicate; batch 2 overlapping batch 1
    spark.createDataFrame(rows([1, 2, 2]), TRIPLE_SCHEMA).write.mode("overwrite").parquet(
        os.path.join(src, "b1")
    )
    sink = TripleUpsertSink(spark, target)
    stream = (
        spark.readStream.schema(TRIPLE_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src + "/b1")
    )
    q = sink.start(stream)
    q.awaitTermination()
    assert sink.current().count() == 2

    spark.createDataFrame(rows([2, 3]), TRIPLE_SCHEMA).write.mode("overwrite").parquet(
        os.path.join(src, "b2")
    )
    stream2 = (
        spark.readStream.schema(TRIPLE_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src + "/b2")
    )
    q2 = sink.start(stream2)
    q2.awaitTermination()
    final = sink.current()
    assert final.count() == 3
    assert {r["subj"] for r in final.collect()} == {"ex:s1", "ex:s2", "ex:s3"}


def test_fixture_export(tmp_path, monkeypatch):
    import fixtures.export as ex

    monkeypatch.setattr(
        ex, "__file__", str(tmp_path / "fixtures" / "export.py"), raising=False
    )
    os.makedirs(tmp_path / "fixtures", exist_ok=True)
    ex.main()
    dirs = [d for d in os.listdir(tmp_path / "fixtures") if os.path.isdir(tmp_path / "fixtures" / d)]
    assert len(dirs) >= 20
    sample = tmp_path / "fixtures" / "mincount_missing"
    assert (sample / "data.csv").exists()
    assert (sample / "expected_report.csv").exists()
