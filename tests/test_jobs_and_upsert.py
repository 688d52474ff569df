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


def test_upsert_append_one_file_per_partition(spark, tmp_path):
    """The append clusters the delta by target partition (r06): each
    touched part= directory must receive ONE data file per batch, not
    one per (task x partition) — tiny-file commits dominated
    small-batch appends."""
    from shacl_spark.functions.terms import TRIPLE_SCHEMA
    from shacl_spark.streaming.upsert import TripleUpsertSink

    target = str(tmp_path / "t")
    rows = [
        (f"ex:s{i}", "ex:p", f"v{i}", "literal", None, None, None, None, None, None)
        for i in range(64)
    ]
    # a many-partition batch frame would previously fan out into many
    # files per part= directory
    batch = spark.createDataFrame(rows, TRIPLE_SCHEMA).repartition(8)
    sink = TripleUpsertSink(spark, target, n_parts=4)
    sink._merge_batch(batch, 0)
    for d in os.listdir(target):
        if not d.startswith("part="):
            continue
        files = [
            f for f in os.listdir(os.path.join(target, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (d, files)
    assert sink.current().count() == 64


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


def test_upsert_untouched_partitions_not_rewritten(spark, tmp_path):
    """The partitioned merge is O(touched): a batch that lands in one
    hash partition leaves every other partition's files byte-identical
    (VERDICT r01 #8)."""
    import hashlib

    from shacl_spark.functions.terms import TRIPLE_SCHEMA
    from shacl_spark.streaming.upsert import TripleUpsertSink

    target = str(tmp_path / "target")
    sink = TripleUpsertSink(spark, target, n_parts=8)

    def rows(ids):
        return [
            (f"ex:s{i}", "ex:p", f"v{i}", "literal", None, None, None, None, None, None)
            for i in ids
        ]

    sink._merge_batch(spark.createDataFrame(rows(range(64)), TRIPLE_SCHEMA), 0)

    def file_hashes():
        out = {}
        for root, _dirs, files in os.walk(target):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = hashlib.sha256(open(p, "rb").read()).hexdigest()
        return out

    before = file_hashes()
    assert len({os.path.dirname(p) for p in before}) == 8  # all partitions hit

    # one new row -> exactly one partition touched
    sink._merge_batch(spark.createDataFrame(rows([1000]), TRIPLE_SCHEMA), 1)
    after = file_hashes()
    new_files = set(after) - set(before)
    touched_dirs = {os.path.dirname(p) for p in new_files}
    assert len(touched_dirs) == 1
    for p, h in before.items():
        assert after[p] == h, f"untouched file rewritten: {p}"
    assert sink.current().count() == 65

    # idempotent replay of the same batch: nothing appended
    sink._merge_batch(spark.createDataFrame(rows([1000]), TRIPLE_SCHEMA), 1)
    assert sink.current(dedup=False).count() == 65
