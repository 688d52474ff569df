"""Error-path coverage: cyclic shapes, non-converging fixpoints,
ill-formed shape parameters, validate-job CLI."""

from __future__ import annotations

import json

import pytest

from shacl_spark.functions.terms import RDF, SH, XSD
from shacl_spark.operators.fixpoint import iterate_to_fixpoint
from shacl_spark.shacl.parser import parse_shapes_graph

T = RDF + "type"


def test_cyclic_shapes_rejected():
    shapes = [
        ("ex:A", T, SH + "NodeShape"),
        ("ex:A", SH + "node", "ex:B"),
        ("ex:B", T, SH + "NodeShape"),
        ("ex:B", SH + "node", "ex:A"),
    ]
    with pytest.raises(ValueError, match="recursive shape reference"):
        parse_shapes_graph(shapes)


def test_property_shape_without_path_rejected():
    shapes = [("ex:P", T, SH + "PropertyShape")]
    with pytest.raises(ValueError, match="no sh:path"):
        parse_shapes_graph(shapes)


def test_non_integer_mincount_rejected():
    shapes = [
        ("ex:P", SH + "path", "ex:p"),
        ("ex:P", SH + "minCount", "two", "literal", XSD + "string"),
    ]
    with pytest.raises(ValueError, match="non-integer"):
        parse_shapes_graph(shapes)


def test_fixpoint_max_iter_raises(spark):
    # a step that always yields a brand-new row never converges
    seed = spark.createDataFrame([(0,)], ["n"])

    def step(frontier):
        from pyspark.sql import functions as F

        return frontier.select((F.col("n") + 1).alias("n"))

    with pytest.raises(RuntimeError, match="did not converge"):
        iterate_to_fixpoint(seed, step, ["n"], max_iter=5)


def test_validate_graph_cli(spark, tmp_path, capsys):
    from shacl_spark.functions.terms import triples_from_rows
    from jobs.validate_graph import main

    data = triples_from_rows(
        spark,
        [("ex:a", T, "ex:Thing"),
         ("ex:b", T, "ex:Thing"),
         ("ex:b", "ex:name", "B", "literal", XSD + "string")],
    )
    data.write.parquet(str(tmp_path / "data"))

    import csv

    with open(tmp_path / "shapes.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["subj", "pred", "obj", "obj_kind", "obj_dt", "obj_lang"])
        for row in [
            ("ex:S", T, SH + "NodeShape", "iri", "", ""),
            ("ex:S", SH + "targetClass", "ex:Thing", "iri", "", ""),
            ("ex:S", SH + "property", "ex:SP", "iri", "", ""),
            ("ex:SP", SH + "path", "ex:name", "iri", "", ""),
            ("ex:SP", SH + "minCount", "1", "literal", XSD + "integer", ""),
        ]:
            w.writerow(row)

    rc = main(["--data", str(tmp_path / "data"), "--shapes", str(tmp_path / "shapes.csv")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["conforms"] is False
    assert out["violations_by_component"] == {"MinCountConstraintComponent": 1}
