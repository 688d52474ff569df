"""Report-as-triples serialization (SPEC §3.6): the serialized results
graph re-validates cleanly against the report metamodel, and its
content round-trips the report frame."""

from __future__ import annotations

from pyspark.sql import functions as F

from fixtures.shacl_cases import CASES
from shacl_spark.functions.terms import RDF, SH, XSD, triples_from_rows
from shacl_spark.shacl import validate
from shacl_spark.shacl.report import REPORT_METAMODEL, report_to_triples


def _report(spark, case):
    data = triples_from_rows(spark, case["data"])
    return validate(spark, data, case["shapes"])


def test_nonconforming_report_roundtrip(spark):
    case = CASES["term_identity_mincount"]
    rep = _report(spark, case)
    triples = report_to_triples(rep).cache()
    rows = {(r["subj"], r["pred"], r["obj"], r["obj_kind"], r["obj_dt"]) for r in triples.collect()}

    # header
    assert ("urn:shacl:report", RDF + "type", SH + "ValidationReport", "iri", None) in rows
    assert ("urn:shacl:report", SH + "conforms", "false", "literal", XSD + "boolean") in rows
    # one result node per distinct report row, linked from the header
    n_results = rep.count()
    assert sum(1 for r in rows if r[1] == SH + "result") == n_results
    assert sum(1 for r in rows if r[1] == RDF + "type" and r[2] == SH + "ValidationResult") == n_results
    # the literal focus node keeps its term identity
    focus_rows = [r for r in rows if r[1] == SH + "focusNode"]
    kinds = {(r[2], r[3]) for r in focus_rows}
    assert ("ex:x", "literal") in kinds  # the literal "ex:x" focus node
    # component IRIs survive
    assert any(
        r[1] == SH + "sourceConstraintComponent"
        and r[2] == SH + "MinCountConstraintComponent"
        for r in rows
    )

    # the results graph itself conforms to the report metamodel
    meta_report = validate(spark, triples, REPORT_METAMODEL)
    assert meta_report.isEmpty()


def test_conforming_report(spark):
    case = CASES["shaclshacl_valid"]
    rep = _report(spark, case)
    assert rep.isEmpty()
    triples = report_to_triples(rep)
    rows = {(r["pred"], r["obj"]) for r in triples.collect()}
    assert (SH + "conforms", "true") in rows
    assert not any(p == SH + "result" for p, _ in rows)
    assert validate(spark, triples, REPORT_METAMODEL).isEmpty()


def test_result_path_kind_from_engine(spark):
    """A plain predicate IRI containing regex-looking chars ('?', '+',
    '(') must still serialize as an IRI sh:resultPath — the engine
    marks predicate-ness explicitly; it is never sniffed from the
    surface string (ADVICE r02 report.py:58)."""
    weird = "http://ex.org/q?ver=1+(beta)"
    data = [("ex:a", RDF + "type", "ex:Thing")]
    shapes = [
        ("ex:S", RDF + "type", SH + "NodeShape"),
        ("ex:S", SH + "targetClass", "ex:Thing"),
        ("ex:S", SH + "property", "ex:SP"),
        ("ex:SP", SH + "path", weird),
        ("ex:SP", SH + "minCount", "1", "literal", XSD + "integer"),
    ]
    rep = validate(spark, triples_from_rows(spark, data), shapes)
    assert rep.count() == 1
    triples = report_to_triples(rep)
    path_rows = triples.where(F.col("pred") == SH + "resultPath").collect()
    assert len(path_rows) == 1
    assert path_rows[0]["obj"] == weird
    assert path_rows[0]["obj_kind"] == "iri"

    # a genuinely composite path still serializes as a string literal
    shapes_seq = [
        ("ex:S", RDF + "type", SH + "NodeShape"),
        ("ex:S", SH + "targetClass", "ex:Thing"),
        ("ex:S", SH + "property", "ex:SP"),
        ("ex:SP", SH + "path", "ex:seq/0"),
        ("ex:seq/0", RDF + "first", "ex:p"),
        ("ex:seq/0", RDF + "rest", "ex:seq/1"),
        ("ex:seq/1", RDF + "first", "ex:q"),
        ("ex:seq/1", RDF + "rest", RDF + "nil"),
        ("ex:SP", SH + "minCount", "1", "literal", XSD + "integer"),
    ]
    rep2 = validate(spark, triples_from_rows(spark, data), shapes_seq)
    prow = (
        report_to_triples(rep2).where(F.col("pred") == SH + "resultPath").collect()
    )
    assert len(prow) == 1 and prow[0]["obj_kind"] == "literal"


def test_report_revalidation_catches_tampering(spark):
    """Dropping a result's severity makes the serialized graph violate
    the report metamodel — the metamodel check is not vacuous."""
    case = CASES["term_identity_mincount"]
    triples = report_to_triples(_report(spark, case))
    tampered = triples.where(F.col("pred") != SH + "resultSeverity")
    rep = validate(spark, tampered, REPORT_METAMODEL)
    comps = {r["component"] for r in rep.collect()}
    assert SH + "MinCountConstraintComponent" in comps
