"""The W3C SHACL Recommendation's §1 Person walkthrough, ingested from
REAL Turtle files — the 'a reference user brings their .ttl shapes'
path: parse → validate → exact expected report, plus oracle parity and
report-graph serialization round-trip."""

from __future__ import annotations

import os

from shacl_spark.functions.terms import SH, triples_from_rows
from shacl_spark.shacl import validate
from shacl_spark.shacl.report import REPORT_METAMODEL, report_to_triples
from shacl_spark.shacl.turtle import parse_turtle_file
from tests.oracle import Oracle, precision_recall

TTL = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "ttl")
EX = "http://example.com/ns#"


def test_person_example_exact_report(spark):
    shapes = parse_turtle_file(os.path.join(TTL, "person_shapes.ttl"))
    data = parse_turtle_file(os.path.join(TTL, "person_data.ttl"))
    rep = validate(spark, triples_from_rows(spark, data), shapes)
    rows = {(r["focus"], r["value"], r["component"].split("#")[-1]) for r in rep.collect()}
    assert rows == {
        # Bob: two ssn values
        (EX + "Bob", None, "MaxCountConstraintComponent"),
        # Calvin: malformed ssn, untyped employer, closed-violating birthDate
        (EX + "Calvin", "230-00-000", "PatternConstraintComponent"),
        (EX + "Calvin", EX + "UntypedCompany", "ClassConstraintComponent"),
        (EX + "Calvin", "1971-07-07", "ClosedConstraintComponent"),
    }
    # Alice conforms entirely
    assert not any(f == EX + "Alice" for f, _, _ in rows)

    # oracle parity on the same Turtle-derived rows
    p, r = precision_recall(rep.collect(), Oracle(data, shapes).validate())
    assert (p, r) == (1.0, 1.0)

    # the serialized results graph itself conforms to the report metamodel
    triples = report_to_triples(rep)
    assert validate(spark, triples, REPORT_METAMODEL).isEmpty()
