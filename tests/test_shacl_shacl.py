"""shacl-shacl battery: validate every fixture's SHAPES graph (as
data) with the metamodel — the reference's own test strategy
(BASELINE.json:6), engine vs oracle at P/R = 1.0."""

from __future__ import annotations

import pytest

from fixtures.shacl_cases import CASES
from shacl_spark.functions.terms import SH, XSD, RDF, triples_from_rows
from shacl_spark.shacl import validate
from shacl_spark.shacl.shacl_shacl import SHACL_SHACL
from tests.oracle import Oracle, precision_recall, report_set

# a representative subset — the metamodel has ~40 entry shapes and each
# validation costs ~20s of fixed Spark overhead at fixture scale; the
# full sweep runs with SPARK_GRAFT_FULL_SHACL_SHACL=1
import os

REPRESENTATIVE = [
    "mincount_missing",
    "qualified_min_max",
    "logical_xone_and",
    "paths_inverse_sequence_alternative_zeroormore",
    "languagein",
    "shaclshacl_valid",
]
WELL_FORMED = (
    sorted(CASES) if os.environ.get("SPARK_GRAFT_FULL_SHACL_SHACL") else REPRESENTATIVE
)


@pytest.mark.parametrize("name", WELL_FORMED)
def test_fixture_shapes_graphs_are_metamodel_clean(spark, name):
    """Every fixture's shapes graph conforms to the metamodel, and the
    engine agrees with the oracle about it."""
    shapes_as_data = CASES[name]["shapes"]
    engine_rows = validate(
        spark, triples_from_rows(spark, shapes_as_data), SHACL_SHACL
    ).collect()
    oracle_results = Oracle(shapes_as_data, SHACL_SHACL).validate()
    p, r = precision_recall(engine_rows, oracle_results)
    assert (p, r) == (1.0, 1.0), (
        f"{name}: engine-only={sorted(report_set(engine_rows) - report_set(oracle_results))[:4]} "
        f"oracle-only={sorted(report_set(oracle_results) - report_set(engine_rows))[:4]}"
    )
    assert not engine_rows, f"{name}: shapes graph violates the metamodel: {engine_rows[:4]}"


def test_metamodel_catches_malformed_shapes(spark):
    T = RDF + "type"
    bad_shapes_as_data = [
        # two sh:path values (maxCount 1) and a literal one (nodeKind)
        ("ex:P", SH + "path", "ex:a"),
        ("ex:P", SH + "path", "oops", "literal", XSD + "string"),
        # minCount with a string value (datatype)
        ("ex:P", SH + "minCount", "two", "literal", XSD + "string"),
        # bad nodeKind value (sh:in)
        ("ex:P2", SH + "path", "ex:b"),
        ("ex:P2", SH + "nodeKind", SH + "Banana"),
        # literal sh:property value (nodeKind)
        ("ex:N", T, SH + "NodeShape"),
        ("ex:N", SH + "property", "not-a-shape", "literal", XSD + "string"),
    ]
    engine_rows = validate(
        spark, triples_from_rows(spark, bad_shapes_as_data), SHACL_SHACL
    ).collect()
    oracle_results = Oracle(bad_shapes_as_data, SHACL_SHACL).validate()
    assert precision_recall(engine_rows, oracle_results) == (1.0, 1.0)
    comps = {r["component"].split("#")[-1] for r in engine_rows}
    assert "MaxCountConstraintComponent" in comps
    assert "NodeKindConstraintComponent" in comps
    assert "DatatypeConstraintComponent" in comps
    assert "InConstraintComponent" in comps
