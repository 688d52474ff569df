"""Engine-vs-oracle parity over all SHACL fixture cases — the
BASELINE.md P/R ≥ 0.95 gate (target 1.0), SURVEY.md §5.2."""

from __future__ import annotations

import pytest

from fixtures.shacl_cases import CASES
from shacl_spark.functions.terms import triples_from_rows
from shacl_spark.shacl import validate
from tests.oracle import Oracle, precision_recall, report_set


@pytest.mark.parametrize("name", sorted(CASES))
def test_case_parity(spark, name):
    case = CASES[name]
    data_df = triples_from_rows(spark, case["data"])
    engine_rows = validate(spark, data_df, case["shapes"]).collect()
    oracle_results = Oracle(case["data"], case["shapes"]).validate()
    p, r = precision_recall(engine_rows, oracle_results)
    if (p, r) != (1.0, 1.0):
        e, o = report_set(engine_rows), report_set(oracle_results)
        msg = (
            f"{name}: P={p:.2f} R={r:.2f}\n"
            f"engine-only: {sorted(e - o)}\n"
            f"oracle-only: {sorted(o - e)}"
        )
        pytest.fail(msg)


def test_sparql_optional_bound(spark):
    """Absolute: OPTIONAL leaves ?n unbound for nick-less persons and
    !bound(?n) fires exactly for them; comparing an unbound var is a
    type error (second case: only the literal alias matches)."""
    case = CASES["sparql_optional_bound"]
    rows = validate(spark, triples_from_rows(spark, case["data"]), case["shapes"]).collect()
    assert {(r["focus"], r["value"]) for r in rows} == {("ex:b", "B")}

    case2 = CASES["sparql_optional_compare"]
    rows2 = validate(spark, triples_from_rows(spark, case2["data"]), case2["shapes"]).collect()
    assert {r["focus"] for r in rows2} == {"ex:a"}


def test_sparql_path_substitution(spark):
    """Absolute check: `$this $PATH ?value` resolves to the property
    shape's predicate path (SPEC §5.3.3) — only ex:b (due=5 < 10)
    violates; ex:c has no ex:due so no solution."""
    case = CASES["sparql_path_substitution"]
    rows = validate(spark, triples_from_rows(spark, case["data"]), case["shapes"]).collect()
    assert {(r["focus"], r["value"]) for r in rows} == {("ex:b", "5")}
    assert all(r["component"].endswith("SPARQLConstraintComponent") for r in rows)


def test_sparql_filter_term_equality(spark):
    """Absolute check for the ADVICE r02 FILTER flattening: `?value =
    "gold"` must match ONLY the plain/xsd:string literal — not the IRI
    ex:gold and not "gold"@en."""
    case = CASES["sparql_term_equality"]
    rows = validate(spark, triples_from_rows(spark, case["data"]), case["shapes"]).collect()
    assert {(r["focus"], r["value"]) for r in rows} == {("ex:a", "gold")}


def test_class_accepts_typed_bnode(spark):
    """Absolute (oracle-independent) check for the ADVICE r02 bug: a
    blank node with the required rdf:type is a SHACL instance and must
    NOT be a ClassConstraintComponent violation; an untyped bnode must."""
    case = CASES["class_typed_bnode"]
    rows = validate(spark, triples_from_rows(spark, case["data"]), case["shapes"]).collect()
    viols = {(r["focus"], r["value"]) for r in rows}
    assert viols == {("ex:bob", "_:b2")}


def test_valid_metamodel_conforms(spark):
    case = CASES["shaclshacl_valid"]
    report = validate(spark, triples_from_rows(spark, case["data"]), case["shapes"])
    assert report.isEmpty()
    assert not Oracle(case["data"], case["shapes"]).validate()


def test_broken_metamodel_violates(spark):
    case = CASES["shaclshacl_broken"]
    report = validate(spark, triples_from_rows(spark, case["data"]), case["shapes"])
    comps = {r["component"].split("#")[-1] for r in report.collect()}
    assert "MaxCountConstraintComponent" in comps  # two sh:path values
    assert "DatatypeConstraintComponent" in comps  # minCount "two"
    assert "NodeKindConstraintComponent" in comps  # literal sh:property value


def test_sparql_exists_absolute(spark):
    """Absolute EXISTS/NOT EXISTS semantics (r04): semi/anti joins with
    group-local variable scoping."""
    case = CASES["sparql_not_exists"]
    rows = validate(spark, triples_from_rows(spark, case["data"]), case["shapes"]).collect()
    # b's manager m2 reports to no one -> flagged; a's m1 does -> clean;
    # c has no reportsTo -> no solution
    assert {(r["focus"], r["value"]) for r in rows} == {("ex:b", "ex:m2")}

    case2 = CASES["sparql_exists_and_not_exists"]
    rows2 = validate(spark, triples_from_rows(spark, case2["data"]), case2["shapes"]).collect()
    # a: named + t1 untyped -> flagged; b: unnamed -> EXISTS fails;
    # c: t3 typed -> NOT EXISTS fails
    assert {(r["focus"], r["value"]) for r in rows2} == {("ex:a", "ex:t1")}

    case3 = CASES["sparql_exists_chain"]
    rows3 = validate(spark, triples_from_rows(spark, case3["data"]), case3["shapes"]).collect()
    assert {r["focus"] for r in rows3} == {"ex:a"}


def test_sparql_union_absolute(spark):
    """Absolute UNION semantics (r04): solutions from any arm; a var
    bound by only one arm is unbound (type-error false in FILTERs) in
    the other arm's solutions."""
    case = CASES["sparql_union"]
    rows = validate(spark, triples_from_rows(spark, case["data"]), case["shapes"]).collect()
    assert {(r["focus"], r["value"]) for r in rows} == {
        ("ex:a", "a@x"), ("ex:b", "555"), ("ex:d", "d@x"), ("ex:d", "556"),
    }

    case2 = CASES["sparql_union_filter"]
    rows2 = validate(spark, triples_from_rows(spark, case2["data"]), case2["shapes"]).collect()
    assert {r["focus"] for r in rows2} == {"ex:a"}
