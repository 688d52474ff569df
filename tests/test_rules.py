"""SHACL-AF inference rules (shacl/rules.py; SHACL-AF §4).

Engine results are checked against closed-form expectations (the rule
fixtures are small enough that the fixpoint is known exactly) plus a
naive driver-side fixpoint recomputation for the transitive case.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shacl_spark.functions.terms import RDF, SH, XSD, triples_from_rows
from shacl_spark.shacl.rules import Rule, infer, infer_new, parse_rules

T = RDF + "type"
STR = XSD + "string"


def _shape_rows(*extra):
    """A NodeShape targeting ex:Person with the given rule rows."""
    base = [
        ("ex:S", T, SH + "NodeShape", "iri", None, None),
        ("ex:S", SH + "targetClass", "ex:Person", "iri", None, None),
    ]
    return base + list(extra)


def _rule(iri, *rows):
    return [("ex:S", SH + "rule", iri, "iri", None, None)] + [
        (iri,) + r for r in rows
    ]


def _triple_rule(iri, subj, pred, obj):
    return _rule(
        iri,
        (T, SH + "TripleRule", "iri", None, None),
        (SH + "subject", subj, "iri", None, None),
        (SH + "predicate", pred, "iri", None, None),
        (SH + "object", obj, "iri", None, None),
    )


DATA = [
    ("ex:alice", T, "ex:Person"),
    ("ex:bob", T, "ex:Person"),
    ("ex:acme", T, "ex:Org"),
    ("ex:alice", "ex:parent", "ex:bob"),
    ("ex:bob", "ex:parent", "ex:carol"),
]


def test_triple_rule_this_const(spark):
    """subject=sh:this, predicate/object constants: every focus node
    gets typed."""
    shapes = _shape_rows(
        *_triple_rule("ex:r", SH + "this", T, "ex:Human"),
    )
    data = triples_from_rows(spark, DATA)
    new = infer_new(data, shapes).collect()
    got = {(r["subj"], r["pred"], r["obj"]) for r in new}
    assert got == {
        ("ex:alice", T, "ex:Human"),
        ("ex:bob", T, "ex:Human"),
    }
    assert all(r["obj_kind"] == "iri" for r in new)


def test_triple_rule_path_object(spark):
    """object = path expression (sh:path ex:parent): one inferred
    triple per (focus, path value)."""
    shapes = _shape_rows(
        *_triple_rule("ex:r", SH + "this", "ex:elder", "ex:pexpr"),
        ("ex:pexpr", SH + "path", "ex:parent", "iri", None, None),
    )
    data = triples_from_rows(spark, DATA)
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in infer_new(data, shapes).collect()
    }
    assert got == {
        ("ex:alice", "ex:elder", "ex:bob"),
        ("ex:bob", "ex:elder", "ex:carol"),
    }


def test_condition_filters_focus(spark):
    """sh:condition keeps only focus nodes CONFORMING to the shape —
    here: those with at least one ex:parent whose target is known."""
    shapes = _shape_rows(
        *_triple_rule("ex:r", SH + "this", T, "ex:Child"),
        ("ex:r", SH + "condition", "ex:HasParent", "iri", None, None),
        ("ex:HasParent", T, SH + "NodeShape", "iri", None, None),
        ("ex:HasParent", SH + "property", "ex:HasParentP", "iri", None, None),
        ("ex:HasParentP", SH + "path", "ex:parentOfPerson", "iri", None, None),
        ("ex:HasParentP", SH + "minCount", "1", "literal", XSD + "integer", None),
    )
    data = triples_from_rows(
        spark, DATA + [("ex:alice", "ex:parentOfPerson", "ex:bob")]
    )
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in infer_new(data, shapes).collect()
    }
    # bob has no ex:parentOfPerson → fails the condition → no inference
    assert got == {("ex:alice", T, "ex:Child")}


def test_sparql_rule_transitive_fixpoint(spark):
    """SPARQLRule squaring a base relation reaches the transitive
    closure in multiple rounds; parity vs a naive driver fixpoint."""
    chain = [(f"ex:n{i}", "ex:next", f"ex:n{i + 1}") for i in range(6)]
    types = [(f"ex:n{i}", T, "ex:Person") for i in range(7)]
    shapes = _shape_rows(
        *_triple_rule("ex:base", SH + "this", "ex:reach", "ex:nexpr"),
        ("ex:nexpr", SH + "path", "ex:next", "iri", None, None),
        *_rule(
            "ex:step",
            (T, SH + "SPARQLRule", "iri", None, None),
            (
                SH + "construct",
                "CONSTRUCT { $this <ex:reach> ?b } "
                "WHERE { $this <ex:reach> ?m . ?m <ex:reach> ?b }",
                "literal",
                STR,
                None,
            ),
        ),
    )
    data = triples_from_rows(spark, chain + types)
    stats: dict = {}
    got = {
        (r["subj"], r["obj"])
        for r in infer_new(data, shapes, stats=stats).collect()
    }
    # naive driver fixpoint over the same semantics
    persons = {f"ex:n{i}" for i in range(7)}
    reach = {(a, b) for a, _, b in chain if a in persons}
    while True:
        step = {(a, c) for a, b in reach for b2, c in reach if b == b2 and a in persons}
        nxt = reach | step
        if nxt == reach:
            break
        reach = nxt
    assert got == reach
    assert stats["rules_converged"] is True
    assert stats["rules_rounds"] >= 3  # squaring a 6-chain needs 3 rounds
    # every ex:reach triple is inferred (the data only has ex:next)
    assert stats["rules_inferred_triples"] == len(reach)


def test_deactivated_rule_and_shape_skipped(spark):
    shapes = _shape_rows(
        *_triple_rule("ex:r", SH + "this", T, "ex:Human"),
        ("ex:r", SH + "deactivated", "true", "literal", XSD + "boolean", None),
    )
    data = triples_from_rows(spark, DATA)
    assert infer_new(data, shapes).count() == 0

    shapes2 = _shape_rows(
        *_triple_rule("ex:r", SH + "this", T, "ex:Human"),
        ("ex:S", SH + "deactivated", "true", "literal", XSD + "boolean", None),
    )
    assert infer_new(data, shapes2).count() == 0


def test_invalid_rdf_rows_dropped(spark):
    """Literal subjects / non-IRI predicates never materialize
    (SHACL-AF: such instantiations are skipped)."""
    shapes = _shape_rows(
        *_triple_rule("ex:r", "ex:nameExpr", "ex:p", SH + "this"),
        ("ex:nameExpr", SH + "path", "ex:name", "iri", None, None),
    )
    data = triples_from_rows(
        spark,
        [
            ("ex:alice", T, "ex:Person"),
            ("ex:alice", "ex:name", "Alice", "literal", STR),
        ],
    )
    assert infer_new(data, shapes).count() == 0


def test_max_rounds_raises_not_truncates(spark):
    chain = [(f"ex:n{i}", "ex:next", f"ex:n{i + 1}") for i in range(6)]
    types = [(f"ex:n{i}", T, "ex:Person") for i in range(7)]
    shapes = _shape_rows(
        *_triple_rule("ex:base", SH + "this", "ex:reach", "ex:nexpr"),
        ("ex:nexpr", SH + "path", "ex:next", "iri", None, None),
        *_rule(
            "ex:step",
            (T, SH + "SPARQLRule", "iri", None, None),
            (
                SH + "construct",
                "CONSTRUCT { $this <ex:reach> ?b } "
                "WHERE { $this <ex:reach> ?m . ?m <ex:reach> ?b }",
                "literal",
                STR,
                None,
            ),
        ),
    )
    data = triples_from_rows(spark, chain + types)
    stats: dict = {}
    with pytest.raises(RuntimeError, match="no fixpoint"):
        infer(data, shapes, max_rounds=2, stats=stats)
    assert stats["rules_converged"] is False


def test_parse_rules_order_and_validation(spark):
    rows = _shape_rows(
        *_triple_rule("ex:r2", SH + "this", T, "ex:B"),
        ("ex:r2", SH + "order", "5", "literal", XSD + "decimal", None),
        *_triple_rule("ex:r1", SH + "this", T, "ex:A"),
        ("ex:r1", SH + "order", "-1", "literal", XSD + "decimal", None),
    )
    rules = parse_rules(rows)
    assert [r.order for r in rules] == [-1.0, 5.0]
    assert all(isinstance(r, Rule) and r.kind == "triple" for r in rules)

    with pytest.raises(ValueError, match="sh:subject"):
        parse_rules(
            _shape_rows(
                *_rule("ex:bad", (T, SH + "TripleRule", "iri", None, None))
            )
        )
    with pytest.raises(ValueError, match="neither"):
        parse_rules(
            _shape_rows(*_rule("ex:bad", (SH + "order", "1", "literal", None, None)))
        )


def test_infer_returns_expanded_graph(spark):
    shapes = _shape_rows(*_triple_rule("ex:r", SH + "this", T, "ex:Human"))
    data = triples_from_rows(spark, DATA)
    out = infer(data, shapes)
    assert out.count() == len(DATA) + 2
    # idempotent: inferring over the expanded graph adds nothing
    assert infer_new(out, shapes).count() == 0


def test_cli_infer_flag(spark, tmp_path):
    """validate_graph --infer expands the data graph with sh:rule
    inferences before validating: a rule types every Person ex:Human,
    and a second shape requires Humans to carry ex:email — violations
    appear ONLY when inference ran."""
    import json
    import os
    import subprocess
    import sys as _sys

    shapes = _shape_rows(
        *_triple_rule("ex:r", SH + "this", T, "ex:Human"),
        ("ex:H", T, SH + "NodeShape", "iri", None, None),
        ("ex:H", SH + "targetClass", "ex:Human", "iri", None, None),
        ("ex:H", SH + "property", "ex:HP", "iri", None, None),
        ("ex:HP", SH + "path", "ex:email", "iri", None, None),
        ("ex:HP", SH + "minCount", "1", "literal", XSD + "integer", None),
    )
    d = tmp_path
    triples_from_rows(spark, DATA).write.parquet(str(d / "data"))
    triples_from_rows(spark, shapes).write.parquet(str(d / "shapes"))
    env = dict(os.environ, PYTHONPATH="/root/repo")

    def run(*extra):
        res = subprocess.run(
            [_sys.executable, "jobs/validate_graph.py",
             "--data", str(d / "data"), "--shapes", str(d / "shapes"),
             "--master", "local[4]", *extra],
            capture_output=True, text=True, env=env, cwd="/root/repo",
        )
        assert res.returncode == 0, res.stderr[-2000:]
        return json.loads(res.stdout.strip().splitlines()[-1])

    plain = run()
    assert plain["conforms"] is True  # no ex:Human targets yet

    inferred = run("--infer")
    assert inferred["conforms"] is False
    assert inferred["violations_by_component"]["MinCountConstraintComponent"] == 2
    assert inferred["inferred_triples"] == 2
    assert inferred["inference_rounds"] >= 1
