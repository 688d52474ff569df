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


def test_rules_from_turtle_shapes(spark, tmp_path):
    """sh:rule shapes authored in Turtle drive inference end-to-end:
    the Turtle parser's rows feed parse_rules/infer unchanged."""
    from shacl_spark.shacl.turtle import parse_turtle

    ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <ex:> .
    ex:S a sh:NodeShape ;
        sh:targetClass ex:Person ;
        sh:rule ex:r .
    ex:r a sh:TripleRule ;
        sh:subject sh:this ;
        sh:predicate ex:elder ;
        sh:object ex:pexpr ;
        sh:order 1 .
    ex:pexpr sh:path ex:parent .
    """
    shapes = parse_turtle(ttl)
    rules = parse_rules(shapes)
    assert len(rules) == 1 and rules[0].order == 1.0
    data = triples_from_rows(spark, DATA)
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in infer_new(data, shapes).collect()
    }
    assert got == {
        ("ex:alice", "ex:elder", "ex:bob"),
        ("ex:bob", "ex:elder", "ex:carol"),
    }


# --- property fuzzing (r05): random TripleRule sets vs naive fixpoint ---------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_F_SUBJECTS = [f"ex:n{i}" for i in range(5)]
_F_PREDS = ["ex:p0", "ex:p1", "ex:p2"]
_F_CLASSES = ["ex:C0", "ex:C1"]


@st.composite
def _f_data(draw):
    rows = []
    for s in _F_SUBJECTS:
        rows.append((s, T, draw(st.sampled_from(_F_CLASSES)), "iri", None, None))
        for p in _F_PREDS:
            for _ in range(draw(st.integers(0, 2))):
                o = draw(st.sampled_from(_F_SUBJECTS))
                rows.append((s, p, o, "iri", None, None))
    return sorted(set(rows))


@st.composite
def _f_rules(draw):
    """1-3 TripleRules on a shape targeting a random class: subject is
    always sh:this, predicate a constant, object sh:this / constant /
    a path over a data predicate — the full node-expression surface."""
    cls = draw(st.sampled_from(_F_CLASSES))
    rows = [
        ("ex:S", T, SH + "NodeShape", "iri", None, None),
        ("ex:S", SH + "targetClass", cls, "iri", None, None),
    ]
    n_rules = draw(st.integers(1, 3))
    specs = []
    for i in range(n_rules):
        r = f"ex:r{i}"
        pred = draw(st.sampled_from(_F_PREDS + ["ex:inferred"]))
        obj_kind = draw(st.sampled_from(["this", "const", "path"]))
        rows += [
            ("ex:S", SH + "rule", r, "iri", None, None),
            (r, T, SH + "TripleRule", "iri", None, None),
            (r, SH + "subject", SH + "this", "iri", None, None),
            (r, SH + "predicate", pred, "iri", None, None),
        ]
        if obj_kind == "this":
            rows.append((r, SH + "object", SH + "this", "iri", None, None))
            specs.append((pred, ("this",)))
        elif obj_kind == "const":
            const = draw(st.sampled_from(_F_SUBJECTS))
            rows.append((r, SH + "object", const, "iri", None, None))
            specs.append((pred, ("const", const)))
        else:
            hop = draw(st.sampled_from(_F_PREDS))
            rows += [
                (r, SH + "object", f"ex:e{i}", "iri", None, None),
                (f"ex:e{i}", SH + "path", hop, "iri", None, None),
            ]
            specs.append((pred, ("path", hop)))
    return cls, rows, specs


def _naive_fixpoint(data, cls, specs):
    """Driver recomputation of the round schedule: focus = instances of
    cls in the CURRENT graph, each rule adds (focus, pred, objexpr)."""
    triples = {(s, p, o) for (s, p, o, *_) in data}
    while True:
        focus = {s for (s, p, o) in triples if p == T and o == cls}
        new = set()
        for pred, spec in specs:
            for f in focus:
                if spec[0] == "this":
                    new.add((f, pred, f))
                elif spec[0] == "const":
                    new.add((f, pred, spec[1]))
                else:
                    for s, p, o in triples:
                        if s == f and p == spec[1]:
                            new.add((f, pred, o))
        if new <= triples:
            return triples
        triples |= new


@settings(
    max_examples=int(__import__("os").environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "10")),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(data=_f_data(), rules=_f_rules())
def test_random_triple_rules_match_naive_fixpoint(spark_session, data, rules):
    cls, shape_rows, specs = rules
    out = infer(triples_from_rows(spark_session, [r[:3] for r in data]), shape_rows)
    got = {(r["subj"], r["pred"], r["obj"]) for r in out.collect()}
    want = _naive_fixpoint(data, cls, specs)
    assert got == want, f"\nengine-only: {sorted(got - want)}\nnaive-only: {sorted(want - got)}"


@pytest.fixture(scope="module")
def spark_session(spark):
    return spark


def test_cli_infer_out_persists_expanded_graph(spark, tmp_path):
    import json
    import os
    import subprocess
    import sys as _sys

    shapes = _shape_rows(*_triple_rule("ex:r", SH + "this", T, "ex:Human"))
    d = tmp_path
    triples_from_rows(spark, DATA).write.parquet(str(d / "data"))
    triples_from_rows(spark, shapes).write.parquet(str(d / "shapes"))
    env = dict(os.environ, PYTHONPATH="/root/repo")
    res = subprocess.run(
        [_sys.executable, "jobs/validate_graph.py",
         "--data", str(d / "data"), "--shapes", str(d / "shapes"),
         "--infer", "--infer-out", str(d / "expanded"),
         "--master", "local[4]"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert json.loads(res.stdout.strip().splitlines()[-1])["inferred_triples"] == 2
    out = spark.read.parquet(str(d / "expanded"))
    assert out.count() == len(DATA) + 2
