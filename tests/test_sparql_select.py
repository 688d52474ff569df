"""Standalone SPARQL SELECT surface (r05): sparql.translate_select /
sparql_select + jobs/query_graph.py.

Parity twin: shacl_spark.shacl.interp._sparql_solutions with
``focus=None`` — the same row-exact interpreter the incremental fast
path is pinned to, so both execution models answer every query here.
"""

from __future__ import annotations

import json

import pytest

from shacl_spark.functions.terms import XSD, triples_from_rows
from shacl_spark.shacl.interp import Store, Term, _sparql_solutions, tkey
from shacl_spark.shacl.sparql import parse_sparql, sparql_select

DATA = [
    ("ex:a", "rdf:type", "ex:Person"),
    ("ex:b", "rdf:type", "ex:Person"),
    ("ex:c", "rdf:type", "ex:Robot"),
    ("ex:a", "ex:name", "Alice", "literal", XSD + "string"),
    ("ex:b", "ex:name", "Bob", "literal", XSD + "string"),
    ("ex:b", "ex:name", "Bobby", "literal", XSD + "string"),
    ("ex:c", "ex:name", "C3PO", "literal", XSD + "string"),
    ("ex:a", "ex:worksFor", "ex:acme"),
    ("ex:a", "ex:knows", "ex:b"),
    ("ex:b", "ex:knows", "ex:c"),
    ("ex:a", "ex:age", "41", "literal", XSD + "integer"),
    ("ex:b", "ex:age", "nope", "literal", XSD + "integer"),
]

PFX = "PREFIX ex: <ex:> PREFIX rdf: <rdf:> "


def _engine_rows(spark, query: str) -> list[tuple]:
    df = sparql_select(triples_from_rows(spark, DATA), query)
    return sorted(
        tuple(r[c] for c in df.columns) for r in df.collect()
    ), df.columns


def _interp_rows(query: str, columns: list[str]) -> list[tuple]:
    q = parse_sparql(query, constraint=False)
    sols = _sparql_solutions(Store(DATA), q, None)
    if q.distinct:
        seen, uniq = set(), []
        for s in sols:
            k = tuple(tkey(s[v]) if v in s else None for v in q.select)
            if k not in seen:
                seen.add(k)
                uniq.append(s)
        sols = uniq
    out = []
    for s in sols:
        row = []
        for v in q.select:
            t = s.get(v)
            if t is None:
                row += [None, None, None, None]
            else:
                dt = t.dt
                lang = t.lang
                row += [t.value, t.kind, dt, lang]
        out.append(tuple(row))
    return sorted(out)


def _parity(spark, query: str):
    got, cols = _engine_rows(spark, query)
    want = _interp_rows(query, cols)
    assert got == want, f"engine={got}\ninterp={want}"
    return got


def test_basic_projection_parity(spark):
    rows = _parity(
        spark,
        PFX + "SELECT ?s ?n WHERE { ?s rdf:type ex:Person . ?s ex:name ?n }",
    )
    # bag semantics: ex:b has two names -> three rows total
    assert len(rows) == 3
    assert {r[0] for r in rows} == {"ex:a", "ex:b"}


def test_distinct_vs_bag(spark):
    bag, _ = _engine_rows(
        spark, PFX + "SELECT ?s WHERE { ?s ex:name ?n }"
    )
    assert len(bag) == 4  # ex:b contributes twice
    dset, _ = _engine_rows(
        spark, PFX + "SELECT DISTINCT ?s WHERE { ?s ex:name ?n }"
    )
    assert len(dset) == 3


def test_optional_unbound_columns(spark):
    rows = _parity(
        spark,
        PFX + "SELECT DISTINCT ?s ?org WHERE { ?s rdf:type ex:Person . "
        "OPTIONAL { ?s ex:worksFor ?org } }",
    )
    by_s = {r[0]: r[4] for r in rows}
    assert by_s == {"ex:a": "ex:acme", "ex:b": None}


def test_union_and_filter(spark):
    rows = _parity(
        spark,
        PFX + "SELECT DISTINCT ?s ?v WHERE { "
        "{ ?s ex:worksFor ?v } UNION { ?s ex:knows ?v } "
        "FILTER (?v != ex:c) }",
    )
    assert {(r[0], r[4]) for r in rows} == {("ex:a", "ex:acme"), ("ex:a", "ex:b")}


def test_aggregate_group_by_plain_var(spark):
    # GROUP BY without ?this — rejected in constraint mode, fine here
    rows = _parity(
        spark,
        PFX + "SELECT ?s (COUNT(?n) AS ?c) WHERE { ?s ex:name ?n } "
        "GROUP BY ?s HAVING (COUNT(?n) > 1)",
    )
    assert len(rows) == 1
    assert rows[0][0] == "ex:b" and rows[0][4] == "2"
    assert rows[0][6] == XSD + "integer"


def test_sum_skips_malformed(spark):
    rows = _parity(
        spark,
        PFX + "SELECT ?s (SUM(?a) AS ?t) WHERE { ?s ex:age ?a } GROUP BY ?s",
    )
    by_s = {r[0]: r[4] for r in rows}
    # ex:b's age 'nope' fails the cast; an all-error group leaves the
    # alias unbound (NULL), mirroring constraint-mode semantics
    assert by_s == {"ex:a": "41", "ex:b": None}


def test_exists_not_exists(spark):
    rows = _parity(
        spark,
        PFX + "SELECT DISTINCT ?s WHERE { ?s rdf:type ex:Person . "
        "FILTER NOT EXISTS { ?s ex:worksFor ?o } }",
    )
    assert [r[0] for r in rows] == ["ex:b"]


def test_order_by_limit(spark):
    df = sparql_select(
        triples_from_rows(spark, DATA),
        PFX + "SELECT DISTINCT ?s ?n WHERE { ?s ex:name ?n } "
        "ORDER BY DESC(?n) LIMIT 3",
    )
    rows = [(r["s"], r["n"]) for r in df.collect()]
    # lexical DESC over the four names, top 3
    assert rows == [("ex:c", "C3PO"), ("ex:b", "Bobby"), ("ex:b", "Bob")]


def test_order_by_numeric_before_lexical(spark):
    df = sparql_select(
        triples_from_rows(spark, DATA),
        PFX + "SELECT ?s ?a WHERE { ?s ex:age ?a } ORDER BY ?a",
    )
    rows = [(r["s"], r["a"]) for r in df.collect()]
    # numeric-castable '41' sorts before non-numeric 'nope'
    assert rows == [("ex:a", "41"), ("ex:b", "nope")]


def test_order_by_desc_unbound_last(spark):
    """ADVICE r05 (medium): under DESC the unbound/non-numeric tier
    flags must stay ascending — unbound rows sort LAST and numerics
    still come before non-numerics."""
    rows_data = DATA + [("ex:d", "rdf:type", "ex:Person")]
    df = sparql_select(
        triples_from_rows(spark, rows_data),
        PFX + "SELECT ?s ?a WHERE { ?s rdf:type ex:Person . "
        "OPTIONAL { ?s ex:age ?a } } ORDER BY DESC(?a)",
    )
    rows = [(r["s"], r["a"]) for r in df.collect()]
    assert rows == [("ex:a", "41"), ("ex:b", "nope"), ("ex:d", None)], rows


def test_order_by_unselected_var_raises(spark):
    with pytest.raises(ValueError, match="ORDER BY references"):
        sparql_select(
            triples_from_rows(spark, DATA),
            PFX + "SELECT ?s WHERE { ?s ex:name ?n } ORDER BY ?n",
        )


def test_select_unbound_var_raises(spark):
    with pytest.raises(ValueError, match="unbound"):
        sparql_select(
            triples_from_rows(spark, DATA),
            PFX + "SELECT ?s ?ghost WHERE { ?s ex:name ?n }",
        )


def test_constraint_mode_still_requires_this_in_group_by():
    with pytest.raises(ValueError, match="GROUP BY must include"):
        parse_sparql(
            PFX + "SELECT ?s (COUNT(?n) AS ?c) WHERE { ?s ex:name ?n } "
            "GROUP BY ?s"
        )


# --- VALUES / MINUS (r05) -------------------------------------------------------


def test_values_single_var(spark):
    rows = _parity(
        spark,
        PFX + "SELECT ?s ?n WHERE { VALUES ?s { ex:a ex:c } ?s ex:name ?n }",
    )
    assert {(r[0], r[4]) for r in rows} == {("ex:a", "Alice"), ("ex:c", "C3PO")}


def test_values_multi_var_undef(spark):
    rows = _parity(
        spark,
        PFX + "SELECT ?s ?n WHERE { ?s ex:name ?n . "
        'VALUES (?s ?n) { (ex:b UNDEF) (UNDEF "Alice") } }',
    )
    assert sorted((r[0], r[4]) for r in rows) == [
        ("ex:a", "Alice"),
        ("ex:b", "Bob"),
        ("ex:b", "Bobby"),
    ]


def test_values_fills_unbound_optional_var(spark):
    # join compatibility: ex:b's ?org is unbound after the OPTIONAL, so
    # the VALUES binding fills it; ex:a's bound ex:acme matches and is kept
    rows = _parity(
        spark,
        PFX + "SELECT ?s ?org WHERE { ?s rdf:type ex:Person . "
        "OPTIONAL { ?s ex:worksFor ?org } VALUES ?org { ex:acme } }",
    )
    assert {(r[0], r[4]) for r in rows} == {
        ("ex:a", "ex:acme"),
        ("ex:b", "ex:acme"),
    }


def test_values_nonmatching_row_drops_solution(spark):
    rows = _parity(
        spark,
        PFX + 'SELECT ?s ?n WHERE { ?s ex:name ?n . VALUES ?n { "Ghost" } }',
    )
    assert rows == []


def test_minus_basic(spark):
    rows = _parity(
        spark,
        PFX + "SELECT DISTINCT ?s WHERE { ?s rdf:type ex:Person . "
        "MINUS { ?s ex:worksFor ?o } }",
    )
    assert [r[0] for r in rows] == ["ex:b"]


def test_minus_disjoint_domain_removes_nothing(spark):
    # the spec's MINUS-vs-NOT-EXISTS distinction: the group matches but
    # shares no variable, so MINUS removes nothing (NOT EXISTS with the
    # same group would empty the result)
    minus_rows = _parity(
        spark,
        PFX + "SELECT DISTINCT ?s WHERE { ?s rdf:type ex:Person . "
        "MINUS { ?x ex:worksFor ?y } }",
    )
    assert len(minus_rows) == 2
    ne_rows, _ = _engine_rows(
        spark,
        PFX + "SELECT DISTINCT ?s WHERE { ?s rdf:type ex:Person . "
        "FILTER NOT EXISTS { ?x ex:worksFor ?y } }",
    )
    assert ne_rows == []


def test_values_minus_rejected_in_constraint_mode():
    with pytest.raises(ValueError, match="VALUES is unsupported"):
        parse_sparql(
            PFX + "SELECT ?this WHERE { VALUES ?this { ex:a } }"
        )
    with pytest.raises(ValueError, match="MINUS is unsupported"):
        parse_sparql(
            PFX + "SELECT ?this WHERE { ?this ex:name ?n MINUS { ?this ex:p ?o } }"
        )


# --- CONSTRUCT / ASK (r05) ----------------------------------------------------


def _naive_construct(query: str) -> set[tuple]:
    """Reference instantiation: interp solutions x template patterns,
    SPARQL skip rules (unbound var / literal subject) applied."""
    from shacl_spark.shacl.sparql import Iri, Var

    q = parse_sparql(query, constraint=False)
    sols = _sparql_solutions(Store(DATA), q, None)
    out = set()
    for s in sols:
        for pat in q.template:
            def term(t):
                if isinstance(t, Var):
                    return s.get(t.name)
                if isinstance(t, Iri):
                    return Term(t.value, "iri")
                return Term(t.value, "literal", t.dt, t.lang)

            st, ot = term(pat.s), term(pat.o)
            if st is None or ot is None or st.kind == "literal":
                continue
            out.add((st.value, pat.p, ot.value, ot.kind, ot.dt, ot.lang))
    return out


def _engine_construct(spark, query: str) -> set[tuple]:
    from shacl_spark.shacl.sparql import sparql_query

    df = sparql_query(triples_from_rows(spark, DATA), query)
    assert df.columns == ["subj", "pred", "obj", "obj_kind", "obj_dt", "obj_lang"]
    return {tuple(r) for r in df.collect()}


def test_construct_basic_parity(spark):
    q = (
        PFX + "CONSTRUCT { ?s ex:label ?n . ?s a ex:Named } "
        "WHERE { ?s ex:name ?n }"
    )
    got = _engine_construct(spark, q)
    assert got == _naive_construct(q)
    # 4 distinct (s, n) label triples + 3 distinct type triples
    assert len([t for t in got if t[1] == "ex:label"]) == 4
    # template `a` expands to the full rdf:type IRI per SPARQL, not
    # this fixture's shorthand "rdf:type" prefix string
    from shacl_spark.functions.terms import RDF_TYPE

    assert len([t for t in got if t[1] == RDF_TYPE]) == 3
    assert len(got) == 7


def test_construct_const_object_literal(spark):
    q = PFX + 'CONSTRUCT { ?s ex:tag "hot" } WHERE { ?s ex:worksFor ?o }'
    got = _engine_construct(spark, q)
    assert got == _naive_construct(q)
    assert got == {("ex:a", "ex:tag", "hot", "literal", XSD + "string", None)}


def test_construct_skips_unbound_optional(spark):
    q = (
        PFX + "CONSTRUCT { ?s ex:employer ?org } WHERE { "
        "?s rdf:type ex:Person . OPTIONAL { ?s ex:worksFor ?org } }"
    )
    got = _engine_construct(spark, q)
    assert got == _naive_construct(q)
    # ex:b's solution has ?org unbound -> its instantiation is skipped
    assert got == {("ex:a", "ex:employer", "ex:acme", "iri", None, None)}


def test_construct_literal_subject_binding_skipped(spark):
    # ?n binds to literals; a literal subject is invalid RDF -> empty graph
    q = PFX + "CONSTRUCT { ?n ex:nameOf ?s } WHERE { ?s ex:name ?n }"
    got = _engine_construct(spark, q)
    assert got == _naive_construct(q) == set()


def test_construct_literal_subject_template_rejected():
    with pytest.raises(ValueError, match="literal subject"):
        parse_sparql(
            PFX + 'CONSTRUCT { "x" ex:p ?s } WHERE { ?s ex:name ?n }',
            constraint=False,
        )


def test_construct_statically_unbound_var_raises(spark):
    from shacl_spark.shacl.sparql import sparql_query

    with pytest.raises(ValueError, match="unbound"):
        sparql_query(
            triples_from_rows(spark, DATA),
            PFX + "CONSTRUCT { ?s ex:p ?ghost } WHERE { ?s ex:name ?n }",
        )


def test_construct_modifiers_rejected():
    with pytest.raises(ValueError, match="solution modifiers"):
        parse_sparql(
            PFX + "CONSTRUCT { ?s ex:p ?n } WHERE { ?s ex:name ?n } LIMIT 1",
            constraint=False,
        )


def test_ask_true_false(spark):
    from shacl_spark.shacl.sparql import sparql_query

    t = triples_from_rows(spark, DATA)
    df = sparql_query(t, PFX + "ASK { ?s rdf:type ex:Robot }")
    assert df.columns == ["ask"]
    assert [r["ask"] for r in df.collect()] == [True]
    df = sparql_query(t, PFX + "ASK WHERE { ?s rdf:type ex:Unicorn }")
    assert [r["ask"] for r in df.collect()] == [False]


def test_ask_with_filter(spark):
    from shacl_spark.shacl.sparql import sparql_query

    t = triples_from_rows(spark, DATA)
    df = sparql_query(
        t, PFX + 'ASK { ?s ex:name ?n FILTER (?n = "Bobby") }'
    )
    assert [r["ask"] for r in df.collect()] == [True]


def test_constraint_mode_rejects_construct():
    with pytest.raises(ValueError):
        parse_sparql(PFX + "CONSTRUCT { ?s ex:p ?n } WHERE { ?s ex:name ?n }")


def test_query_graph_cli(spark, tmp_path, capsys):
    import sys

    sys.modules.pop("jobs.query_graph", None)
    nt = tmp_path / "g.nt"
    nt.write_text(
        "<ex:a> <ex:p> <ex:b> .\n"
        '<ex:a> <ex:name> "Alice" .\n'
        "<ex:b> <ex:p> <ex:c> .\n"
    )
    from jobs.query_graph import main

    out = tmp_path / "res"
    rc = main(
        [
            "--data", str(nt),
            "--query", "SELECT ?x ?y WHERE { ?x <ex:p> ?y }",
            "--out", str(out),
        ]
    )
    assert rc == 0
    res = spark.read.parquet(str(out))
    assert sorted((r["x"], r["y"]) for r in res.collect()) == [
        ("ex:a", "ex:b"),
        ("ex:b", "ex:c"),
    ]
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows"] == 2


# --- MIN / MAX / AVG / GROUP_CONCAT (r05) ---------------------------------------


def test_min_max_full_term_parity(spark):
    rows = _parity(
        spark,
        PFX + "SELECT ?s (MIN(?n) AS ?lo) (MAX(?n) AS ?hi) "
        "WHERE { ?s ex:name ?n } GROUP BY ?s",
    )
    by_s = {r[0]: (r[4], r[8]) for r in rows}
    assert by_s["ex:b"] == ("Bob", "Bobby")
    assert by_s["ex:a"] == ("Alice", "Alice")


def test_avg_decimal_parity(spark):
    rows = _parity(
        spark,
        PFX + "SELECT ?s (AVG(?a) AS ?m) WHERE { ?s ex:age ?a } GROUP BY ?s",
    )
    by_s = {r[0]: (r[4], r[6]) for r in rows}
    # 'nope' fails the cast and is skipped; an all-error group leaves
    # the alias unbound
    assert by_s["ex:a"] == ("41.0", XSD + "decimal")
    assert by_s["ex:b"] == (None, None)


def test_group_concat_sorted_with_separator(spark):
    rows = _parity(
        spark,
        PFX + 'SELECT ?s (GROUP_CONCAT(?n; SEPARATOR=", ") AS ?names) '
        "WHERE { ?s ex:name ?n } GROUP BY ?s",
    )
    by_s = {r[0]: (r[4], r[6]) for r in rows}
    # DEFINED sorted lexical order (collect order is plan-dependent)
    assert by_s["ex:b"] == ("Bob, Bobby", XSD + "string")
    assert by_s["ex:a"][0] == "Alice"


def test_group_concat_default_separator(spark):
    rows = _parity(
        spark,
        PFX + "SELECT ?s (GROUP_CONCAT(?n) AS ?names) "
        "WHERE { ?s ex:name ?n } GROUP BY ?s",
    )
    assert {r[0]: r[4] for r in rows}["ex:b"] == "Bob Bobby"


def test_having_over_min_rejected(spark):
    with pytest.raises(ValueError, match="HAVING over MIN/MAX"):
        sparql_select(
            triples_from_rows(spark, DATA),
            PFX + "SELECT ?s (MIN(?n) AS ?lo) WHERE { ?s ex:name ?n } "
            "GROUP BY ?s HAVING (MIN(?n) > 1)",
        )


# --- DESCRIBE (r05) --------------------------------------------------------------


def _describe(spark, query: str) -> set:
    from shacl_spark.shacl.sparql import sparql_query

    df = sparql_query(triples_from_rows(spark, DATA), query)
    assert df.columns == ["subj", "pred", "obj", "obj_kind", "obj_dt", "obj_lang"]
    return {(r["subj"], r["pred"], r["obj"]) for r in df.collect()}


def test_describe_var_where(spark):
    got = _describe(
        spark, PFX + "DESCRIBE ?p WHERE { ?p rdf:type ex:Person }"
    )
    # the full subject slice of every described resource
    assert got == {
        (s, p, o) for (s, p, o, *_) in DATA if s in ("ex:a", "ex:b")
    }


def test_describe_constant_no_where(spark):
    got = _describe(spark, PFX + "DESCRIBE ex:c")
    assert got == {(s, p, o) for (s, p, o, *_) in DATA if s == "ex:c"}


def test_describe_mixed_targets(spark):
    got = _describe(
        spark, PFX + "DESCRIBE ?r ex:a WHERE { ?r rdf:type ex:Robot }"
    )
    assert {s for s, _, _ in got} == {"ex:a", "ex:c"}


def test_describe_literal_valued_var_ignored(spark):
    # names are literals — literals cannot be subjects, so nothing
    got = _describe(spark, PFX + "DESCRIBE ?n WHERE { ex:a ex:name ?n }")
    assert got == set()


def test_describe_unbound_var_raises(spark):
    from shacl_spark.shacl.sparql import sparql_query

    with pytest.raises(ValueError, match="DESCRIBE references"):
        sparql_query(
            triples_from_rows(spark, DATA),
            PFX + "DESCRIBE ?ghost WHERE { ?s ex:name ?n }",
        ).collect()


def test_describe_needs_target():
    with pytest.raises(ValueError, match="DESCRIBE needs"):
        parse_sparql(PFX + "DESCRIBE WHERE { ?s ex:name ?n }", constraint=False)


# --- subqueries (r05) -------------------------------------------------------------


def test_subquery_aggregate_join_parity(spark):
    """The canonical subquery shape: a grouped aggregate joined back to
    the outer solutions on the shared variable."""
    rows = _parity(
        spark,
        PFX + "SELECT ?s ?n ?deg WHERE { ?s ex:name ?n . "
        "{ SELECT ?s (COUNT(?o) AS ?deg) WHERE { ?s ex:knows ?o } "
        "GROUP BY ?s } }",
    )
    by_s = {(r[0], r[4], r[8]) for r in rows}
    # ex:a knows ex:b (1); ex:b (2 names) knows ex:c (1); ex:c has no
    # outgoing ex:knows -> no subquery row -> dropped by the join
    assert by_s == {
        ("ex:a", "Alice", "1"),
        ("ex:b", "Bob", "1"),
        ("ex:b", "Bobby", "1"),
    }


def test_subquery_distinct_projection_parity(spark):
    rows = _parity(
        spark,
        PFX + "SELECT ?s ?w WHERE { ?s ex:worksFor ?w . "
        "{ SELECT DISTINCT ?s WHERE { ?s ex:name ?n } } }",
    )
    assert [(r[0], r[4]) for r in rows] == [("ex:a", "ex:acme")]


def test_subquery_no_shared_vars_is_bag_cross(spark):
    rows = _parity(
        spark,
        PFX + "SELECT ?s ?c WHERE { ?s ex:worksFor ?o . "
        "{ SELECT ?k (COUNT(?x) AS ?c) WHERE { ?x rdf:type ?k } "
        "GROUP BY ?k } }",
    )
    # one worksFor solution x two type groups (Person:2, Robot:1)
    assert {(r[0], r[4]) for r in rows} == {("ex:a", "2"), ("ex:a", "1")}


def test_subquery_scopes_internal_vars_out(spark):
    from shacl_spark.shacl.sparql import sparql_select as _ss

    with pytest.raises(ValueError, match="unbound"):
        _ss(
            triples_from_rows(spark, DATA),
            PFX + "SELECT ?o WHERE { "
            "{ SELECT ?s WHERE { ?s ex:knows ?o } } }",
        )


def test_subquery_rejected_in_constraint_mode():
    with pytest.raises(ValueError, match="subqueries are unsupported"):
        parse_sparql(
            PFX + "SELECT ?this WHERE { ?this ex:name ?n . "
            "{ SELECT ?this (COUNT(?o) AS ?c) WHERE { ?this ex:knows ?o } "
            "GROUP BY ?this } }"
        )


def test_subquery_select_vars_need_group_by():
    with pytest.raises(ValueError, match="outside GROUP BY"):
        parse_sparql(
            PFX + "SELECT ?s WHERE { "
            "{ SELECT ?s ?o (COUNT(?x) AS ?c) WHERE { ?s ex:knows ?o . "
            "?o ex:knows ?x } GROUP BY ?s } }",
            constraint=False,
        )
