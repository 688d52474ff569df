"""Distributed N-Triples reader: term-form coverage, Turtle round-trip
on the same content, malformed-line policy, and the 100 TB plan
properties (shuffle-free, zero Python stages) at a 1M-line file."""

from __future__ import annotations

import os

import pytest

from shacl_spark.functions.terms import RDF, XSD, triples_from_rows
from shacl_spark.shacl import validate
from shacl_spark.shacl.turtle import parse_turtle
from shacl_spark.sources.ntriples import read_ntriples

NT = """\
# a comment line

<http://ex.org/s> <http://ex.org/p> <http://ex.org/o> .
<http://ex.org/s> <http://ex.org/str> "hello" .
<http://ex.org/s> <http://ex.org/typed> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://ex.org/s> <http://ex.org/lang> "bonjour"@fr .
<http://ex.org/s> <http://ex.org/esc> "a\\"b\\\\c\\nd" .
_:b1 <http://ex.org/p> _:b2 .
"""


def _write(tmp_path, text, name="g.nt"):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_term_forms(spark, tmp_path):
    rows = {tuple(r) for r in read_ntriples(spark, _write(tmp_path, NT)).collect()}
    E = "http://ex.org/"
    LS = RDF + "langString"
    assert (E + "s", E + "p", E + "o", "iri", None, None) in rows
    assert (E + "s", E + "str", "hello", "literal", XSD + "string", None) in rows
    assert (E + "s", E + "typed", "5", "literal", XSD + "integer", None) in rows
    assert (E + "s", E + "lang", "bonjour", "literal", LS, "fr") in rows
    assert (E + "s", E + "esc", 'a"b\\c\nd', "literal", XSD + "string", None) in rows
    assert ("_:b1", E + "p", "_:b2", "bnode", None, None) in rows
    assert len(rows) == 6


def test_turtle_roundtrip(spark, tmp_path):
    """The same graph in Turtle (driver parser) and N-Triples
    (distributed reader) must yield identical triple sets."""
    ttl = """
@prefix ex: <http://ex.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
ex:s ex:p ex:o ; ex:n 5 ; ex:t "hi"@en-US ; ex:q "x\\ny" .
"""
    nt = """\
<http://ex.org/s> <http://ex.org/p> <http://ex.org/o> .
<http://ex.org/s> <http://ex.org/n> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://ex.org/s> <http://ex.org/t> "hi"@en-US .
<http://ex.org/s> <http://ex.org/q> "x\\ny" .
"""
    six = ["subj", "pred", "obj", "obj_kind", "obj_dt", "obj_lang"]
    from_ttl = {
        tuple(r) for r in triples_from_rows(spark, parse_turtle(ttl)).select(six).collect()
    }
    from_nt = {
        tuple(r) for r in read_ntriples(spark, _write(tmp_path, nt)).select(six).collect()
    }
    assert from_ttl == from_nt


def test_bad_lines_policy(spark, tmp_path):
    text = NT + "this is not a triple\n<http://ex.org/s> <http://ex.org/p2> <http://ex.org/o2> .\n"
    path = _write(tmp_path, text)
    dropped = read_ntriples(spark, path)
    assert dropped.count() == 7  # 6 good + 1 more, junk silently dropped
    kept = read_ntriples(spark, path, bad_lines="keep")
    bad = kept.where(kept["_malformed"].isNotNull()).collect()
    assert len(bad) == 1 and bad[0]["_malformed"] == "this is not a triple"
    # ADVICE r03: malformed rows must carry NULL triple columns, not
    # the '' that regexp_extract yields on a non-matching line
    assert all(bad[0][c] is None for c in
               ["subj", "pred", "obj", "obj_kind", "obj_dt", "obj_lang"])


def test_validate_over_nt(spark, tmp_path):
    """End-to-end: N-Triples file → triple frame → SHACL validate."""
    nt = """\
<ex:alice> <{T}> <ex:Person> .
<ex:bob> <{T}> <ex:Person> .
<ex:alice> <ex:name> "Alice" .
""".format(T=RDF + "type")
    data = read_ntriples(spark, _write(tmp_path, nt))
    shapes = [
        ("ex:S", RDF + "type", "http://www.w3.org/ns/shacl#NodeShape"),
        ("ex:S", "http://www.w3.org/ns/shacl#targetClass", "ex:Person"),
        ("ex:S", "http://www.w3.org/ns/shacl#property", "ex:SP"),
        ("ex:SP", "http://www.w3.org/ns/shacl#path", "ex:name"),
        ("ex:SP", "http://www.w3.org/ns/shacl#minCount", "1", "literal",
         XSD + "integer"),
    ]
    rep = validate(spark, data, shapes)
    assert [r["focus"] for r in rep.collect()] == ["ex:bob"]


def _render_nt(subj, pred, obj, kind, dt, lang) -> str:
    def esc(s):
        return (
            s.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
        )
    s = subj if subj.startswith("_:") else f"<{subj}>"
    if kind == "iri":
        o = f"<{obj}>"
    elif kind == "bnode":
        o = obj
    elif lang:
        o = f'"{esc(obj)}"@{lang}'
    elif dt and dt != XSD + "string":
        o = f'"{esc(obj)}"^^<{dt}>'
    else:
        o = f'"{esc(obj)}"'
    return f"{s} <{pred}> {o} ."


def test_property_roundtrip(spark, tmp_path):
    """Property-style round-trip: random terms rendered to N-Triples
    lines parse back to the exact term set (engine normal form)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    lex = st.text(
        alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
        min_size=0, max_size=20,
    )
    terms = st.one_of(
        st.tuples(st.just("iri"), st.from_regex(r"http://x/[a-z]{1,8}", fullmatch=True),
                  st.none(), st.none()),
        st.tuples(st.just("bnode"), st.from_regex(r"_:[a-z][a-z0-9]{0,6}", fullmatch=True),
                  st.none(), st.none()),
        st.tuples(st.just("literal"), lex, st.none(), st.none()),
        st.tuples(st.just("literal"), lex, st.just(XSD + "integer"), st.none()),
        st.tuples(st.just("literal"), lex, st.none(),
                  st.from_regex(r"[a-z]{2}(-[A-Z]{2})?", fullmatch=True)),
    )

    @settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
    @given(st.lists(terms, min_size=1, max_size=8, unique=True))
    def check(objs):
        rows, lines = [], []
        for i, (kind, val, dt, lang) in enumerate(objs):
            subj, pred = f"http://x/s{i}", f"http://x/p{i % 3}"
            lines.append(_render_nt(subj, pred, val, kind, dt, lang))
            if kind == "literal":
                norm_dt = RDF + "langString" if lang else (dt or XSD + "string")
                norm_lang = lang.lower() if lang else None
            else:
                norm_dt = norm_lang = None
            rows.append((subj, pred, val, kind, norm_dt, norm_lang))
        p = tmp_path / "prop.nt"
        p.write_text("\n".join(lines) + "\n")
        got = {tuple(r) for r in read_ntriples(spark, str(p)).collect()}
        assert got == set(rows)

    check()


def test_sparql_seam_errors(spark):
    """$PATH on a composite path and an anchor-less OPTIONAL raise
    clear errors instead of silently mis-translating."""
    import pytest as _pytest

    from shacl_spark.shacl.shapes import PropertyShape, SequencePath, PredicatePath
    from shacl_spark.shacl.sparql import parse_sparql, substitute_path, translate

    seq = PropertyShape(iri="ex:SP", path=SequencePath((PredicatePath("ex:a"), PredicatePath("ex:b"))))
    with _pytest.raises(ValueError, match="PATH"):
        substitute_path("SELECT ?this WHERE { $this $PATH ?v }", seq)

    from shacl_spark.functions.terms import triples_from_rows
    q = parse_sparql(
        "PREFIX ex: <ex:> SELECT ?this WHERE { ?this ex:p ?v . OPTIONAL { ?x ex:q ?y } }"
    )
    t = triples_from_rows(spark, [("ex:s", "ex:p", "ex:o")])
    focus = t.selectExpr("subj as node", "'iri' as kind",
                         "cast(null as string) as dt", "cast(null as string) as lang")
    with _pytest.raises(ValueError, match="OPTIONAL"):
        translate(q, focus, t)


def test_million_line_plan_and_count(spark):
    """1M-line NT ingest: the physical plan must be a narrow JVM-only
    projection — zero Exchange, zero Python stages — and row-exact."""
    d = "/dev/shm/nt_bench"
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "big.nt")
    if not os.path.exists(path):
        with open(path, "w") as f:
            for i in range(1_000_000):
                f.write(
                    f'<ex:s{i % 9973}> <ex:p{i % 7}> "v{i}"^^<http://www.w3.org/2001/XMLSchema#string> .\n'
                )
    df = read_ntriples(spark, path)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, "NT parse must stay shuffle-free"
    assert "EvalPython" not in plan, "NT parse must stay JVM-side"
    assert plan.lstrip().startswith("*("), "projection must be codegen'd"
    assert df.count() == 1_000_000
    # and it feeds grouped work without reparse weirdness
    assert df.groupBy("pred").count().count() == 7


def test_writer_roundtrip_exact(spark, tmp_path):
    """write_ntriples → read_ntriples must reproduce the input frame
    EXACTLY (engine normal form both ways), across IRIs, bnodes, plain /
    typed / language literals, and all five string escapes."""
    from shacl_spark.functions.terms import RDF, XSD
    from shacl_spark.sources.ntriples import read_ntriples, write_ntriples

    STR = XSD + "string"
    rows = [
        ("ex:s", "ex:p", "ex:o", "iri", None, None),
        ("_:b1", "ex:p", "_:b2", "bnode", None, None),
        ("ex:s", "ex:p", "plain", "literal", STR, None),
        ("ex:s", "ex:p", "42", "literal", XSD + "integer", None),
        ("ex:s", "ex:p", "bonjour", "literal", RDF + "langString", "fr"),
        ("ex:s", "ex:p", 'quo"te \\ back\nnew\ttab\rret', "literal", STR, None),
        ("ex:s", "ex:p", 'ends with backslash\\', "literal", STR, None),
        ("ex:s", "ex:p", "", "literal", STR, None),  # empty literal
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_kind string, obj_dt string, obj_lang string"
    )
    out = str(tmp_path / "out.nt")
    write_ntriples(df, out)
    back = read_ntriples(spark, out)
    canon = lambda d: sorted(  # noqa: E731
        tuple("␀" if v is None else v for v in r) for r in d.collect()
    )
    assert canon(back) == canon(df)
    # and every emitted line parses (no silent drops)
    assert back.count() == len(rows)


def test_report_nt_cli_flag(spark, tmp_path):
    """--report-nt writes a results graph any NT parser reads back to
    the same frame as report_to_triples."""
    import json
    import subprocess
    import sys as _sys

    from shacl_spark.functions.terms import RDF, SH, XSD, triples_from_rows
    from shacl_spark.shacl import validate
    from shacl_spark.shacl.report import report_to_triples
    from shacl_spark.sources.ntriples import read_ntriples

    T = RDF + "type"
    shapes = [
        ("ex:S", T, SH + "NodeShape"),
        ("ex:S", SH + "targetClass", "ex:P"),
        ("ex:S", SH + "property", "ex:SP"),
        ("ex:SP", SH + "path", "ex:name"),
        ("ex:SP", SH + "minCount", "1", "literal", XSD + "integer"),
    ]
    data = [("ex:a", T, "ex:P"), ("ex:b", T, "ex:P"),
            ("ex:b", "ex:name", "B", "literal", XSD + "string")]
    d = tmp_path
    triples_from_rows(spark, data).write.parquet(str(d / "data"))
    triples_from_rows(spark, shapes).write.parquet(str(d / "shapes"))
    env = dict(os.environ, PYTHONPATH="/root/repo")
    res = subprocess.run(
        [_sys.executable, "jobs/validate_graph.py", "--data", str(d / "data"),
         "--shapes", str(d / "shapes"), "--report-nt", str(d / "rep.nt"),
         "--master", "local[4]"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
    )
    line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    assert json.loads(line)["conforms"] is False
    back = read_ntriples(spark, str(d / "rep.nt"))
    expect = report_to_triples(
        validate(spark, triples_from_rows(spark, data), shapes)
    ).select("subj", "pred", "obj", "obj_kind", "obj_dt", "obj_lang")
    canon = lambda df: sorted(  # noqa: E731
        tuple("␀" if v is None else v for v in r) for r in df.collect()
    )
    assert canon(back) == canon(expect)


def test_writer_null_terms_fail_loudly(spark, tmp_path):
    """r04 review: a NULL mandatory term must error the write (not emit
    a shorter parseable-looking line the reader silently drops);
    on_null='drop' skips such rows explicitly."""
    import pytest as _pytest

    from shacl_spark.sources.ntriples import read_ntriples, write_ntriples

    rows = [("ex:s", "ex:p", "ex:o", "iri", None, None),
            (None, "ex:p", "ex:o", "iri", None, None)]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_kind string, obj_dt string, obj_lang string"
    )
    with _pytest.raises(Exception):
        write_ntriples(df, str(tmp_path / "bad.nt"))
    write_ntriples(df, str(tmp_path / "ok.nt"), on_null="drop")
    back = read_ntriples(spark, str(tmp_path / "ok.nt"))
    assert [tuple(r)[:3] for r in back.collect()] == [("ex:s", "ex:p", "ex:o")]


def test_writer_invalid_iri_fails_loudly(spark, tmp_path):
    """ADVICE r04: an IRI containing whitespace / '>' / control chars
    serializes to a line the reader would silently drop — the writer
    must poison it through the same on_null path as NULL terms."""
    import pytest as _pytest

    from shacl_spark.sources.ntriples import read_ntriples, write_ntriples

    schema = ("subj string, pred string, obj string, obj_kind string, "
              "obj_dt string, obj_lang string")
    bad_rows = [
        ("ex:has space", "ex:p", "ex:o", "iri", None, None),
        ("ex:s", "ex:p", "ex:o>injected", "iri", None, None),
        ("ex:s", "ex:br\noken", "ex:o", "iri", None, None),
        ("ex:s", "ex:p", "v", "literal", "ex:dt with space", None),
    ]
    for row in bad_rows:
        df = spark.createDataFrame([row], schema)
        with _pytest.raises(Exception):
            write_ntriples(df, str(tmp_path / "bad.nt"))

    mixed = spark.createDataFrame(
        [("ex:s", "ex:p", "ex:o", "iri", None, None)] + bad_rows, schema
    )
    write_ntriples(mixed, str(tmp_path / "ok.nt"), on_null="drop")
    back = read_ntriples(spark, str(tmp_path / "ok.nt"))
    assert [tuple(r)[:3] for r in back.collect()] == [("ex:s", "ex:p", "ex:o")]
    # bnode subjects and literals with odd CONTENT are fine (escaped)
    good = spark.createDataFrame(
        [("_:b0", "ex:p", 'line1\n"quoted"', "literal", None, None)], schema
    )
    write_ntriples(good, str(tmp_path / "g.nt"))
    gb = read_ntriples(spark, str(tmp_path / "g.nt")).collect()
    assert gb[0]["obj"] == 'line1\n"quoted"'
