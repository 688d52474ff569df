"""Turtle subset parser: token/term coverage + shapes-graph round-trip
(a .ttl shapes file validates identically to its triple-row twin)."""

from __future__ import annotations

import pytest

from shacl_spark.functions.terms import RDF, SH, XSD, triples_from_rows
from shacl_spark.shacl import validate
from shacl_spark.shacl.turtle import parse_turtle

T = RDF + "type"

SHAPES_TTL = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix ex: <http://ex.org/> .

ex:PersonShape a sh:NodeShape ;
    sh:targetClass ex:Person ;
    sh:property [
        sh:path ex:name ;
        sh:minCount 1 ;
        sh:datatype xsd:string ;
    ] ;
    sh:property [
        sh:path ex:dept ;
        sh:in ( "eng" "sales" ) ;
    ] .
"""

DATA_TTL = """
@prefix ex: <http://ex.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

ex:alice a ex:Person ;
    ex:name "Alice" ;
    ex:dept "eng" .

ex:bob a ex:Person ;
    ex:dept "legal" .

ex:carol a ex:Person ;
    ex:name 42 ;
    ex:dept "sales" .
"""

EX = "http://ex.org/"


def test_term_forms():
    rows = parse_turtle(
        """
@prefix ex: <http://ex.org/> .
ex:s ex:str "hi" ; ex:lang "bonjour"@FR ; ex:typed "5"^^ex:dt ;
     ex:int 7 ; ex:dec 1.5 ; ex:dbl 2e3 ; ex:bool true ;
     ex:iri <http://other/x> ; ex:esc "a\\nb\\u0041" .
"""
    )
    d = {r[1]: r for r in rows}
    assert d[EX + "str"][2:] == ("hi", "literal", XSD + "string", None)
    assert d[EX + "lang"][2:] == ("bonjour", "literal", RDF + "langString", "fr")
    assert d[EX + "typed"][2:] == ("5", "literal", EX + "dt", None)
    assert d[EX + "int"][4] == XSD + "integer"
    assert d[EX + "dec"][4] == XSD + "decimal"
    assert d[EX + "dbl"][4] == XSD + "double"
    assert d[EX + "bool"][2] == "true"
    assert d[EX + "iri"][2:4] == ("http://other/x", "iri")
    assert d[EX + "esc"][2] == "a\nb\x41"


def test_collections_and_anon_bnodes():
    rows = parse_turtle(
        """
@prefix ex: <http://ex.org/> .
ex:s ex:list ( ex:a "x" 3 ) ; ex:empty () ; ex:anon [ ex:p ex:q ] .
"""
    )
    by_pred = {}
    for r in rows:
        by_pred.setdefault(r[1], []).append(r)
    # list: 3 first + 3 rest
    firsts = by_pred[RDF + "first"]
    assert [f[2] for f in firsts] == [EX + "a", "x", "3"]
    rests = by_pred[RDF + "rest"]
    assert rests[-1][2] == RDF + "nil"
    assert by_pred[EX + "empty"][0][2] == RDF + "nil"
    anon = by_pred[EX + "anon"][0]
    assert anon[3] == "bnode"
    assert any(r[0] == anon[2] and r[1] == EX + "p" for r in rows)


def test_labelled_bnode_and_base():
    rows = parse_turtle(
        """
@base <http://base/> .
@prefix ex: <rel/> .
_:b1 ex:p <x> .
"""
    )
    assert rows[0] == ("_:b1", "http://base/rel/p", "http://base/x", "iri", None, None)


def test_terminator_without_space():
    """PN_LOCAL may contain but not END with a dot — 'ex:Person.' must
    tokenize as the pname + the statement terminator (ADVICE r02
    turtle.py:45; very common real-world Turtle)."""
    rows = parse_turtle(
        """
@prefix ex: <http://ex.org/> .
ex:alice a ex:Person.
ex:b.c ex:p ex:v.w.
ex:s ex:q _:b1.
"""
    )
    triples = {(r[0], r[1], r[2]) for r in rows}
    assert (EX + "alice", T, EX + "Person") in triples
    # interior dots stay part of the local name
    assert (EX + "b.c", EX + "p", EX + "v.w") in triples
    # a bnode label can't end in '.' either
    assert (EX + "s", EX + "q", "_:b1") in triples


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_turtle("ex:s ex:p ex:o .")  # undeclared prefix
    with pytest.raises(ValueError):
        parse_turtle("@prefix ex: <http://e/> . ex:s ex:p ")  # truncated


def test_shapes_roundtrip_validation(spark):
    """The .ttl shapes graph validates the .ttl data identically to a
    hand-encoded triple-row twin of the same shapes."""
    shapes_ttl = parse_turtle(SHAPES_TTL)
    data = parse_turtle(DATA_TTL)
    INT = XSD + "integer"
    STR = XSD + "string"
    twin = [
        (EX + "PersonShape", T, SH + "NodeShape"),
        (EX + "PersonShape", SH + "targetClass", EX + "Person"),
        (EX + "PersonShape", SH + "property", "s:p1"),
        ("s:p1", SH + "path", EX + "name"),
        ("s:p1", SH + "minCount", "1", "literal", INT),
        ("s:p1", SH + "datatype", STR),
        (EX + "PersonShape", SH + "property", "s:p2"),
        ("s:p2", SH + "path", EX + "dept"),
        ("s:p2", SH + "in", "s:l0"),
        ("s:l0", RDF + "first", "eng", "literal", STR),
        ("s:l0", RDF + "rest", "s:l1"),
        ("s:l1", RDF + "first", "sales", "literal", STR),
        ("s:l1", RDF + "rest", RDF + "nil"),
    ]
    data_df = triples_from_rows(spark, data)
    rep_ttl = {
        (r["focus"], r["value"], r["component"])
        for r in validate(spark, data_df, shapes_ttl).collect()
    }
    rep_twin = {
        (r["focus"], r["value"], r["component"])
        for r in validate(spark, data_df, twin).collect()
    }
    assert rep_ttl == rep_twin
    assert rep_ttl == {
        (EX + "bob", None, SH + "MinCountConstraintComponent"),
        (EX + "bob", "legal", SH + "InConstraintComponent"),
        (EX + "carol", "42", SH + "DatatypeConstraintComponent"),
    }


# --- hypothesis round-trip (r04, VERDICT r03 next-round #8) -------------------
# Generate random graphs as ground-truth rows PLUS a Turtle rendering
# exercising the sugar surface (pnames vs full IRIs, predicate/object
# lists, 'a', labelled bnodes, numeric/boolean literal sugar, language
# tags, the five string escapes, unicode); parsing the rendering must
# reproduce the rows exactly (multiset equality — the battery covers
# curated anon-bnode/collection cases, whose fresh labels are not
# stable under round-trip by design).

from hypothesis import given, settings
from hypothesis import strategies as hst

_PFX = "http://ex.org/"
_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_XSD = "http://www.w3.org/2001/XMLSchema#"
_LANGSTR = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

_local = hst.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,6}", fullmatch=True)
_text = hst.text(
    alphabet=hst.sampled_from(
        list("abz09 AZ.,:;!?<>(){}#@/+-*='`~|%&^$") + ['"', "\\", "\n", "\r", "\t", "ä", "π", "中"]
    ),
    max_size=12,
)


def _esc(s: str) -> str:
    return (
        s.replace("\\", "\\\\").replace('"', '\\"')
        .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
    )


@hst.composite
def _iri(draw):
    name = draw(_local)
    return (
        f"ex:{name}" if draw(hst.booleans()) else f"<{_PFX}{name}>",
        _PFX + name,
    )


@hst.composite
def _object(draw):
    kind = draw(hst.sampled_from(["iri", "bnode", "str", "lang", "int", "dec", "bool", "typed"]))
    if kind == "iri":
        src, val = draw(_iri())
        return src, (val, "iri", None, None)
    if kind == "bnode":
        n = draw(hst.integers(0, 3))
        return f"_:b{n}", (f"_:b{n}", "bnode", None, None)
    if kind == "str":
        s = draw(_text)
        return f'"{_esc(s)}"', (s, "literal", _XSD + "string", None)
    if kind == "lang":
        s = draw(_text)
        tag = draw(hst.from_regex(r"[a-zA-Z]{2}(-[a-zA-Z0-9]{1,4})?", fullmatch=True))
        return f'"{_esc(s)}"@{tag}', (s, "literal", _LANGSTR, tag.lower())
    if kind == "int":
        i = draw(hst.integers(-10**6, 10**6))
        return str(i), (str(i), "literal", _XSD + "integer", None)
    if kind == "dec":
        i, f = draw(hst.integers(-999, 999)), draw(hst.integers(0, 99))
        lex = f"{i}.{f}"
        return lex, (lex, "literal", _XSD + "decimal", None)
    if kind == "bool":
        b = draw(hst.booleans())
        return str(b).lower(), (str(b).lower(), "literal", _XSD + "boolean", None)
    s = draw(_text)
    dt_src, dt_val = draw(_iri())
    return f'"{_esc(s)}"^^{dt_src}', (s, "literal", dt_val, None)


@hst.composite
def _doc(draw):
    rows, chunks = [], ["@prefix ex: <http://ex.org/> ."]
    for _ in range(draw(hst.integers(1, 4))):
        if draw(hst.booleans()):
            s_src, s_val = draw(_iri())
        else:
            n = draw(hst.integers(0, 3))
            s_src = s_val = f"_:s{n}"
        pred_parts = []
        for _ in range(draw(hst.integers(1, 3))):
            use_a = draw(hst.booleans())
            if use_a:
                p_src, p_val = "a", _RDF_TYPE
            else:
                p_src, p_val = draw(_iri())
            obj_parts = []
            for _ in range(draw(hst.integers(1, 3))):
                if use_a:
                    o_src, o_val = draw(_iri())
                    rows.append((s_val, p_val, o_val, "iri", None, None))
                    obj_parts.append(o_src)
                else:
                    o_src, o_tuple = draw(_object())
                    rows.append((s_val, p_val) + o_tuple)
                    obj_parts.append(o_src)
            pred_parts.append(f"{p_src} " + " , ".join(obj_parts))
        chunks.append(f"{s_src} " + " ;\n  ".join(pred_parts) + " .")
    return "\n".join(chunks), rows


@settings(max_examples=150, deadline=None)
@given(_doc())
def test_hypothesis_roundtrip(doc_rows):
    from shacl_spark.shacl.turtle import parse_turtle

    doc, rows = doc_rows
    got = sorted(
        tuple("␀" if v is None else v for v in r) for r in parse_turtle(doc)
    )
    want = sorted(tuple("␀" if v is None else v for v in r) for r in rows)
    assert got == want, f"doc:\n{doc}"
