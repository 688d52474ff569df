"""JSON-LD-lines reader (VERDICT r04 missing #3): term-form coverage
(VARIANT exact typing), context expansion, array values, value objects,
bnode subjects, malformed-line policy, N-Triples cross-format
round-trip, and the 100 TB plan properties (shuffle-free, zero Python
stages)."""

from __future__ import annotations

from pyspark.sql import functions as F

from shacl_spark.functions.terms import RDF, XSD
from shacl_spark.sources.jsonld import read_jsonld_lines
from shacl_spark.sources.ntriples import read_ntriples, write_ntriples

E = "http://ex.org/"
LS = RDF + "langString"

LINES = "\n".join(
    [
        # scalars with exact JSON typing + node ref + value objects + arrays
        '{"@id":"ex:a","@type":"ex:Person","ex:name":"Alice","ex:age":30,'
        '"ex:score":1.5,"ex:active":true,"ex:knows":{"@id":"ex:b"},'
        '"ex:label":{"@value":"chef","@language":"EN"},'
        '"ex:level":{"@value":"7","@type":"ex:Rank"},'
        '"ex:tag":["x","y"],"ex:n":[1,2]}',
        # term-mapped key + @type array + bnode object
        '{"@id":"ex:b","@type":["ex:Person","ex:Admin"],"name":"Bob",'
        '"ex:ref":{"@id":"_:x"}}',
        # no @id -> deterministic hash bnode subject
        '{"ex:name":"anon"}',
        # dropped element kinds: JSON null, nested node object sans @id
        '{"@id":"ex:c","ex:bad":null,"ex:nested":{"ex:deep":1}}',
    ]
)

CTX = {"ex": E, "name": E + "name"}


def _write(tmp_path, text, name="g.jsonl"):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_term_forms_and_context(spark, tmp_path):
    df = read_jsonld_lines(spark, _write(tmp_path, LINES), context=CTX)
    rows = {tuple(r) for r in df.collect()}
    T = RDF + "type"
    assert (E + "a", T, E + "Person", "iri", None, None) in rows
    assert (E + "a", E + "name", "Alice", "literal", XSD + "string", None) in rows
    assert (E + "a", E + "age", "30", "literal", XSD + "integer", None) in rows
    assert (E + "a", E + "score", "1.5", "literal", XSD + "double", None) in rows
    assert (E + "a", E + "active", "true", "literal", XSD + "boolean", None) in rows
    assert (E + "a", E + "knows", E + "b", "iri", None, None) in rows
    # value objects: language tag lowercased; @type dt expanded
    assert (E + "a", E + "label", "chef", "literal", LS, "en") in rows
    assert (E + "a", E + "level", "7", "literal", E + "Rank", None) in rows
    # arrays explode to one triple per element
    assert (E + "a", E + "tag", "x", "literal", XSD + "string", None) in rows
    assert (E + "a", E + "tag", "y", "literal", XSD + "string", None) in rows
    assert (E + "a", E + "n", "1", "literal", XSD + "integer", None) in rows
    assert (E + "a", E + "n", "2", "literal", XSD + "integer", None) in rows
    # @type array + term-mapped bare key + bnode object
    assert (E + "b", T, E + "Person", "iri", None, None) in rows
    assert (E + "b", T, E + "Admin", "iri", None, None) in rows
    assert (E + "b", E + "name", "Bob", "literal", XSD + "string", None) in rows
    assert (E + "b", E + "ref", "_:x", "bnode", None, None) in rows
    # anonymous line -> deterministic hash bnode
    anon = [r for r in rows if r[2] == "anon"]
    assert len(anon) == 1 and anon[0][0].startswith("_:j")
    # null + @id-less nested object are dropped
    assert not [r for r in rows if r[0] == E + "c"]
    assert len(rows) == 17


def test_anon_bnode_deterministic(spark, tmp_path):
    p = _write(tmp_path, '{"ex:name":"anon"}', "one.jsonl")
    a = read_jsonld_lines(spark, p, context=CTX).collect()[0]["subj"]
    b = read_jsonld_lines(spark, p, context=CTX).collect()[0]["subj"]
    assert a == b


def test_malformed_policy(spark, tmp_path):
    text = '{"@id":"ex:a","ex:p":1}\nnot json\n{"@id":"ex:b","ex:p":2}'
    p = _write(tmp_path, text)
    assert read_jsonld_lines(spark, p).count() == 2  # drop (default)
    kept = read_jsonld_lines(spark, p, bad_lines="keep")
    bad = kept.where(F.col("_malformed").isNotNull()).collect()
    assert [r["_malformed"] for r in bad] == ["not json"]
    assert all(r["subj"] is None for r in bad)
    assert kept.where(F.col("_malformed").isNull()).count() == 2


def test_ntriples_cross_format_roundtrip(spark, tmp_path):
    """jsonld → triples → write_ntriples → read_ntriples must be the
    identity on the triple set (interchange normal forms agree)."""
    df = read_jsonld_lines(spark, _write(tmp_path, LINES), context=CTX)
    out = str(tmp_path / "nt")
    write_ntriples(df, out)
    back = {tuple(r) for r in read_ntriples(spark, out + "/*.txt").collect()}
    assert back == {tuple(r) for r in df.collect()}


def test_plan_is_distributed(spark, tmp_path):
    """100 TB posture: text scan → variant parse → two Generates → one
    projection; zero Exchange, zero Python stages."""
    df = read_jsonld_lines(spark, _write(tmp_path, LINES), context=CTX)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, "JSON-LD parse must stay shuffle-free"
    assert "EvalPython" not in plan, "JSON-LD parse must stay JVM-side"


def test_validate_from_jsonld(spark, tmp_path):
    """End-to-end: a .jsonl data graph through the SHACL engine."""
    from shacl_spark.shacl import validate
    from shacl_spark.shacl.turtle import parse_turtle

    shapes = parse_turtle(
        """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://ex.org/> .
ex:S a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] ;
  sh:property [ sh:path ex:age ; sh:datatype ex:never ] .
"""
    )
    df = read_jsonld_lines(spark, _write(tmp_path, LINES), context=CTX)
    rows = validate(spark, df, shapes).collect()
    comps = {(r["focus"], r["component"].rsplit("#", 1)[-1]) for r in rows}
    # ex:a has a name but a wrongly-typed age; ex:b (Person via @type
    # array) has a name, no age
    assert (E + "a", "DatatypeConstraintComponent") in comps
    assert (E + "b", "MinCountConstraintComponent") not in comps
    assert len([c for c in comps if c[1] == "DatatypeConstraintComponent"]) == 1


def test_value_object_native_typing(spark, tmp_path):
    """ADVICE r05 (low): {"@value": 5} with no @type/@language derives
    its datatype from the NATIVE @value typing — consistent with bare
    5 → xsd:integer (JSON-LD semantics; 'VARIANT preserves exact JSON
    typing' contract)."""
    lines = (
        '{"@id":"ex:v","ex:i":{"@value":5},"ex:d":{"@value":1.25},'
        '"ex:b":{"@value":false},"ex:s":{"@value":"five"}}'
    )
    p = tmp_path / "v.jsonl"
    p.write_text(lines)
    df = read_jsonld_lines(spark, str(p), context=CTX)
    rows = {tuple(r) for r in df.collect()}
    assert (E + "v", E + "i", "5", "literal", XSD + "integer", None) in rows
    assert (E + "v", E + "d", "1.25", "literal", XSD + "double", None) in rows
    assert (E + "v", E + "b", "false", "literal", XSD + "boolean", None) in rows
    assert (E + "v", E + "s", "five", "literal", XSD + "string", None) in rows
