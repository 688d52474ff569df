"""RDF/XML reader (VERDICT r04 missing #3, second interchange entry):
subset term-form coverage (typed node elements, about/ID/nodeID,
nested nodes, parseType=Resource, property attributes, rdf:li
containers, datatype + inherited xml:lang), file-scoped blank-node
labels, bad-file policy, N-Triples cross-format equality, engine
end-to-end, and the scale shape (one Arrow stage, zero Exchange)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from shacl_spark.functions.terms import RDF, XSD
from shacl_spark.sources.ntriples import read_ntriples
from shacl_spark.sources.rdfxml import parse_rdfxml_document, read_rdfxml

E = "http://ex.org/"
LS = RDF + "langString"
T = RDF + "type"

DOC = f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{E}"
         xml:base="http://base.org/doc" xml:lang="DE">
  <ex:Person rdf:about="{E}a" ex:nick="Al">
    <ex:name xml:lang="en">Alice</ex:name>
    <ex:age rdf:datatype="{XSD}integer">30</ex:age>
    <ex:knows rdf:resource="{E}b"/>
    <ex:note>hallo</ex:note>
    <ex:addr rdf:parseType="Resource">
      <ex:city>Berlin</ex:city>
    </ex:addr>
    <ex:pet>
      <ex:Cat rdf:nodeID="felix"><ex:name>Felix</ex:name></ex:Cat>
    </ex:pet>
  </ex:Person>
  <rdf:Description rdf:ID="frag">
    <rdf:type rdf:resource="{E}Thing"/>
    <ex:rel rdf:nodeID="felix"/>
  </rdf:Description>
  <rdf:Description rdf:about="{E}seq">
    <rdf:li>first</rdf:li>
    <rdf:li>second</rdf:li>
  </rdf:Description>
  <rdf:Description rdf:about="relpath"><ex:k>v</ex:k></rdf:Description>
</rdf:RDF>
"""


def _rows(doc=DOC, fname="f.rdf"):
    return set(parse_rdfxml_document(doc, fname))


def test_term_forms():
    rows = _rows()
    assert (E + "a", T, E + "Person", "iri", None, None) in rows
    # property attribute → plain literal; xml:lang overrides inherited
    assert (E + "a", E + "nick", "Al", "literal", XSD + "string", None) in rows
    assert (E + "a", E + "name", "Alice", "literal", LS, "en") in rows
    assert (E + "a", E + "age", "30", "literal", XSD + "integer", None) in rows
    assert (E + "a", E + "knows", E + "b", "iri", None, None) in rows
    # root xml:lang="DE" inherited and lowercased
    assert (E + "a", E + "note", "hallo", "literal", LS, "de") in rows
    # rdf:ID resolves against xml:base; rdf:type attribute-element form
    assert ("http://base.org/doc#frag", T, E + "Thing", "iri", None, None) in rows
    # rdf:li numbering (root xml:lang="DE" inherits per spec §2.7)
    assert (E + "seq", RDF + "_1", "first", "literal", LS, "de") in rows
    assert (E + "seq", RDF + "_2", "second", "literal", LS, "de") in rows
    # relative rdf:about resolves against base directory
    assert ("http://base.org/relpath", E + "k", "v", "literal", LS, "de") in rows


def test_nested_and_parsetype_resource_bnodes():
    rows = _rows()
    addr = [r for r in rows if r[1] == E + "addr"]
    assert len(addr) == 1 and addr[0][3] == "bnode"
    b = addr[0][2]
    assert (b, E + "city", "Berlin", "literal", LS, "de") in rows
    # nested typed node element: labeled bnode shared between both uses
    pet = [r for r in rows if r[1] == E + "pet"][0]
    rel = [r for r in rows if r[1] == E + "rel"][0]
    assert pet[2] == rel[2] and pet[3] == "bnode"
    assert (pet[2], T, E + "Cat", "iri", None, None) in rows


def test_bnode_labels_are_file_scoped():
    a = _rows(fname="x.rdf")
    b = _rows(fname="y.rdf")
    la = {r[2] for r in a if r[1] == E + "rel"}
    lb = {r[2] for r in b if r[1] == E + "rel"}
    assert la and lb and la.isdisjoint(lb)


def test_unsupported_parsetype_raises():
    doc = (
        f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{E}">'
        f'<rdf:Description rdf:about="{E}a">'
        f'<ex:x rdf:parseType="Collection"/></rdf:Description></rdf:RDF>'
    )
    with pytest.raises(ValueError, match="parseType"):
        parse_rdfxml_document(doc, "f.rdf")


def _write_corpus(tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "good.rdf").write_text(DOC)
    (d / "bad.rdf").write_text("<rdf:RDF nope")
    return str(d)


def test_bad_file_policy(spark, tmp_path):
    d = _write_corpus(tmp_path)
    with pytest.raises(Exception, match="bad.rdf"):
        read_rdfxml(spark, d).collect()
    n_good = len(_rows())
    assert read_rdfxml(spark, d, on_bad_files="drop").count() == n_good
    kept = read_rdfxml(spark, d, on_bad_files="keep")
    bad = kept.where(F.col("_malformed").isNotNull()).collect()
    assert len(bad) == 1 and "bad.rdf" in bad[0]["_malformed"]
    assert kept.where(F.col("_malformed").isNull()).count() == n_good


def test_ntriples_cross_format_equality(spark, tmp_path):
    """The same bnode-free graph in both serializations reads to the
    exact same row multiset through both distributed readers."""
    nt = "\n".join(
        [
            f'<{E}a> <{T}> <{E}Person> .',
            f'<{E}a> <{E}name> "Alice"@en .',
            f'<{E}a> <{E}age> "30"^^<{XSD}integer> .',
            f'<{E}a> <{E}knows> <{E}b> .',
            f'<{E}a> <{E}note> "plain" .',
        ]
    )
    rdf = f"""<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{E}">
      <ex:Person rdf:about="{E}a">
        <ex:name xml:lang="en">Alice</ex:name>
        <ex:age rdf:datatype="{XSD}integer">30</ex:age>
        <ex:knows rdf:resource="{E}b"/>
        <ex:note>plain</ex:note>
      </ex:Person>
    </rdf:RDF>"""
    pn = tmp_path / "g.nt"
    pn.write_text(nt)
    pr = tmp_path / "g.rdf"
    pr.write_text(rdf)
    a = sorted(map(tuple, read_ntriples(spark, str(pn)).collect()))
    b = sorted(map(tuple, read_rdfxml(spark, str(pr)).collect()))
    assert a == b


def test_plan_shape(spark, tmp_path):
    d = tmp_path / "one"
    d.mkdir()
    (d / "g.rdf").write_text(DOC)
    plan = read_rdfxml(spark, str(d))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # file-parallel, shuffle-free
    assert plan.count("MapInPandas") == 1  # exactly one Arrow stage


def test_validate_from_rdfxml_cli(tmp_path):
    """End-to-end: .rdf data through the validation CLI."""
    import json as _json
    import os
    import subprocess
    import sys

    doc = f"""<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{E}">
      <ex:Person rdf:about="{E}ok"><ex:name>fine</ex:name></ex:Person>
      <ex:Person rdf:about="{E}bad"/>
    </rdf:RDF>"""
    p = tmp_path / "d.rdf"
    p.write_text(doc)
    shapes = tmp_path / "shapes.csv"
    SH = "http://www.w3.org/ns/shacl#"
    shapes.write_text(
        "subj,pred,obj,obj_kind\n"
        f"{E}PS,{T},{SH}NodeShape,iri\n"
        f"{E}PS,{SH}targetClass,{E}Person,iri\n"
        f"{E}PS,{SH}property,_:p,bnode\n"
        f"_:p,{SH}path,{E}name,iri\n"
        f"_:p,{SH}minCount,1,literal\n"
    )
    out = subprocess.run(
        [sys.executable, "jobs/validate_graph.py", "--data", str(p),
         "--shapes", str(shapes), "--master", "local[2]"],
        capture_output=True, text=True, cwd="/root/repo", check=True,
        env=dict(os.environ, PYTHONPATH="/root/repo"),
    )
    summary = _json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["conforms"] is False
    assert summary["violations_by_component"] == {"MinCountConstraintComponent": 1}
