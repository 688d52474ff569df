"""Distributed Turtle writer (sources/turtle_writer.py): exact
write→parse round-trip through the engine's own Turtle parser,
prefix-compression safety, header-part concatenation, NULL poisoning.
"""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from shacl_spark.functions.terms import RDF, XSD, triples_from_rows
from shacl_spark.shacl.turtle import parse_turtle
from shacl_spark.sources.turtle_writer import write_turtle

T = RDF + "type"
LS = RDF + "langString"

ROWS = [
    ("http://ex.org/a", T, "http://ex.org/Person"),
    ("http://ex.org/a", "http://ex.org/name", 'Al "q"\n\tice\\', "literal",
     XSD + "string"),
    ("http://ex.org/a", "http://ex.org/age", "41", "literal", XSD + "integer"),
    ("http://ex.org/a", "http://ex.org/label", "hi", "literal", LS, "en"),
    ("http://ex.org/b", "http://ex.org/knows", "http://ex.org/a"),
    ("_:b0", "http://ex.org/knows", "_:b1", "bnode"),
    # '.'-terminated local part is NOT PN_LOCAL-safe -> stays <iri>
    ("http://ex.org/weird.", "http://ex.org/p", "http://other.org/x"),
]


def _norm(t):
    t = tuple(t) + (None,) * (6 - len(t))
    dt = t[4] or (XSD + "string" if t[3] == "literal" and not t[5] else None)
    return (t[0], t[1], t[2], t[3] or "iri", dt, t[5])


def _concat_parts(path: str) -> str:
    return "".join(open(p).read() for p in sorted(glob.glob(f"{path}/part-*")))


def test_roundtrip_with_prefixes(spark, tmp_path):
    out = str(tmp_path / "g")
    write_turtle(
        triples_from_rows(spark, ROWS), out,
        prefixes={"ex": "http://ex.org/", "xsd": XSD},
    )
    text = _concat_parts(out)
    # header part sorts first, so the concatenation is one valid doc
    assert text.startswith("@prefix ex:")
    assert "ex:a a ex:Person" in text            # rdf:type -> 'a', pname
    assert '"41"^^xsd:integer' in text           # dt compressed too
    assert "<http://ex.org/weird.>" in text      # unsafe local stays <iri>
    got = sorted(_norm(t) for t in parse_turtle(text))
    assert got == sorted(_norm(t) for t in ROWS)


def test_roundtrip_full_iri_mode(spark, tmp_path):
    out = str(tmp_path / "g")
    write_turtle(triples_from_rows(spark, ROWS), out)
    text = _concat_parts(out)
    assert "@prefix" not in text
    # every body part file is standalone-valid Turtle in this mode
    for p in sorted(glob.glob(f"{out}/part-*")):
        parse_turtle(open(p).read())
    got = sorted(_norm(t) for t in parse_turtle(text))
    assert got == sorted(_norm(t) for t in ROWS)


def test_subject_grouping_and_sorted_entries(spark, tmp_path):
    out = str(tmp_path / "g")
    write_turtle(
        triples_from_rows(spark, ROWS), out, prefixes={"ex": "http://ex.org/"}
    )
    text = _concat_parts(out)
    # ex:a appears as ONE statement block with ';'-joined entries
    assert text.count("\nex:a ") + text.count("ex:a ") >= 1
    block = next(
        s for s in text.split(" .\n") if s.startswith("ex:a") or "\nex:a" in s
    )
    entries = block.split(" ;\n    ")
    assert len(entries) == 4
    assert entries == sorted(entries, key=lambda e: e.split("ex:a ")[-1])


def test_null_term_fails_loudly(spark, tmp_path):
    cols = ["subj", "pred", "obj", "obj_kind", "obj_dt", "obj_lang"]
    schema = ", ".join(f"{c} string" for c in cols)
    bad = triples_from_rows(spark, ROWS).select(*cols).unionByName(
        spark.createDataFrame(
            [(None, "http://ex.org/p", "x", "literal", None, None)], schema
        )
    )
    with pytest.raises(Exception, match="NULL mandatory term"):
        write_turtle(bad, str(tmp_path / "g1"))
    # and the documented escape hatch
    write_turtle(bad, str(tmp_path / "g2"), on_null="drop")
    got = parse_turtle(_concat_parts(str(tmp_path / "g2")))
    assert sorted(_norm(t) for t in got) == sorted(_norm(t) for t in ROWS)


def test_unknown_obj_kind_fails_loudly(spark, tmp_path):
    bad = spark.createDataFrame(
        [("http://ex.org/a", "http://ex.org/p", "x", "mystery", None, None)],
        "subj string, pred string, obj string, obj_kind string, "
        "obj_dt string, obj_lang string",
    )
    with pytest.raises(Exception, match="NULL mandatory term|unknown"):
        write_turtle(bad, str(tmp_path / "g"))


def test_report_ttl_cli_flag(spark, tmp_path):
    """--report-ttl serializes the results graph as Turtle any RDF tool
    (and our own parser) reads back."""
    import json
    import os
    import subprocess
    import sys as _sys

    from shacl_spark.functions.terms import SH

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
         "--shapes", str(d / "shapes"), "--report-ttl", str(d / "rep.ttl"),
         "--master", "local[4]"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["conforms"] is False
    rows = parse_turtle(_concat_parts(str(d / "rep.ttl")))
    preds = {p for _, p, *_ in rows}
    assert SH + "focusNode" in preds and SH + "conforms" in preds
