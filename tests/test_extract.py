"""Extraction correctness: engine triples vs a pure-Python per-file
oracle, including the per-row sha256(content) invariant
(BASELINE.json:15)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from shacl_spark.functions.terms import KG, RDF_TYPE, XSD_STRING
from shacl_spark.kg import extract as X
from shacl_spark.sources.corpus import gen_rows, synth_corpus

N_FILES = 60


def oracle_extract(repo, path, commit, lang, content):
    """Per-file, per-row reimplementation of A2–A6 (the reference's
    execution shape per BASELINE.json:6) for parity testing."""
    file_iri = f"{KG}file/{repo}/{path}@{commit}"
    triples = set()

    def add(s, p, o, kind="iri", dt=None):
        triples.add((s, p, o, kind, dt, None))

    # provenance (A6)
    add(file_iri, RDF_TYPE, KG + "File")
    add(file_iri, KG + "inRepo", KG + "repo/" + repo)
    add(file_iri, KG + "atCommit", commit, "literal", XSD_STRING)
    add(file_iri, KG + "sha256", hashlib.sha256(content.encode()).hexdigest(),
        "literal", XSD_STRING)
    add(file_iri, KG + "lang", lang, "literal", XSD_STRING)

    if lang == "python":
        imp_res, cls_re, def_re, call_re, kws = (
            [X.PY_IMPORT_RE, X.PY_FROM_RE], X.PY_CLASS_RE, X.PY_DEF_RE,
            X.PY_CALL_RE, X.PY_KEYWORDS,
        )
    else:
        imp_res, cls_re, def_re, call_re, kws = (
            [X.JS_REQUIRE_RE, X.JS_IMPORT_RE], X.JS_CLASS_RE, X.JS_FUNC_RE,
            X.JS_CALL_RE, X.JS_KEYWORDS,
        )

    for rx in imp_res:
        for m in rx.finditer(content):
            add(file_iri, KG + "imports", KG + "module/" + m.group(1))

    defined = set()
    for m in cls_re.finditer(content):
        name, base = m.group(1), m.group(2)
        defined.add(name)
        sym = f"{file_iri}#{name}"
        add(sym, RDF_TYPE, KG + "Class")
        add(file_iri, KG + "defines", sym)
        add(sym, KG + "name", name, "literal", XSD_STRING)
        if base and base not in ("object", ""):
            add(sym, KG + "extends", KG + "mention/" + base)
    for m in def_re.finditer(content):
        name = m.group(1)
        defined.add(name)
        sym = f"{file_iri}#{name}"
        add(sym, RDF_TYPE, KG + "Function")
        add(file_iri, KG + "defines", sym)
        add(sym, KG + "name", name, "literal", XSD_STRING)
    for m in call_re.finditer(content):
        name = m.group(1)
        if name not in kws and name not in defined:
            add(file_iri, KG + "calls", KG + "mention/" + name)
    return triples


@pytest.fixture(scope="module")
def engine_triples(spark):
    corpus = synth_corpus(spark, N_FILES, parts=4)
    df = X.extract_triples(corpus, n_parts=16)
    return df


def test_triple_set_parity(engine_triples):
    engine = {
        (r["subj"], r["pred"], r["obj"], r["obj_kind"], r["obj_dt"], r["obj_lang"])
        for r in engine_triples.collect()
    }
    oracle = set()
    for row in gen_rows(N_FILES):
        oracle |= oracle_extract(*row)
    assert engine == oracle, (
        f"engine-only: {sorted(engine - oracle)[:5]}\n"
        f"oracle-only: {sorted(oracle - engine)[:5]}"
    )


def test_sha256_invariant(engine_triples):
    """Engine sha2() values must equal hashlib over identical UTF-8 input."""
    engine_sha = {
        r["src_path"]: r["obj"]
        for r in engine_triples.where(f"pred = '{KG}sha256'").collect()
    }
    for repo, path, commit, lang, content in gen_rows(N_FILES):
        assert engine_sha[path] == hashlib.sha256(content.encode()).hexdigest()


def test_mentions_batch_vectorized():
    """The batch extractor must handle a mixed-language batch."""
    content = pd.Series(["import os\ndef f(x):\n    return g(x)\n",
                         "const a = require('b');\nfunction h(x) { return k(x); }\n"])
    lang = pd.Series(["python", "javascript"])
    out = X.extract_mentions_batch(content, lang)
    kinds0 = {(m["kind"], m["name"]) if isinstance(m, dict) else (m[0], m[1]) for m in out[0]}
    assert ("import", "os") in kinds0
    assert ("func", "f") in kinds0
    assert ("call", "g") in kinds0
    kinds1 = {(m[0], m[1]) for m in out[1]}
    assert ("import", "b") in kinds1 and ("func", "h") in kinds1 and ("call", "k") in kinds1


def test_fused_mentions_equal_udf_path(spark):
    """A corpus carrying the fused ``mentions`` column (r06) must
    produce exactly the triples the Arrow-UDF path produces."""
    fused = X.extract_triples(synth_corpus(spark, N_FILES, parts=4), n_parts=16)
    plain = X.extract_triples(
        synth_corpus(spark, N_FILES, parts=4, with_mentions=False), n_parts=16
    )
    key = lambda r: tuple(r)  # noqa: E731
    assert sorted(map(key, fused.collect())) == sorted(map(key, plain.collect()))


def test_part_id_deterministic(spark):
    corpus = synth_corpus(spark, 20, parts=2)
    a = X.extract_triples(corpus, n_parts=64).select("subj", "part_id").distinct()
    corpus2 = synth_corpus(spark, 20, parts=5)  # different physical partitioning
    b = X.extract_triples(corpus2, n_parts=64).select("subj", "part_id").distinct()
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
