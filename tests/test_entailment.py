"""RDFS entailment (r05): shacl/entailment.py rdfs_entailment + the
sh:entailment hook in validate() (SPEC §1.5).

Oracle: a naive driver-side fixpoint applying rdfs2/3/5/7/9/11 until
no new triple appears — deliberately the rule-by-rule spec shape, vs
the engine's one-pass broadcast-join composition.
"""

from __future__ import annotations

import pytest

from shacl_spark.functions.terms import RDF, RDFS, SH, XSD, triples_from_rows
from shacl_spark.shacl import validate
from shacl_spark.shacl.entailment import (
    RDFS_ENTAILMENT_IRI,
    rdfs_entailment,
)

TYPE = RDF + "type"
SCO = RDFS + "subClassOf"
SPO = RDFS + "subPropertyOf"
DOM = RDFS + "domain"
RNG = RDFS + "range"


def naive_closure(rows) -> set[tuple]:
    """Rule-by-rule fixpoint — the spec-literal oracle."""
    def norm(r):
        r = tuple(r)
        return r + (("iri", None, None)[len(r) - 3 :] if len(r) < 6 else ())

    ts = {norm(r) for r in rows}
    while True:
        new = set()
        sco = {(s, o) for s, p, o, k, *_ in ts if p == SCO and k != "literal"}
        spo = {(s, o) for s, p, o, k, *_ in ts if p == SPO and k != "literal"}
        dom = {(s, o) for s, p, o, k, *_ in ts if p == DOM and k != "literal"}
        rng = {(s, o) for s, p, o, k, *_ in ts if p == RNG and k != "literal"}
        for a, b in sco:
            for c, d in sco:
                if b == c and a != d:
                    new.add((a, SCO, d, "iri", None, None))
        for a, b in spo:
            for c, d in spo:
                if b == c and a != d:
                    new.add((a, SPO, d, "iri", None, None))
        for s, p, o, k, dt, lg in list(ts):
            for p1, q in spo:
                if p == p1:
                    new.add((s, q, o, k, dt, lg))
            for p1, c in dom:
                if p == p1:
                    new.add((s, TYPE, c, "iri", None, None))
            for p1, c in rng:
                if p == p1 and k != "literal":
                    new.add((o, TYPE, c, "iri", None, None))
            if p == TYPE:
                for c, d in sco:
                    if o == c:
                        new.add((s, TYPE, d, "iri", None, None))
        if new <= ts:
            return ts
        ts |= new


def _engine_rows(spark, rows) -> set[tuple]:
    out = rdfs_entailment(triples_from_rows(spark, rows))
    return {
        (r["subj"], r["pred"], r["obj"], r["obj_kind"], r["obj_dt"], r["obj_lang"])
        for r in out.collect()
    }


CASES = {
    "class_chain": [
        ("ex:Emp", SCO, "ex:Person"),
        ("ex:Person", SCO, "ex:Agent"),
        ("ex:Agent", SCO, "ex:Thing"),
        ("ex:a", TYPE, "ex:Emp"),
    ],
    "subproperty_values": [
        ("ex:nick", SPO, "ex:label"),
        ("ex:label", SPO, "ex:name"),
        ("ex:a", "ex:nick", "Al", "literal", XSD + "string"),
        ("ex:b", "ex:label", "Bee", "literal", XSD + "string"),
    ],
    "domain_range": [
        ("ex:worksAt", DOM, "ex:Person"),
        ("ex:worksAt", RNG, "ex:Org"),
        ("ex:Person", SCO, "ex:Agent"),
        ("ex:a", "ex:worksAt", "ex:acme"),
        # literal object: rdfs3 must NOT type it
        ("ex:a", "ex:age", "41", "literal", XSD + "integer"),
        ("ex:age", RNG, "ex:Num"),
    ],
    "domain_via_subproperty": [
        # rdfs7 then rdfs2: ceo ⊑ worksAt, worksAt domain Person
        ("ex:ceo", SPO, "ex:worksAt"),
        ("ex:worksAt", DOM, "ex:Person"),
        ("ex:b", "ex:ceo", "ex:acme"),
    ],
    "cycle_safe": [
        ("ex:A", SCO, "ex:B"),
        ("ex:B", SCO, "ex:A"),
        ("ex:x", TYPE, "ex:A"),
    ],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_closure_matches_naive_oracle(spark, name):
    rows = CASES[name]
    assert _engine_rows(spark, rows) == naive_closure(rows)


def test_no_schema_is_identity(spark):
    rows = [("ex:a", "ex:p", "ex:b"), ("ex:a", TYPE, "ex:C")]
    df = triples_from_rows(spark, rows)
    assert rdfs_entailment(df) is df


def test_derived_triples_have_null_lineage_and_originals_keep_it(spark):
    from shacl_spark.functions.terms import TRIPLE_SCHEMA

    rows = [
        ("ex:Emp", SCO, "ex:Person", "iri", None, None, "r1", "f.py", "c1", 3),
        ("ex:a", TYPE, "ex:Emp", "iri", None, None, "r1", "f.py", "c1", 3),
    ]
    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    out = rdfs_entailment(df)
    got = {
        (r["subj"], r["pred"], r["obj"]): (r["src_repo"], r["part_id"])
        for r in out.collect()
    }
    assert got[("ex:a", TYPE, "ex:Emp")] == ("r1", 3)
    assert got[("ex:a", TYPE, "ex:Person")] == (None, None)


def test_validate_entailment_hook(spark):
    data = [
        ("ex:worksAt", DOM, "ex:Person"),
        ("ex:a", "ex:worksAt", "ex:acme"),
        ("ex:b", TYPE, "ex:Person"),
        ("ex:b", "ex:name", "Bee", "literal", XSD + "string"),
    ]
    shapes = [
        ("ex:S", TYPE, SH + "NodeShape"),
        ("ex:S", SH + "targetClass", "ex:Person"),
        ("ex:S", SH + "property", "ex:S_p"),
        ("ex:S_p", SH + "path", "ex:name"),
        ("ex:S_p", SH + "minCount", "1", "literal", XSD + "integer"),
    ]
    df = triples_from_rows(spark, data)
    # without entailment ex:a is not a Person -> conforms
    assert validate(spark, df, shapes).isEmpty()
    # kwarg opt-in
    rep = validate(spark, df, shapes, entailment="rdfs")
    assert [r["focus"] for r in rep.collect()] == ["ex:a"]
    # shapes-graph declaration (SPEC §1.5)
    shapes_decl = shapes + [("ex:G", SH + "entailment", RDFS_ENTAILMENT_IRI)]
    rep2 = validate(spark, df, shapes_decl)
    assert [r["focus"] for r in rep2.collect()] == ["ex:a"]


def test_unsupported_regime_fails(spark):
    data = [("ex:a", TYPE, "ex:C")]
    shapes = [
        ("ex:S", TYPE, SH + "NodeShape"),
        ("ex:S", SH + "targetClass", "ex:C"),
        ("ex:G", SH + "entailment", "http://www.w3.org/ns/entailment/OWL-Direct"),
    ]
    with pytest.raises(ValueError, match="unsupported sh:entailment"):
        validate(spark, triples_from_rows(spark, data), shapes)
    with pytest.raises(ValueError, match="unsupported entailment"):
        validate(spark, triples_from_rows(spark, data), [
            ("ex:S", TYPE, SH + "NodeShape"),
            ("ex:S", SH + "targetClass", "ex:C"),
        ], entailment="owl")


def test_incremental_full_fallback_on_entailment(spark):
    from shacl_spark.shacl.incremental import incremental_revalidate

    data = [
        ("ex:worksAt", DOM, "ex:Person"),
        ("ex:b", TYPE, "ex:Person"),
        ("ex:b", "ex:name", "Bee", "literal", XSD + "string"),
    ]
    shapes = [
        ("ex:S", TYPE, SH + "NodeShape"),
        ("ex:S", SH + "targetClass", "ex:Person"),
        ("ex:S", SH + "property", "ex:S_p"),
        ("ex:S_p", SH + "path", "ex:name"),
        ("ex:S_p", SH + "minCount", "1", "literal", XSD + "integer"),
        ("ex:G", SH + "entailment", RDFS_ENTAILMENT_IRI),
    ]
    base = triples_from_rows(spark, data)
    prev = validate(spark, base, shapes)
    delta_rows = [("ex:a", "ex:worksAt", "ex:acme")]
    new = base.unionByName(triples_from_rows(spark, delta_rows))
    changed = triples_from_rows(spark, delta_rows)
    stats: dict = {}
    rep = incremental_revalidate(
        spark, new, changed, shapes, prev, stats=stats
    )
    assert stats["mode"] == "full_entailment"
    assert [r["focus"] for r in rep.collect()] == ["ex:a"]


def test_derived_duplicate_of_asserted_not_duplicated(spark):
    """ADVICE r05 (high): a derived triple that is ALSO asserted must
    appear exactly once — the anti-join must be null-safe on the NULL
    obj_dt/obj_lang of IRI objects (RDF set semantics; bag-sensitive
    consumers like SPARQL COUNT read the entailed frame)."""
    rows = [
        ("ex:Emp", SCO, "ex:Person"),
        ("ex:a", TYPE, "ex:Emp"),
        ("ex:a", TYPE, "ex:Person"),  # asserted AND rdfs9-derivable
    ]
    out = rdfs_entailment(triples_from_rows(spark, rows))
    dup = out.where(
        (out["subj"] == "ex:a") & (out["pred"] == TYPE) & (out["obj"] == "ex:Person")
    )
    assert dup.count() == 1
    # full-frame bag check: no triple appears twice
    assert out.count() == out.dropDuplicates(
        ["subj", "pred", "obj", "obj_kind", "obj_dt", "obj_lang"]
    ).count()
