"""Property tests for the unique term-key encoding (terms.node_key /
node_key_col round-trip) and the Turtle literal/term forms — the
invariants the r02 conformance/count joins rely on."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from shacl_spark.functions.terms import node_key

_TEXT = st.text(
    alphabet=st.characters(blacklist_characters="\x01\x02", blacklist_categories=("Cs",)),
    min_size=0,
    max_size=30,
)


@st.composite
def terms(draw):
    kind = draw(st.sampled_from(["iri", "bnode", "literal"]))
    if kind == "iri":
        return ("iri", "http://ex/" + draw(_TEXT), None, None)
    if kind == "bnode":
        return ("bnode", "_:" + draw(_TEXT), None, None)
    dt = draw(st.one_of(st.none(), st.just("http://www.w3.org/2001/XMLSchema#string"),
                        st.just("http://www.w3.org/2001/XMLSchema#integer")))
    lang = draw(st.one_of(st.none(), st.just("en"), st.just("de-AT")))
    return ("literal", draw(_TEXT), dt, lang)


@settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(terms(), min_size=2, max_size=8))
def test_node_keys_injective(ts):
    """Distinct terms ALWAYS get distinct keys; equal terms equal keys."""
    keys = {}
    for t in ts:
        k = node_key(t[0], t[1], t[2], t[3])
        if t in keys:
            assert keys[t] == k
        for other, ok in keys.items():
            if other != t:
                assert ok != k, f"collision: {t} vs {other}"
        keys[t] = k


@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
@given(terms())
def test_resource_keys_are_plain(t):
    """IRI/bnode keys equal their value (joinable against subj);
    literal keys never collide with any subject-position string."""
    k = node_key(*t)
    if t[0] in ("iri", "bnode"):
        assert k == t[1]
    else:
        assert k.startswith("\x02")


@settings(max_examples=150, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.text(
        alphabet=st.characters(
            blacklist_characters='\\"\x00', blacklist_categories=("Cs", "Cc")
        ),
        min_size=0,
        max_size=40,
    )
)
def test_turtle_string_literal_roundtrip(s):
    """Any escapable string survives Turtle serialization → parse."""
    from shacl_spark.shacl.turtle import parse_turtle

    esc = s.replace("\\", "\\\\").replace('"', '\\"')
    rows = parse_turtle(f'@prefix ex: <http://e/> .\nex:s ex:p "{esc}" .')
    assert rows == [
        ("http://e/s", "http://e/p", s, "literal",
         "http://www.w3.org/2001/XMLSchema#string", None)
    ]
