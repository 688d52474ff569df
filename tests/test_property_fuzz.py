"""Property-based SHACL fuzzing (SURVEY §5.2 stretch row; VERDICT r04
next-round #7): hypothesis generates random small shapes graphs (14
constraint kinds across B1–B23) against random data graphs and asserts
engine-vs-oracle report equality — constraint-INTERACTION edges the
curated case battery cannot enumerate.

Determinism: ``derandomize=True`` makes the example stream a pure
function of the strategy, so CI runs are reproducible; bump
``max_examples`` locally to dig.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fixtures.shacl_cases import rdf_list
from shacl_spark.functions.terms import RDF, SH, XSD, triples_from_rows
from shacl_spark.shacl import validate
from tests.oracle import Oracle, precision_recall, report_set

T = RDF + "type"
XS_STR = XSD + "string"
XS_INT = XSD + "integer"
LSTR = RDF + "langString"

_SUBJECTS = [f"ex:n{i}" for i in range(6)]
_PREDS = ["ex:p0", "ex:p1", "ex:p2"]
_CLASSES = ["ex:C0", "ex:C1"]

# (value, kind, dt, lang) object pool: well-formed + ill-formed
# integers, language-tagged literals (mixed case), IRIs back into the
# subject universe — the corners where kind/dt/lang identity bites
_OBJECTS = [
    ("a", "literal", XS_STR, None),
    ("hello world", "literal", XS_STR, None),
    ("5", "literal", XS_INT, None),
    ("12", "literal", XS_INT, None),
    ("abc", "literal", XS_INT, None),  # ill-formed integer
    ("tag", "literal", LSTR, "en"),
    ("tag", "literal", LSTR, "EN"),
    ("etikett", "literal", LSTR, "de"),
    ("ex:n0", "iri", None, None),
    ("ex:n1", "iri", None, None),
    ("ex:n3", "iri", None, None),
]


@st.composite
def _data_graph(draw):
    rows = []
    for s in _SUBJECTS:
        rows.append((s, T, draw(st.sampled_from(_CLASSES))))
        for p in _PREDS:
            for _ in range(draw(st.integers(0, 2))):
                v, k, dt, lang = draw(st.sampled_from(_OBJECTS))
                rows.append((s, p, v, k, dt, lang))
    return sorted(set(rows), key=lambda r: tuple("" if x is None else x for x in r))


_KINDS = [
    "minCount", "maxCount", "datatype", "nodeKind", "class", "pattern",
    "minLength", "maxLength", "minInclusive", "maxExclusive", "in",
    "hasValue", "languageIn", "uniqueLang",
]


@st.composite
def _constraint(draw, ps: str):
    """Shapes-graph rows for one random constraint on property shape
    ``ps`` (list params get skolemized rdf:list nodes under the ps)."""
    kind = draw(st.sampled_from(_KINDS))
    if kind == "minCount":
        return [(ps, SH + "minCount", str(draw(st.integers(1, 3))), "literal", XS_INT)]
    if kind == "maxCount":
        return [(ps, SH + "maxCount", str(draw(st.integers(0, 2))), "literal", XS_INT)]
    if kind == "datatype":
        return [(ps, SH + "datatype", draw(st.sampled_from([XS_STR, XS_INT])))]
    if kind == "nodeKind":
        nk = draw(st.sampled_from(["IRI", "Literal", "BlankNodeOrIRI"]))
        return [(ps, SH + "nodeKind", SH + nk)]
    if kind == "class":
        return [(ps, SH + "class", draw(st.sampled_from(_CLASSES)))]
    if kind == "pattern":
        rx = draw(st.sampled_from(["^a", "[0-9]+", "tag", "o"]))
        return [(ps, SH + "pattern", rx, "literal", XS_STR)]
    if kind == "minLength":
        return [(ps, SH + "minLength", str(draw(st.integers(1, 4))), "literal", XS_INT)]
    if kind == "maxLength":
        return [(ps, SH + "maxLength", str(draw(st.integers(2, 6))), "literal", XS_INT)]
    if kind == "minInclusive":
        return [(ps, SH + "minInclusive", str(draw(st.integers(0, 10))), "literal", XS_INT)]
    if kind == "maxExclusive":
        return [(ps, SH + "maxExclusive", str(draw(st.integers(5, 13))), "literal", XS_INT)]
    if kind == "in":
        terms = draw(
            st.lists(st.sampled_from(_OBJECTS), min_size=1, max_size=3, unique=True)
        )
        lst = f"{ps}/in"
        return [(ps, SH + "in", f"{lst}/0")] + rdf_list(
            lst, [(v, k, dt) for v, k, dt, _lang in terms]
        )
    if kind == "hasValue":
        v, k, dt, _lang = draw(st.sampled_from(_OBJECTS[:9]))
        return [(ps, SH + "hasValue", v, k, dt)]
    if kind == "languageIn":
        langs = draw(st.sampled_from([["en"], ["de"], ["en", "de"]]))
        lst = f"{ps}/langs"
        return [(ps, SH + "languageIn", f"{lst}/0")] + rdf_list(
            lst, [(tag, "literal", XS_STR) for tag in langs]
        )
    if kind == "uniqueLang":
        return [(ps, SH + "uniqueLang", "true", "literal", XSD + "boolean")]
    raise AssertionError(kind)


@st.composite
def _shapes_graph(draw):
    rows = [
        ("ex:S", T, SH + "NodeShape"),
        ("ex:S", SH + "targetClass", "ex:C0"),
    ]
    n_props = draw(st.integers(1, 2))
    preds = draw(
        st.lists(st.sampled_from(_PREDS), min_size=n_props, max_size=n_props,
                 unique=True)
    )
    for i, pred in enumerate(preds):
        ps = f"ex:P{i}"
        rows += [("ex:S", SH + "property", ps), (ps, SH + "path", pred)]
        for c in range(draw(st.integers(1, 2))):
            rows += draw(_constraint(ps))
        # pairwise / logical extras on some shapes
        extra = draw(st.sampled_from(
            [None, None, "equals", "disjoint", "lessThan", "node", "not"]
        ))
        if extra in ("equals", "disjoint", "lessThan"):
            other = draw(st.sampled_from([p for p in _PREDS if p != pred]))
            rows.append((ps, SH + extra, other))
        elif extra in ("node", "not"):
            rows += [
                (ps, SH + extra, "ex:Aux"),
                ("ex:Aux", T, SH + "NodeShape"),
                ("ex:Aux", SH + "property", "ex:AuxP"),
                ("ex:AuxP", SH + "path", "ex:p0"),
                ("ex:AuxP", SH + "minCount", "1", "literal", XS_INT),
            ]
    if draw(st.booleans()):
        rows += [
            ("ex:S", SH + "closed", "true", "literal", XSD + "boolean"),
            ("ex:S", SH + "ignoredProperties", "ex:S/ig/0"),
        ] + rdf_list("ex:S/ig", [T, "ex:p2"])
    # dedup while preserving list-node structure (rows are exact tuples)
    seen, out = set(), []
    for r in rows:
        if r not in seen:
            seen.add(r)
            out.append(r)
    return out


@settings(
    max_examples=int(__import__("os").environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "15")),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(data=_data_graph(), shapes=_shapes_graph())
def test_random_shapes_engine_matches_oracle(spark_session, data, shapes):
    engine_rows = validate(
        spark_session, triples_from_rows(spark_session, data), shapes
    ).collect()
    oracle_results = Oracle(data, shapes).validate()
    p, r = precision_recall(engine_rows, oracle_results)
    if (p, r) != (1.0, 1.0):
        e, o = report_set(engine_rows), report_set(oracle_results)
        pytest.fail(
            f"P={p:.2f} R={r:.2f}\nengine-only: {sorted(e - o)}\n"
            f"oracle-only: {sorted(o - e)}\nshapes: {shapes}\ndata: {data}"
        )


# hypothesis re-enters the test function many times per session; a
# module fixture dodges the function-scope health check against the
# session-scoped spark fixture
@pytest.fixture(scope="module")
def spark_session(spark):
    return spark
