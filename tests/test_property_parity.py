"""Property-based engine-vs-oracle parity (SURVEY.md §5.2 stretch):
random small data graphs validated against a fixed shape battery must
produce identical reports from the distributed engine and the
per-focus-node oracle."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from shacl_spark.functions.terms import RDF, SH, XSD, triples_from_rows
from shacl_spark.shacl import validate
from tests.oracle import Oracle, precision_recall, report_set

T = RDF + "type"
XS = XSD

SHAPES = [
    ("ex:S", T, SH + "NodeShape"),
    ("ex:S", SH + "targetClass", "ex:Thing"),
    ("ex:S", SH + "property", "ex:SName"),
    ("ex:S", SH + "property", "ex:SAge"),
    ("ex:S", SH + "property", "ex:SLink"),
    ("ex:SName", SH + "path", "ex:name"),
    ("ex:SName", SH + "minCount", "1", "literal", XS + "integer"),
    ("ex:SName", SH + "maxCount", "2", "literal", XS + "integer"),
    ("ex:SName", SH + "datatype", XS + "string"),
    ("ex:SName", SH + "minLength", "2", "literal", XS + "integer"),
    ("ex:SAge", SH + "path", "ex:age"),
    ("ex:SAge", SH + "datatype", XS + "integer"),
    ("ex:SAge", SH + "maxInclusive", "120", "literal", XS + "integer"),
    ("ex:SLink", SH + "path", "ex:link"),
    ("ex:SLink", SH + "nodeKind", SH + "IRI"),
    ("ex:SLink", SH + "class", "ex:Thing"),
]

node_ids = st.integers(min_value=0, max_value=5)
names = st.sampled_from(["A", "Bob", "xy", "z", "Carolyn"])
ages = st.sampled_from(["7", "130", "12.5", "abc", "55"])


@st.composite
def graphs(draw):
    rows = []
    n_nodes = draw(st.integers(min_value=1, max_value=5))
    for i in range(n_nodes):
        node = f"ex:n{i}"
        if draw(st.booleans()):
            rows.append((node, T, "ex:Thing"))
        for _ in range(draw(st.integers(min_value=0, max_value=3))):
            rows.append((node, "ex:name", draw(names), "literal", XS + "string"))
        if draw(st.booleans()):
            rows.append((node, "ex:age", draw(ages), "literal", XS + "integer"))
        if draw(st.booleans()):
            tgt = draw(node_ids)
            rows.append((node, "ex:link", f"ex:n{tgt}"))
        if draw(st.booleans()):
            rows.append((node, "ex:link", "stringval", "literal", XS + "string"))
    return rows


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(graphs())
def test_random_graph_parity(spark, data_rows):
    engine_rows = validate(spark, triples_from_rows(spark, data_rows), SHAPES).collect()
    oracle_results = Oracle(data_rows, SHAPES).validate()
    p, r = precision_recall(engine_rows, oracle_results)
    assert (p, r) == (1.0, 1.0), (
        f"engine-only={sorted(report_set(engine_rows) - report_set(oracle_results))} "
        f"oracle-only={sorted(report_set(oracle_results) - report_set(engine_rows))} "
        f"data={data_rows}"
    )
