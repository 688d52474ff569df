"""shacl-shacl: the SHACL metamodel — shapes that validate shapes
graphs (W3C SHACL Recommendation 2017-07-20, Appendix E "SHACL-SHACL";
re-expressed here, triple-encoded, for the constraint parameters this
engine supports).

This is the reference's central test artifact (BASELINE.json:6
"shacl-shacl validation cases"): run ``validate(spark,
shapes_graph_as_data, SHACL_SHACL)`` to check that a shapes graph is
well-formed before using it.
"""

from __future__ import annotations

from shacl_spark.functions.terms import RDF, SH, XSD

T = RDF + "type"
XS = XSD
FIRST, REST, NIL = RDF + "first", RDF + "rest", RDF + "nil"


def _int_param(pred: str, name: str, max_one: bool = True) -> list[tuple]:
    """Parameter must be a well-formed xsd:integer literal (and at most
    one per shape when max_one)."""
    s = SH + f"_{name}Shape"
    ps = SH + f"_{name}Value"
    rows = [
        (s, T, SH + "NodeShape"),
        (s, SH + "targetSubjectsOf", pred),
        (s, SH + "property", ps),
        (ps, SH + "path", pred),
        (ps, SH + "datatype", XS + "integer"),
    ]
    if max_one:
        rows.append((ps, SH + "maxCount", "1", "literal", XS + "integer"))
    return rows


def _iri_param(pred: str, name: str, max_one: bool = True) -> list[tuple]:
    s = SH + f"_{name}Shape"
    ps = SH + f"_{name}Value"
    rows = [
        (s, T, SH + "NodeShape"),
        (s, SH + "targetSubjectsOf", pred),
        (s, SH + "property", ps),
        (ps, SH + "path", pred),
        (ps, SH + "nodeKind", SH + "BlankNodeOrIRI"),
    ]
    if max_one:
        rows.append((ps, SH + "maxCount", "1", "literal", XS + "integer"))
    return rows


def _string_param(pred: str, name: str, max_one: bool = True) -> list[tuple]:
    s = SH + f"_{name}Shape"
    ps = SH + f"_{name}Value"
    rows = [
        (s, T, SH + "NodeShape"),
        (s, SH + "targetSubjectsOf", pred),
        (s, SH + "property", ps),
        (ps, SH + "path", pred),
        (ps, SH + "datatype", XS + "string"),
    ]
    if max_one:
        rows.append((ps, SH + "maxCount", "1", "literal", XS + "integer"))
    return rows


def _bool_param(pred: str, name: str) -> list[tuple]:
    s = SH + f"_{name}Shape"
    ps = SH + f"_{name}Value"
    return [
        (s, T, SH + "NodeShape"),
        (s, SH + "targetSubjectsOf", pred),
        (s, SH + "property", ps),
        (ps, SH + "path", pred),
        (ps, SH + "datatype", XS + "boolean"),
        (ps, SH + "maxCount", "1", "literal", XS + "integer"),
    ]


SHACL_SHACL: list[tuple] = []

# every subject of sh:path has EXACTLY ONE path, and it is not a literal
SHACL_SHACL += [
    (SH + "_PathShape", T, SH + "NodeShape"),
    (SH + "_PathShape", SH + "targetSubjectsOf", SH + "path"),
    (SH + "_PathShape", SH + "property", SH + "_PathValue"),
    (SH + "_PathValue", SH + "path", SH + "path"),
    (SH + "_PathValue", SH + "minCount", "1", "literal", XS + "integer"),
    (SH + "_PathValue", SH + "maxCount", "1", "literal", XS + "integer"),
    (SH + "_PathValue", SH + "nodeKind", SH + "BlankNodeOrIRI"),
]

# every sh:property value is an IRI/bnode (a property shape, not a literal)
SHACL_SHACL += [
    (SH + "_PropShape", T, SH + "NodeShape"),
    (SH + "_PropShape", SH + "targetSubjectsOf", SH + "property"),
    (SH + "_PropShape", SH + "property", SH + "_PropValue"),
    (SH + "_PropValue", SH + "path", SH + "property"),
    (SH + "_PropValue", SH + "nodeKind", SH + "BlankNodeOrIRI"),
]

# cardinality parameters: integers, at most one each
SHACL_SHACL += _int_param(SH + "minCount", "MinCount")
SHACL_SHACL += _int_param(SH + "maxCount", "MaxCount")
SHACL_SHACL += _int_param(SH + "minLength", "MinLength")
SHACL_SHACL += _int_param(SH + "maxLength", "MaxLength")
SHACL_SHACL += _int_param(SH + "qualifiedMinCount", "QualifiedMinCount")
SHACL_SHACL += _int_param(SH + "qualifiedMaxCount", "QualifiedMaxCount")

# IRI-valued parameters
SHACL_SHACL += _iri_param(SH + "datatype", "Datatype")
SHACL_SHACL += _iri_param(SH + "class", "Class", max_one=False)
SHACL_SHACL += _iri_param(SH + "targetClass", "TargetClass", max_one=False)
SHACL_SHACL += _iri_param(SH + "targetSubjectsOf", "TargetSubjectsOf", max_one=False)
SHACL_SHACL += _iri_param(SH + "targetObjectsOf", "TargetObjectsOf", max_one=False)
SHACL_SHACL += _iri_param(SH + "equals", "Equals", max_one=False)
SHACL_SHACL += _iri_param(SH + "disjoint", "Disjoint", max_one=False)
SHACL_SHACL += _iri_param(SH + "lessThan", "LessThan", max_one=False)
SHACL_SHACL += _iri_param(SH + "lessThanOrEquals", "LessThanOrEquals", max_one=False)
SHACL_SHACL += _iri_param(SH + "node", "Node", max_one=False)
SHACL_SHACL += _iri_param(SH + "not", "Not", max_one=False)
SHACL_SHACL += _iri_param(SH + "qualifiedValueShape", "QualifiedValueShape")
SHACL_SHACL += _iri_param(SH + "severity", "Severity")

# string-valued parameters
SHACL_SHACL += _string_param(SH + "pattern", "Pattern")
SHACL_SHACL += _string_param(SH + "flags", "Flags")

# boolean parameters
SHACL_SHACL += _bool_param(SH + "deactivated", "Deactivated")
SHACL_SHACL += _bool_param(SH + "closed", "Closed")
SHACL_SHACL += _bool_param(SH + "uniqueLang", "UniqueLang")

# sh:nodeKind must be one of the six defined kinds, at most one
SHACL_SHACL += [
    (SH + "_NodeKindShape", T, SH + "NodeShape"),
    (SH + "_NodeKindShape", SH + "targetSubjectsOf", SH + "nodeKind"),
    (SH + "_NodeKindShape", SH + "property", SH + "_NodeKindValue"),
    (SH + "_NodeKindValue", SH + "path", SH + "nodeKind"),
    (SH + "_NodeKindValue", SH + "maxCount", "1", "literal", XS + "integer"),
    (SH + "_NodeKindValue", SH + "in", SH + "_nodeKindList/0"),
    (SH + "_nodeKindList/0", FIRST, SH + "BlankNode"),
    (SH + "_nodeKindList/0", REST, SH + "_nodeKindList/1"),
    (SH + "_nodeKindList/1", FIRST, SH + "IRI"),
    (SH + "_nodeKindList/1", REST, SH + "_nodeKindList/2"),
    (SH + "_nodeKindList/2", FIRST, SH + "Literal"),
    (SH + "_nodeKindList/2", REST, SH + "_nodeKindList/3"),
    (SH + "_nodeKindList/3", FIRST, SH + "BlankNodeOrIRI"),
    (SH + "_nodeKindList/3", REST, SH + "_nodeKindList/4"),
    (SH + "_nodeKindList/4", FIRST, SH + "BlankNodeOrLiteral"),
    (SH + "_nodeKindList/4", REST, SH + "_nodeKindList/5"),
    (SH + "_nodeKindList/5", FIRST, SH + "IRIOrLiteral"),
    (SH + "_nodeKindList/5", REST, NIL),
]

# list-valued parameters point at a list head (IRI/bnode here — this
# engine skolemizes list nodes)
for pred, name in (
    (SH + "in", "In"),
    (SH + "languageIn", "LanguageIn"),
    (SH + "ignoredProperties", "IgnoredProperties"),
    (SH + "and", "And"),
    (SH + "or", "Or"),
    (SH + "xone", "Xone"),
):
    SHACL_SHACL += _iri_param(pred, name, max_one=False)
