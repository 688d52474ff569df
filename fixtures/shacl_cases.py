"""SHACL fixture cases (FIXTURES.md §2): data triples + shapes triples
per constraint component, one conforming / one violating variant each,
plus shacl-shacl-style metamodel cases.

Rows are (subj, pred, obj[, obj_kind[, obj_dt[, obj_lang]]]);
obj_kind defaults to 'iri'.  List nodes are skolem IRIs (no blank
nodes anywhere in this engine — SURVEY.md §1.2).
"""

from __future__ import annotations

from shacl_spark.functions.terms import RDF, RDFS, SH, XSD

T = RDF + "type"
SCO = RDFS + "subClassOf"
XS = XSD
FIRST, REST, NIL = RDF + "first", RDF + "rest", RDF + "nil"


def rdf_list(prefix: str, terms) -> list[tuple]:
    """Encode a python list as skolemized rdf:first/rest triples;
    terms are (value, kind, dt) tuples or plain IRI strings."""
    rows = []
    n = len(terms)
    for i, t in enumerate(terms):
        node = f"{prefix}/{i}"
        if isinstance(t, str):
            rows.append((node, FIRST, t))
        else:
            rows.append((node, FIRST, t[0], t[1], t[2] if len(t) > 2 else None))
        nxt = f"{prefix}/{i+1}" if i + 1 < n else NIL
        rows.append((node, REST, nxt))
    return rows


def _lit(v, dt=XS + "integer"):
    return (v, "literal", dt)


CASES: dict[str, dict] = {}


def case(name: str, data: list, shapes: list) -> None:
    CASES[name] = {"data": data, "shapes": shapes}


# ---- cardinality -----------------------------------------------------------

_PERSONS = [
    ("ex:alice", T, "ex:Person"),
    ("ex:alice", "ex:name", "Alice", "literal", XS + "string"),
    ("ex:bob", T, "ex:Person"),
    ("ex:carol", T, "ex:Person"),
    ("ex:carol", "ex:name", "C1", "literal", XS + "string"),
    ("ex:carol", "ex:name", "C2", "literal", XS + "string"),
]
_NAME_SHAPE = [
    ("ex:S", T, SH + "NodeShape"),
    ("ex:S", SH + "targetClass", "ex:Person"),
    ("ex:S", SH + "property", "ex:SName"),
    ("ex:SName", SH + "path", "ex:name"),
]
case("mincount_missing", _PERSONS,
     _NAME_SHAPE + [("ex:SName", SH + "minCount", "1", "literal", XS + "integer")])
case("maxcount_exceeded", _PERSONS,
     _NAME_SHAPE + [("ex:SName", SH + "maxCount", "1", "literal", XS + "integer")])
case("mincount_ok",
     [("ex:a", T, "ex:Person"), ("ex:a", "ex:name", "A", "literal", XS + "string")],
     _NAME_SHAPE + [("ex:SName", SH + "minCount", "1", "literal", XS + "integer")])

# ---- value type ------------------------------------------------------------

# W3C SHACL instances include typed BLANK nodes — only _:b2 (untyped)
# may violate sh:class here (ADVICE r02 engine.py:424 regression case)
case("class_typed_bnode",
     [("ex:alice", T, "ex:Agent"), ("ex:alice", "ex:knows", "_:b1", "bnode"),
      ("_:b1", T, "ex:Person"),
      ("ex:bob", T, "ex:Agent"), ("ex:bob", "ex:knows", "_:b2", "bnode"),
      ("ex:carol", T, "ex:Agent"), ("ex:carol", "ex:knows", "ex:dave"),
      ("ex:dave", T, "ex:Person")],
     [("ex:S", T, SH + "NodeShape"), ("ex:S", SH + "targetClass", "ex:Agent"),
      ("ex:S", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:knows"),
      ("ex:SP", SH + "class", "ex:Person")])

case("datatype_int_illformed",
     [("ex:a", T, "ex:Thing"), ("ex:a", "ex:age", "12", "literal", XS + "integer"),
      ("ex:b", T, "ex:Thing"), ("ex:b", "ex:age", "twelve", "literal", XS + "integer"),
      ("ex:c", T, "ex:Thing"), ("ex:c", "ex:age", "12", "literal", XS + "string")],
     [("ex:S", T, SH + "NodeShape"), ("ex:S", SH + "targetClass", "ex:Thing"),
      ("ex:S", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:age"),
      ("ex:SP", SH + "datatype", XS + "integer")])

case("class_value_wrong_type",
     [("ex:acme", T, "ex:Company"),
      ("ex:acme", "ex:ceo", "ex:jane"),
      ("ex:jane", T, "ex:Manager"),
      ("ex:Manager", SCO, "ex:Person"),
      ("ex:globex", T, "ex:Company"),
      ("ex:globex", "ex:ceo", "ex:robot"),
      ("ex:robot", T, "ex:Machine")],
     [("ex:S", T, SH + "NodeShape"), ("ex:S", SH + "targetClass", "ex:Company"),
      ("ex:S", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:ceo"),
      ("ex:SP", SH + "class", "ex:Person")])

case("nodekind_iri_vs_literal",
     [("ex:a", T, "ex:Thing"), ("ex:a", "ex:link", "ex:other"),
      ("ex:b", T, "ex:Thing"), ("ex:b", "ex:link", "not-an-iri", "literal", XS + "string")],
     [("ex:S", T, SH + "NodeShape"), ("ex:S", SH + "targetClass", "ex:Thing"),
      ("ex:S", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:link"),
      ("ex:SP", SH + "nodeKind", SH + "IRI")])

# ---- ranges ----------------------------------------------------------------

case("range_bounds",
     [("ex:a", T, "ex:Thing"), ("ex:a", "ex:score", "5", "literal", XS + "integer"),
      ("ex:b", T, "ex:Thing"), ("ex:b", "ex:score", "15", "literal", XS + "integer"),
      ("ex:c", T, "ex:Thing"), ("ex:c", "ex:score", "0", "literal", XS + "integer"),
      ("ex:d", T, "ex:Thing"), ("ex:d", "ex:score", "abc", "literal", XS + "string")],
     [("ex:S", T, SH + "NodeShape"), ("ex:S", SH + "targetClass", "ex:Thing"),
      ("ex:S", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:score"),
      ("ex:SP", SH + "minExclusive", "0", "literal", XS + "integer"),
      ("ex:SP", SH + "maxInclusive", "10", "literal", XS + "integer")])

# ---- string based ----------------------------------------------------------

case("length_and_pattern",
     [("ex:a", T, "ex:Thing"), ("ex:a", "ex:code", "AB-12", "literal", XS + "string"),
      ("ex:b", T, "ex:Thing"), ("ex:b", "ex:code", "x", "literal", XS + "string"),
      ("ex:c", T, "ex:Thing"), ("ex:c", "ex:code", "toolongcode123", "literal", XS + "string")],
     [("ex:S", T, SH + "NodeShape"), ("ex:S", SH + "targetClass", "ex:Thing"),
      ("ex:S", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:code"),
      ("ex:SP", SH + "minLength", "2", "literal", XS + "integer"),
      ("ex:SP", SH + "maxLength", "8", "literal", XS + "integer"),
      ("ex:SP", SH + "pattern", "^[A-Z]{2}-\\d+$", "literal", XS + "string")])

case("pattern_flags",
     [("ex:a", T, "ex:Thing"), ("ex:a", "ex:code", "ab-12", "literal", XS + "string"),
      ("ex:b", T, "ex:Thing"), ("ex:b", "ex:code", "zz99", "literal", XS + "string")],
     [("ex:S", T, SH + "NodeShape"), ("ex:S", SH + "targetClass", "ex:Thing"),
      ("ex:S", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:code"),
      ("ex:SP", SH + "pattern", "^[A-Z]{2}-\\d+$", "literal", XS + "string"),
      ("ex:SP", SH + "flags", "i", "literal", XS + "string")])

case("uniquelang_dup",
     [("ex:a", T, "ex:Thing"),
      ("ex:a", "ex:label", "hello", "literal", RDF + "langString", "en"),
      ("ex:a", "ex:label", "hi", "literal", RDF + "langString", "en"),
      ("ex:b", T, "ex:Thing"),
      ("ex:b", "ex:label", "hola", "literal", RDF + "langString", "es"),
      ("ex:b", "ex:label", "hello", "literal", RDF + "langString", "en")],
     [("ex:S", T, SH + "NodeShape"), ("ex:S", SH + "targetClass", "ex:Thing"),
      ("ex:S", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:label"),
      ("ex:SP", SH + "uniqueLang", "true", "literal", XS + "boolean")])

case("languagein",
     [("ex:a", T, "ex:Thing"),
      ("ex:a", "ex:label", "hello", "literal", RDF + "langString", "en-US"),
      ("ex:b", T, "ex:Thing"),
      ("ex:b", "ex:label", "bonjour", "literal", RDF + "langString", "fr")],
     [("ex:S", T, SH + "NodeShape"), ("ex:S", SH + "targetClass", "ex:Thing"),
      ("ex:S", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:label"),
      ("ex:SP", SH + "languageIn", "ex:langs/0")]
     + rdf_list("ex:langs", [("en", "literal", XS + "string"),
                             ("de", "literal", XS + "string")]))

# ---- property pairs ---------------------------------------------------------

case("equals_disjoint_pairs",
     [("ex:a", T, "ex:Thing"),
      ("ex:a", "ex:given", "Ann", "literal", XS + "string"),
      ("ex:a", "ex:nick", "Ann", "literal", XS + "string"),
      ("ex:b", T, "ex:Thing"),
      ("ex:b", "ex:given", "Bob", "literal", XS + "string"),
      ("ex:b", "ex:nick", "Bobby", "literal", XS + "string")],
     [("ex:S", T, SH + "NodeShape"), ("ex:S", SH + "targetClass", "ex:Thing"),
      ("ex:S", SH + "property", "ex:SEq"), ("ex:S", SH + "property", "ex:SDis"),
      ("ex:SEq", SH + "path", "ex:given"), ("ex:SEq", SH + "equals", "ex:nick"),
      ("ex:SDis", SH + "path", "ex:given"), ("ex:SDis", SH + "disjoint", "ex:nick")])

case("lessthan_numeric",
     [("ex:a", T, "ex:Span"),
      ("ex:a", "ex:start", "1", "literal", XS + "integer"),
      ("ex:a", "ex:end", "5", "literal", XS + "integer"),
      ("ex:b", T, "ex:Span"),
      ("ex:b", "ex:start", "9", "literal", XS + "integer"),
      ("ex:b", "ex:end", "3", "literal", XS + "integer")],
     [("ex:S", T, SH + "NodeShape"), ("ex:S", SH + "targetClass", "ex:Span"),
      ("ex:S", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:start"),
      ("ex:SP", SH + "lessThan", "ex:end")])

# ---- logical ----------------------------------------------------------------

_LOGIC_SHAPES = [
    ("ex:IntShape", T, SH + "NodeShape"),
    ("ex:IntShape", SH + "datatype", XS + "integer"),
    ("ex:ShortShape", T, SH + "NodeShape"),
    ("ex:ShortShape", SH + "maxLength", "2", "literal", XS + "integer"),
]

case("logical_and_or_not_xone",
     [("ex:a", T, "ex:Thing"), ("ex:a", "ex:v", "12", "literal", XS + "integer"),
      ("ex:b", T, "ex:Thing"), ("ex:b", "ex:v", "longstring", "literal", XS + "string"),
      ("ex:c", T, "ex:Thing"), ("ex:c", "ex:v", "ab", "literal", XS + "string")],
     [("ex:S", T, SH + "NodeShape"), ("ex:S", SH + "targetClass", "ex:Thing"),
      ("ex:S", SH + "property", "ex:SOr"), ("ex:S", SH + "property", "ex:SNot"),
      ("ex:SOr", SH + "path", "ex:v"), ("ex:SOr", SH + "or", "ex:orlist/0"),
      ("ex:SNot", SH + "path", "ex:v"), ("ex:SNot", SH + "not", "ex:IntShape")]
     + rdf_list("ex:orlist", ["ex:IntShape", "ex:ShortShape"])
     + _LOGIC_SHAPES)

case("logical_xone_and",
     [("ex:a", T, "ex:Thing"), ("ex:a", "ex:v", "12", "literal", XS + "integer"),
      ("ex:b", T, "ex:Thing"), ("ex:b", "ex:v", "ab", "literal", XS + "string"),
      ("ex:c", T, "ex:Thing"), ("ex:c", "ex:v", "abcdef", "literal", XS + "string")],
     [("ex:S", T, SH + "NodeShape"), ("ex:S", SH + "targetClass", "ex:Thing"),
      ("ex:S", SH + "property", "ex:SX"), ("ex:S", SH + "property", "ex:SAnd"),
      ("ex:SX", SH + "path", "ex:v"), ("ex:SX", SH + "xone", "ex:xlist/0"),
      ("ex:SAnd", SH + "path", "ex:v"), ("ex:SAnd", SH + "and", "ex:alist/0")]
     + rdf_list("ex:xlist", ["ex:IntShape", "ex:ShortShape"])
     + rdf_list("ex:alist", ["ex:StrShape", "ex:ShortShape"])
     + _LOGIC_SHAPES
     + [("ex:StrShape", T, SH + "NodeShape"),
        ("ex:StrShape", SH + "datatype", XS + "string")])

# ---- shape based -------------------------------------------------------------

case("node_nested_conformance",
     [("ex:a", T, "ex:Order"), ("ex:a", "ex:item", "ex:i1"),
      ("ex:i1", "ex:price", "5", "literal", XS + "integer"),
      ("ex:b", T, "ex:Order"), ("ex:b", "ex:item", "ex:i2")],
     [("ex:S", T, SH + "NodeShape"), ("ex:S", SH + "targetClass", "ex:Order"),
      ("ex:S", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:item"), ("ex:SP", SH + "node", "ex:ItemShape"),
      ("ex:ItemShape", T, SH + "NodeShape"),
      ("ex:ItemShape", SH + "property", "ex:ItemPrice"),
      ("ex:ItemPrice", SH + "path", "ex:price"),
      ("ex:ItemPrice", SH + "minCount", "1", "literal", XS + "integer")])

case("qualified_min_max",
     [("ex:hand", T, "ex:Hand"),
      ("ex:hand", "ex:digit", "ex:t1"), ("ex:t1", T, "ex:Thumb"),
      ("ex:hand", "ex:digit", "ex:f1"), ("ex:f1", T, "ex:Finger"),
      ("ex:hand2", T, "ex:Hand"),
      ("ex:hand2", "ex:digit", "ex:f2"), ("ex:f2", T, "ex:Finger")],
     [("ex:S", T, SH + "NodeShape"), ("ex:S", SH + "targetClass", "ex:Hand"),
      ("ex:S", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:digit"),
      ("ex:SP", SH + "qualifiedValueShape", "ex:ThumbShape"),
      ("ex:SP", SH + "qualifiedMinCount", "1", "literal", XS + "integer"),
      ("ex:SP", SH + "qualifiedMaxCount", "1", "literal", XS + "integer"),
      ("ex:ThumbShape", T, SH + "NodeShape"),
      ("ex:ThumbShape", SH + "class", "ex:Thumb")])

# ---- other --------------------------------------------------------------------

case("closed_extra_prop",
     [("ex:a", T, "ex:Thing"), ("ex:a", "ex:name", "A", "literal", XS + "string"),
      ("ex:b", T, "ex:Thing"), ("ex:b", "ex:name", "B", "literal", XS + "string"),
      ("ex:b", "ex:extra", "nope", "literal", XS + "string")],
     [("ex:S", T, SH + "NodeShape"), ("ex:S", SH + "targetClass", "ex:Thing"),
      ("ex:S", SH + "closed", "true", "literal", XS + "boolean"),
      ("ex:S", SH + "ignoredProperties", "ex:ig/0"),
      ("ex:S", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:name")]
     + rdf_list("ex:ig", [T]))

case("hasvalue_absent",
     [("ex:a", T, "ex:Thing"), ("ex:a", "ex:status", "ok", "literal", XS + "string"),
      ("ex:b", T, "ex:Thing"), ("ex:b", "ex:status", "bad", "literal", XS + "string")],
     [("ex:S", T, SH + "NodeShape"), ("ex:S", SH + "targetClass", "ex:Thing"),
      ("ex:S", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:status"),
      ("ex:SP", SH + "hasValue", "ok", "literal", XS + "string")])

case("in_list",
     [("ex:a", T, "ex:Thing"), ("ex:a", "ex:color", "red", "literal", XS + "string"),
      ("ex:b", T, "ex:Thing"), ("ex:b", "ex:color", "mauve", "literal", XS + "string")],
     [("ex:S", T, SH + "NodeShape"), ("ex:S", SH + "targetClass", "ex:Thing"),
      ("ex:S", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:color"),
      ("ex:SP", SH + "in", "ex:colors/0")]
     + rdf_list("ex:colors", [("red", "literal", XS + "string"),
                              ("green", "literal", XS + "string"),
                              ("blue", "literal", XS + "string")]))

# ---- paths ---------------------------------------------------------------------

case("paths_inverse_sequence_alternative_zeroormore",
     [("ex:root", T, "ex:Node"),
      ("ex:root", "ex:child", "ex:m"),
      ("ex:m", "ex:child", "ex:leaf1"),
      ("ex:m", "ex:alt", "ex:leaf2"),
      ("ex:leaf1", "ex:label", "L1", "literal", XS + "string"),
      ("ex:leaf2", "ex:label", "L2", "literal", XS + "string"),
      ("ex:orphan", T, "ex:Node")],
     [  # sequence: child/child must exist ≥1 for ex:Node targets
      ("ex:S", T, SH + "NodeShape"), ("ex:S", SH + "targetClass", "ex:Node"),
      ("ex:S", SH + "property", "ex:SSeq"),
      ("ex:SSeq", SH + "path", "ex:seqpath/0"),
      # alternative path child|alt from ex:m — via second target
      ("ex:S2", T, SH + "NodeShape"), ("ex:S2", SH + "targetNode", "ex:m"),
      ("ex:S2", SH + "property", "ex:SAlt"), ("ex:S2", SH + "property", "ex:SStar"),
      ("ex:SAlt", SH + "path", "ex:altnode"),
      ("ex:altnode", SH + "alternativePath", "ex:altlist/0"),
      ("ex:SAlt", SH + "minCount", "2", "literal", XS + "integer"),
      # zeroOrMore: ex:child* from root reaches root,m,leaf1 → minCount 3
      ("ex:SStar", SH + "path", "ex:starnode"),
      ("ex:starnode", SH + "zeroOrMorePath", "ex:child"),
      ("ex:SStar", SH + "maxCount", "2", "literal", XS + "integer"),
      # inverse: ^child from ex:m = root
      ("ex:S3", T, SH + "NodeShape"), ("ex:S3", SH + "targetNode", "ex:m"),
      ("ex:S3", SH + "property", "ex:SInv"),
      ("ex:SInv", SH + "path", "ex:invnode"),
      ("ex:invnode", SH + "inversePath", "ex:child"),
      ("ex:SInv", SH + "minCount", "1", "literal", XS + "integer"),
      ("ex:SSeq", SH + "minCount", "1", "literal", XS + "integer")]
     + rdf_list("ex:seqpath", ["ex:child", "ex:child"])
     + rdf_list("ex:altlist", ["ex:child", "ex:alt"]))

case("targets_subjectsof_objectsof",
     [("ex:a", "ex:knows", "ex:b"),
      ("ex:b", "ex:name", "B", "literal", XS + "string"),
      ("ex:c", "ex:knows", "ex:d")],
     [("ex:S", T, SH + "NodeShape"),
      ("ex:S", SH + "targetObjectsOf", "ex:knows"),
      ("ex:S", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:name"),
      ("ex:SP", SH + "minCount", "1", "literal", XS + "integer"),
      ("ex:S4", T, SH + "NodeShape"),
      ("ex:S4", SH + "targetSubjectsOf", "ex:knows"),
      ("ex:S4", SH + "property", "ex:SP2"),
      ("ex:SP2", SH + "path", "ex:knows"),
      ("ex:SP2", SH + "nodeKind", SH + "IRI")])

case("paths_oneormore_zeroorone",
     [("ex:a", T, "ex:Chain"), ("ex:a", "ex:next", "ex:b"),
      ("ex:b", "ex:next", "ex:c"),
      ("ex:solo", T, "ex:Chain")],
     [("ex:S", T, SH + "NodeShape"), ("ex:S", SH + "targetClass", "ex:Chain"),
      ("ex:S", SH + "property", "ex:SPlus"), ("ex:S", SH + "property", "ex:SOpt"),
      # next+ : ex:a reaches {b,c}; ex:solo reaches {} → minCount 1 violated
      ("ex:SPlus", SH + "path", "ex:plusnode"),
      ("ex:plusnode", SH + "oneOrMorePath", "ex:next"),
      ("ex:SPlus", SH + "minCount", "1", "literal", XS + "integer"),
      # next? : node itself ∪ one hop → maxCount 2 holds everywhere
      ("ex:SOpt", SH + "path", "ex:optnode"),
      ("ex:optnode", SH + "zeroOrOnePath", "ex:next"),
      ("ex:SOpt", SH + "maxCount", "2", "literal", XS + "integer")])

case("deep_subclass_closure",
     [("ex:D", SCO, "ex:C"), ("ex:C", SCO, "ex:B"), ("ex:B", SCO, "ex:A"),
      ("ex:x", T, "ex:D"), ("ex:y", T, "ex:B"), ("ex:z", T, "ex:Other"),
      ("ex:x", "ex:tag", "ok", "literal", XS + "string")],
     [  # target = SHACL instances of ex:A (via 3-level closure): x, y
      ("ex:S", T, SH + "NodeShape"), ("ex:S", SH + "targetClass", "ex:A"),
      ("ex:S", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:tag"),
      ("ex:SP", SH + "minCount", "1", "literal", XS + "integer")])

case("implicit_class_target",
     [("ex:w", T, "ex:ImpShape"),
      ("ex:v", T, "ex:ImpShape"), ("ex:v", "ex:name", "V", "literal", XS + "string")],
     [  # the shape is itself an rdfs:Class → its instances are targets
      ("ex:ImpShape", T, SH + "NodeShape"),
      ("ex:ImpShape", T, RDFS + "Class"),
      ("ex:ImpShape", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:name"),
      ("ex:SP", SH + "minCount", "1", "literal", XS + "integer")])

# ---- severity/deactivated/message ----------------------------------------------

case("severity_deactivated",
     [("ex:a", T, "ex:Thing")],
     [("ex:S", T, SH + "NodeShape"), ("ex:S", SH + "targetClass", "ex:Thing"),
      ("ex:S", SH + "severity", SH + "Warning"),
      ("ex:S", SH + "message", "name required", "literal", XS + "string"),
      ("ex:S", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:name"),
      ("ex:SP", SH + "severity", SH + "Warning"),
      ("ex:SP", SH + "minCount", "1", "literal", XS + "integer"),
      ("ex:SOff", T, SH + "NodeShape"), ("ex:SOff", SH + "targetClass", "ex:Thing"),
      ("ex:SOff", SH + "deactivated", "true", "literal", XS + "boolean"),
      ("ex:SOff", SH + "property", "ex:SPOff"),
      ("ex:SPOff", SH + "path", "ex:never"),
      ("ex:SPOff", SH + "minCount", "5", "literal", XS + "integer")])


# ---- shacl-shacl-style metamodel cases ------------------------------------------
# The metamodel validates shapes-graphs-as-data (SPEC §E): every subject
# of sh:path must have exactly one path; sh:minCount values must be
# integers; every sh:property value must be an IRI with a path.

METAMODEL_SHAPES = [
    (SH + "PropertyShapeShape", T, SH + "NodeShape"),
    (SH + "PropertyShapeShape", SH + "targetSubjectsOf", SH + "path"),
    (SH + "PropertyShapeShape", SH + "property", SH + "PathCount"),
    (SH + "PathCount", SH + "path", SH + "path"),
    (SH + "PathCount", SH + "minCount", "1", "literal", XS + "integer"),
    (SH + "PathCount", SH + "maxCount", "1", "literal", XS + "integer"),
    (SH + "MinCountShape", T, SH + "NodeShape"),
    (SH + "MinCountShape", SH + "targetSubjectsOf", SH + "minCount"),
    (SH + "MinCountShape", SH + "property", SH + "MinCountValue"),
    (SH + "MinCountValue", SH + "path", SH + "minCount"),
    (SH + "MinCountValue", SH + "datatype", XS + "integer"),
    (SH + "NodeShapeShape", T, SH + "NodeShape"),
    (SH + "NodeShapeShape", SH + "targetSubjectsOf", SH + "property"),
    (SH + "NodeShapeShape", SH + "property", SH + "PropertyKind"),
    (SH + "PropertyKind", SH + "path", SH + "property"),
    (SH + "PropertyKind", SH + "nodeKind", SH + "BlankNodeOrIRI"),
]

case("shaclshacl_valid",
     # a well-formed shapes graph as data
     [("ex:MyShape", T, SH + "NodeShape"),
      ("ex:MyShape", SH + "targetClass", "ex:Person"),
      ("ex:MyShape", SH + "property", "ex:MyProp"),
      ("ex:MyProp", SH + "path", "ex:name"),
      ("ex:MyProp", SH + "minCount", "1", "literal", XS + "integer")],
     METAMODEL_SHAPES)

case("shaclshacl_broken",
     # sh:minCount "two" (wrong datatype) + property shape missing sh:path
     [("ex:MyShape", T, SH + "NodeShape"),
      ("ex:MyShape", SH + "property", "ex:BadProp"),
      ("ex:BadProp", SH + "path", "ex:name"),
      ("ex:BadProp", SH + "path", "ex:name2"),
      ("ex:BadProp", SH + "minCount", "two", "literal", XS + "string"),
      ("ex:MyShape", SH + "property", "missing", "literal", XS + "string")],
     METAMODEL_SHAPES)


# ---- regression: full-term identity in conformance/count joins (r02) ---------
# An IRI and a literal with the SAME lexical form are different terms;
# conformance memos and cardinality joins must not conflate them
# (ADVICE r01 medium: engine reported 2 violations vs the oracle's 1).

case("term_identity_conformance",
     [("ex:f", "ex:v", "http://ex/foo"),                       # IRI value
      ("ex:f", "ex:v", "http://ex/foo", "literal", XS + "string")],  # same lexical form
     [("ex:S", T, SH + "NodeShape"),
      ("ex:S", SH + "targetSubjectsOf", "ex:v"),
      ("ex:S", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:v"), ("ex:SP", SH + "node", "ex:IriShape"),
      ("ex:IriShape", T, SH + "NodeShape"),
      ("ex:IriShape", SH + "nodeKind", SH + "IRI")])

case("term_identity_mincount",
     # focus nodes via targetObjectsOf: IRI ex:x (has a p-value) and
     # literal "ex:x" (literals have no outgoing edges → must violate)
     [("ex:a", "ex:ref", "ex:x"),
      ("ex:a", "ex:ref", "ex:x", "literal", XS + "string"),
      ("ex:x", "ex:p", "ex:y")],
     [("ex:S", T, SH + "NodeShape"),
      ("ex:S", SH + "targetObjectsOf", "ex:ref"),
      ("ex:S", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:p"),
      ("ex:SP", SH + "minCount", "1", "literal", XS + "integer")])

# ---- regression: conformance counts results of depth-2 property shapes -------
# SPEC §2.1.1: a node conforms iff validation produces NO results —
# including results whose own focus is a deeper value node.  ex:w's
# p-value ex:u lacks ex:q, so ex:w does NOT conform to ex:A and the
# sh:not is satisfied; ex:w2 (whose p-value has q) conforms → violation.

case("nested_property_conformance_depth2",
     [("ex:f", "ex:v", "ex:w"), ("ex:w", "ex:p", "ex:u"),
      ("ex:f2", "ex:v", "ex:w2"), ("ex:w2", "ex:p", "ex:u2"),
      ("ex:u2", "ex:q", "1", "literal", XS + "integer")],
     [("ex:S", T, SH + "NodeShape"),
      ("ex:S", SH + "targetSubjectsOf", "ex:v"),
      ("ex:S", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:v"), ("ex:SP", SH + "not", "ex:A"),
      ("ex:A", T, SH + "NodeShape"),
      ("ex:A", SH + "property", "ex:AP"),
      ("ex:AP", SH + "path", "ex:p"),
      ("ex:AP", SH + "property", "ex:APQ"),
      ("ex:APQ", SH + "path", "ex:q"),
      ("ex:APQ", SH + "minCount", "1", "literal", XS + "integer")])

# ---- regression: unbounded xsd:integer beyond int64 (ADVICE r01) -------------

case("bigint_integer_datatype",
     [("ex:n", T, "ex:Num"),
      ("ex:n", "ex:v", "18446744073709551616", "literal", XS + "integer"),
      ("ex:m", T, "ex:Num"),
      ("ex:m", "ex:v", "12.5", "literal", XS + "integer")],
     [("ex:S", T, SH + "NodeShape"), ("ex:S", SH + "targetClass", "ex:Num"),
      ("ex:S", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:v"),
      ("ex:SP", SH + "datatype", XS + "integer")])


# ---- SPARQL-based constraints (SPEC §5; r02) ---------------------------------
# solutions of the pre-bound SELECT are violations: persons whose start
# exceeds their end (join via two patterns + numeric FILTER), and
# values failing a regex.

case("sparql_join_filter",
     [("ex:a", T, "ex:Task"),
      ("ex:a", "ex:lo", "5", "literal", XS + "integer"),
      ("ex:a", "ex:hi", "10", "literal", XS + "integer"),
      ("ex:b", T, "ex:Task"),
      ("ex:b", "ex:lo", "9", "literal", XS + "integer"),
      ("ex:b", "ex:hi", "3", "literal", XS + "integer"),
      ("ex:c", T, "ex:Task"),
      ("ex:c", "ex:lo", "2", "literal", XS + "integer")],
     [("ex:S", T, SH + "NodeShape"),
      ("ex:S", SH + "targetClass", "ex:Task"),
      ("ex:S", SH + "sparql", "ex:SQ"),
      ("ex:SQ", SH + "message", "lo exceeds hi", "literal", XS + "string"),
      ("ex:SQ", SH + "select",
       "PREFIX ex: <ex:> SELECT ?this ?value WHERE { "
       "?this ex:lo ?value . ?this ex:hi ?h . FILTER (?value > ?h) }",
       "literal", XS + "string")])

case("sparql_regex_isiri",
     [("ex:a", T, "ex:Doc"), ("ex:a", "ex:code", "AB-12", "literal", XS + "string"),
      ("ex:b", T, "ex:Doc"), ("ex:b", "ex:code", "bad code", "literal", XS + "string"),
      ("ex:c", T, "ex:Doc"), ("ex:c", "ex:code", "ex:notliteral")],
     [("ex:S", T, SH + "NodeShape"),
      ("ex:S", SH + "targetClass", "ex:Doc"),
      ("ex:S", SH + "sparql", "ex:SQ"),
      ("ex:SQ", SH + "select",
       "PREFIX ex: <ex:> SELECT ?this ?value WHERE { "
       "?this ex:code ?value . "
       "FILTER (isIRI(?value) || !regex(str(?value), \"^[A-Z]+-[0-9]+$\")) }",
       "literal", XS + "string")])


# OPTIONAL + bound() (r03): persons WITH a name but WITHOUT a nick
# violate — the optional group leaves ?n unbound and !bound(?n) fires.
case("sparql_optional_bound",
     [("ex:a", T, "ex:Person"),
      ("ex:a", "ex:name", "A", "literal", XS + "string"),
      ("ex:a", "ex:nick", "Ace", "literal", XS + "string"),
      ("ex:b", T, "ex:Person"),
      ("ex:b", "ex:name", "B", "literal", XS + "string"),
      ("ex:c", T, "ex:Person")],
     [("ex:S", T, SH + "NodeShape"),
      ("ex:S", SH + "targetClass", "ex:Person"),
      ("ex:S", SH + "sparql", "ex:SQ"),
      ("ex:SQ", SH + "select",
       "PREFIX ex: <ex:> SELECT ?this ?value WHERE { "
       "?this ex:name ?value . OPTIONAL { ?this ex:nick ?n } "
       "FILTER (!bound(?n)) }",
       "literal", XS + "string")])

# comparison over an unbound optional var is a SPARQL type error →
# false: only the literal-"x" alias fires, not the IRI ex:x, not the
# alias-less person.
case("sparql_optional_compare",
     [("ex:a", T, "ex:Item"), ("ex:a", "ex:alias", "x", "literal", XS + "string"),
      ("ex:b", T, "ex:Item"), ("ex:b", "ex:alias", "ex:x"),
      ("ex:c", T, "ex:Item")],
     [("ex:S", T, SH + "NodeShape"),
      ("ex:S", SH + "targetClass", "ex:Item"),
      ("ex:S", SH + "sparql", "ex:SQ"),
      ("ex:SQ", SH + "select",
       'PREFIX ex: <ex:> SELECT ?this WHERE { '
       '?this a ex:Item . OPTIONAL { ?this ex:alias ?a } '
       'FILTER (?a = "x") }',
       "literal", XS + "string")])

# $PATH substitution (SPEC §5.3.3, r03): the standard shacl-shacl idiom
# `$this $PATH ?value` on a PROPERTY shape — due dates below 10 violate.
case("sparql_path_substitution",
     [("ex:a", T, "ex:Task"), ("ex:a", "ex:due", "20", "literal", XS + "integer"),
      ("ex:b", T, "ex:Task"), ("ex:b", "ex:due", "5", "literal", XS + "integer"),
      ("ex:c", T, "ex:Task")],
     [("ex:S", T, SH + "NodeShape"),
      ("ex:S", SH + "targetClass", "ex:Task"),
      ("ex:S", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:due"),
      ("ex:SP", SH + "sparql", "ex:SQ"),
      ("ex:SQ", SH + "select",
       "SELECT ?this ?value WHERE { $this $PATH ?value . FILTER (?value < 10) }",
       "literal", XS + "string")])


# SPARQL term equality (r03 ADVICE): `=` compares FULL terms, so the
# IRI ex:gold, the plain literal "ex:gold", and "gold"@en vs "gold" are
# all DIFFERENT — only ex:a (the genuine literal "gold") violates.
case("sparql_term_equality",
     [("ex:a", T, "ex:Item"), ("ex:a", "ex:tier", "gold", "literal", XS + "string"),
      ("ex:b", T, "ex:Item"), ("ex:b", "ex:tier", "ex:gold"),
      ("ex:c", T, "ex:Item"),
      ("ex:c", "ex:tier", "gold", "literal", RDF + "langString", "en")],
     [("ex:S", T, SH + "NodeShape"),
      ("ex:S", SH + "targetClass", "ex:Item"),
      ("ex:S", SH + "sparql", "ex:SQ"),
      ("ex:SQ", SH + "select",
       'PREFIX ex: <ex:> SELECT ?this ?value WHERE { '
       '?this ex:tier ?value . FILTER (?value = "gold") }',
       "literal", XS + "string")])


# ---- blank-node subjects traverse paths (r02, Turtle ingestion) ---------------
# _:b1 has ex:q; _:b2 lacks it — the bnode focus (via targetObjectsOf)
# must be traversed, and the missing-q bnode must violate minCount.

case("bnode_subject_paths",
     [("ex:a", "ex:p", "_:b1", "bnode"),
      ("_:b1", "ex:q", "5", "literal", XS + "integer"),
      ("ex:c", "ex:p", "_:b2", "bnode"),
      ("_:b2", "ex:r", "ex:z")],
     [("ex:S", T, SH + "NodeShape"),
      ("ex:S", SH + "targetObjectsOf", "ex:p"),
      ("ex:S", SH + "property", "ex:SP"),
      ("ex:SP", SH + "path", "ex:q"),
      ("ex:SP", SH + "minCount", "1", "literal", XS + "integer")])


# ---- FILTER EXISTS / NOT EXISTS (r04, VERDICT r03 next-round #5) --------------
# EXISTS is a semi-join, NOT EXISTS an anti-join; vars inside the group
# are locally scoped (?m, ?city never escape).

# flag employees whose manager-chain head is untracked: ?this reportsTo
# someone who reports to no one themselves
case("sparql_not_exists",
     [("ex:a", T, "ex:Emp"), ("ex:a", "ex:reportsTo", "ex:m1"),
      ("ex:m1", "ex:reportsTo", "ex:ceo"),
      ("ex:b", T, "ex:Emp"), ("ex:b", "ex:reportsTo", "ex:m2"),
      ("ex:c", T, "ex:Emp")],
     [("ex:S", T, SH + "NodeShape"),
      ("ex:S", SH + "targetClass", "ex:Emp"),
      ("ex:S", SH + "sparql", "ex:SQ"),
      ("ex:SQ", SH + "select",
       "PREFIX ex: <ex:> SELECT ?this ?value WHERE { "
       "?this ex:reportsTo ?value . "
       "FILTER NOT EXISTS { ?value ex:reportsTo ?up } }",
       "literal", XS + "string")])

# both quantifiers in one query: named items pointing at an orphan
# (EXISTS gates on a name; NOT EXISTS demands the target lacks a type)
case("sparql_exists_and_not_exists",
     [("ex:a", T, "ex:Item"), ("ex:a", "ex:name", "A", "literal", XS + "string"),
      ("ex:a", "ex:ref", "ex:t1"),
      ("ex:b", T, "ex:Item"), ("ex:b", "ex:ref", "ex:t2"),
      ("ex:c", T, "ex:Item"), ("ex:c", "ex:name", "C", "literal", XS + "string"),
      ("ex:c", "ex:ref", "ex:t3"), ("ex:t3", T, "ex:Target")],
     [("ex:S", T, SH + "NodeShape"),
      ("ex:S", SH + "targetClass", "ex:Item"),
      ("ex:S", SH + "sparql", "ex:SQ"),
      ("ex:SQ", SH + "select",
       "PREFIX ex: <ex:> SELECT ?this ?value WHERE { "
       "?this ex:ref ?value . "
       "FILTER EXISTS { ?this ex:name ?n } "
       "FILTER NOT EXISTS { ?value a ?t } }",
       "literal", XS + "string")])

# EXISTS whose group chains two hops through a LOCAL var (?k stays
# inside): focus knows someone who manages someone
case("sparql_exists_chain",
     [("ex:a", T, "ex:Peer"), ("ex:a", "ex:knows", "ex:k1"),
      ("ex:k1", "ex:managerOf", "ex:z"),
      ("ex:b", T, "ex:Peer"), ("ex:b", "ex:knows", "ex:k2"),
      ("ex:c", T, "ex:Peer")],
     [("ex:S", T, SH + "NodeShape"),
      ("ex:S", SH + "targetClass", "ex:Peer"),
      ("ex:S", SH + "sparql", "ex:SQ"),
      ("ex:SQ", SH + "select",
       "PREFIX ex: <ex:> SELECT ?this WHERE { "
       "?this a ex:Peer . "
       "FILTER EXISTS { ?this ex:knows ?k . ?k ex:managerOf ?m } }",
       "literal", XS + "string")])

# ---- aggregation (r05, VERDICT r04 #5): the cardinality-over-join
# shape — GROUP BY ?this + COUNT/HAVING.  a has 3 emails (flagged,
# value = the count literal), b has 2 (clean), c has none (no solution).
case("sparql_agg_count_having",
     [("ex:a", T, "ex:Acct"),
      ("ex:a", "ex:email", "a1@x", "literal", XS + "string"),
      ("ex:a", "ex:email", "a2@x", "literal", XS + "string"),
      ("ex:a", "ex:email", "a3@x", "literal", XS + "string"),
      ("ex:b", T, "ex:Acct"),
      ("ex:b", "ex:email", "b1@x", "literal", XS + "string"),
      ("ex:b", "ex:email", "b2@x", "literal", XS + "string"),
      ("ex:c", T, "ex:Acct")],
     [("ex:S", T, SH + "NodeShape"),
      ("ex:S", SH + "targetClass", "ex:Acct"),
      ("ex:S", SH + "sparql", "ex:SQ"),
      ("ex:SQ", SH + "select",
       "PREFIX ex: <ex:> SELECT ?this (COUNT(?m) AS ?value) WHERE { "
       "?this ex:email ?m . } GROUP BY ?this HAVING (COUNT(?m) > 2)",
       "literal", XS + "string")])

# SUM with a malformed numeric (skipped, SPARQL error-value behavior)
# and an all-error group (alias unbound -> HAVING false): a sums to 11
# (flagged), b to 5 (clean), c has only "abc" (unbound sum, clean),
# d has 9 + "x" (9, clean)
case("sparql_agg_sum_having",
     [("ex:a", T, "ex:Cart"),
      ("ex:a", "ex:qty", "6", "literal", XS + "integer"),
      ("ex:a", "ex:qty", "5", "literal", XS + "integer"),
      ("ex:b", T, "ex:Cart"),
      ("ex:b", "ex:qty", "3", "literal", XS + "integer"),
      ("ex:b", "ex:qty", "2", "literal", XS + "integer"),
      ("ex:c", T, "ex:Cart"),
      ("ex:c", "ex:qty", "abc", "literal", XS + "integer"),
      ("ex:d", T, "ex:Cart"),
      ("ex:d", "ex:qty", "9", "literal", XS + "integer"),
      ("ex:d", "ex:qty", "x", "literal", XS + "integer")],
     [("ex:S", T, SH + "NodeShape"),
      ("ex:S", SH + "targetClass", "ex:Cart"),
      ("ex:S", SH + "sparql", "ex:SQ"),
      ("ex:SQ", SH + "select",
       "PREFIX ex: <ex:> SELECT ?this (SUM(?q) AS ?value) WHERE { "
       "?this ex:qty ?q . } GROUP BY ?this HAVING (SUM(?q) >= 10)",
       "literal", XS + "string")])

# COUNT(*) over a two-hop join with a WHERE-level FILTER applied
# BEFORE grouping; HAVING with && combinator
case("sparql_agg_count_star_join",
     [("ex:a", T, "ex:Team"),
      ("ex:a", "ex:member", "ex:m1"), ("ex:m1", "ex:age", "30", "literal", XS + "integer"),
      ("ex:a", "ex:member", "ex:m2"), ("ex:m2", "ex:age", "40", "literal", XS + "integer"),
      ("ex:a", "ex:member", "ex:m3"), ("ex:m3", "ex:age", "15", "literal", XS + "integer"),
      ("ex:b", T, "ex:Team"),
      ("ex:b", "ex:member", "ex:m4"), ("ex:m4", "ex:age", "50", "literal", XS + "integer"),
      ("ex:c", T, "ex:Team")],
     [("ex:S", T, SH + "NodeShape"),
      ("ex:S", SH + "targetClass", "ex:Team"),
      ("ex:S", SH + "sparql", "ex:SQ"),
      ("ex:SQ", SH + "select",
       "PREFIX ex: <ex:> SELECT ?this (COUNT(*) AS ?value) WHERE { "
       "?this ex:member ?m . ?m ex:age ?g . FILTER (?g >= 18) } "
       "GROUP BY ?this HAVING (COUNT(*) >= 2 && COUNT(*) < 5)",
       "literal", XS + "string")])

# anchor-less EXISTS (ADVICE r04): the group shares NO variable with
# the outer query — a constant existence test deciding keep-all vs
# drop-all.  Here a global 'frozen' flag suppresses every violation.
case("sparql_exists_anchorless",
     [("ex:a", T, "ex:Node"), ("ex:a", "ex:bad", "1", "literal", XS + "string"),
      ("ex:b", T, "ex:Node"),
      ("ex:sys", "ex:frozen", "true", "literal", XS + "string")],
     [("ex:S", T, SH + "NodeShape"),
      ("ex:S", SH + "targetClass", "ex:Node"),
      ("ex:S", SH + "sparql", "ex:SQ"),
      ("ex:SQ", SH + "select",
       "PREFIX ex: <ex:> SELECT ?this WHERE { "
       "?this ex:bad ?v . "
       "FILTER NOT EXISTS { ?x ex:frozen ?f } }",
       "literal", XS + "string")])

# the positive twin over data WITHOUT the flag: EXISTS on an absent
# anchor-less group drops every solution
case("sparql_exists_anchorless_empty",
     [("ex:a", T, "ex:Node"), ("ex:a", "ex:bad", "1", "literal", XS + "string")],
     [("ex:S", T, SH + "NodeShape"),
      ("ex:S", SH + "targetClass", "ex:Node"),
      ("ex:S", SH + "sparql", "ex:SQ"),
      ("ex:SQ", SH + "select",
       "PREFIX ex: <ex:> SELECT ?this WHERE { "
       "?this ex:bad ?v . "
       "FILTER EXISTS { ?x ex:frozen ?f } }",
       "literal", XS + "string")])

# ---- UNION (r04): arms may bind different vars/kinds; a solution
# comes from ANY arm; vars missing from the matching arm stay unbound.
case("sparql_union",
     [("ex:a", T, "ex:Acct"), ("ex:a", "ex:email", "a@x", "literal", XS + "string"),
      ("ex:b", T, "ex:Acct"), ("ex:b", "ex:phone", "555", "literal", XS + "string"),
      ("ex:c", T, "ex:Acct"),
      ("ex:d", T, "ex:Acct"), ("ex:d", "ex:email", "d@x", "literal", XS + "string"),
      ("ex:d", "ex:phone", "556", "literal", XS + "string")],
     [("ex:S", T, SH + "NodeShape"),
      ("ex:S", SH + "targetClass", "ex:Acct"),
      ("ex:S", SH + "sparql", "ex:SQ"),
      ("ex:SQ", SH + "select",
       "PREFIX ex: <ex:> SELECT ?this ?value WHERE { "
       "{ ?this ex:email ?value } UNION { ?this ex:phone ?value } }",
       "literal", XS + "string")])

# UNION + FILTER over a var only ONE arm binds: comparing the unbound
# var in the other arm's solutions is a type error -> false, so only
# the email arm can fire, and only for flagged addresses.
case("sparql_union_filter",
     [("ex:a", T, "ex:Acct"), ("ex:a", "ex:email", "spam@x", "literal", XS + "string"),
      ("ex:b", T, "ex:Acct"), ("ex:b", "ex:phone", "spam@x", "literal", XS + "string"),
      ("ex:c", T, "ex:Acct"), ("ex:c", "ex:email", "ok@x", "literal", XS + "string")],
     [("ex:S", T, SH + "NodeShape"),
      ("ex:S", SH + "targetClass", "ex:Acct"),
      ("ex:S", SH + "sparql", "ex:SQ"),
      ("ex:SQ", SH + "select",
       "PREFIX ex: <ex:> SELECT ?this ?value WHERE { "
       "{ ?this ex:email ?e } UNION { ?this ex:phone ?p } . "
       'FILTER (?e = "spam@x") }',
       "literal", XS + "string")])

# ---- textual statement order (r04 review): an OPTIONAL-bound var
# consumed by a LATER union must see the binding (and a solution whose
# optional failed joins the union arms on NULL -> no extension).
case("sparql_optional_then_union",
     [("ex:a", T, "ex:Node"), ("ex:a", "ex:p", "ex:v1"),
      ("ex:v1", "ex:x", "1", "literal", XS + "string"),
      ("ex:b", T, "ex:Node"),
      ("ex:c", T, "ex:Node"), ("ex:c", "ex:p", "ex:v3"),
      ("ex:v3", "ex:y", "2", "literal", XS + "string")],
     [("ex:S", T, SH + "NodeShape"),
      ("ex:S", SH + "targetClass", "ex:Node"),
      ("ex:S", SH + "sparql", "ex:SQ"),
      ("ex:SQ", SH + "select",
       "PREFIX ex: <ex:> SELECT ?this ?value WHERE { "
       "?this a ex:Node . OPTIONAL { ?this ex:p ?v } "
       "{ ?v ex:x ?value } UNION { ?v ex:y ?value } }",
       "literal", XS + "string")])

# EXISTS over a var only ONE union arm binds (r04 review #3): arm-1
# solutions leave ?w unbound -> EXISTS false; arm-2 solutions survive
# iff their ?w has the ex:c edge.
case("sparql_union_exists",
     [("ex:a", T, "ex:T"), ("ex:a", "ex:pa", "x", "literal", XS + "string"),
      ("ex:b", T, "ex:T"), ("ex:b", "ex:pb", "ex:w1"),
      ("ex:w1", "ex:c", "ex:z"),
      ("ex:c", T, "ex:T"), ("ex:c", "ex:pb", "ex:w2")],
     [("ex:S", T, SH + "NodeShape"),
      ("ex:S", SH + "targetClass", "ex:T"),
      ("ex:S", SH + "sparql", "ex:SQ"),
      ("ex:SQ", SH + "select",
       "PREFIX ex: <ex:> SELECT ?this WHERE { "
       "{ ?this ex:pa ?value } UNION { ?this ex:pb ?w } . "
       "FILTER EXISTS { ?w ex:c ?z } }",
       "literal", XS + "string")])
