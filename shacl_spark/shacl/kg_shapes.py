"""SHACL metamodel for the extracted knowledge graph — the shapes the
pipeline validates its own output against (BASELINE.json:6: minCount/
maxCount cardinality, class/datatype, sh:node conformance).

Triple-encoded (parser input rows); driver-sized.
"""

from __future__ import annotations

from shacl_spark.functions.terms import KG, RDF, SH, XSD

T = RDF + "type"
XS = XSD

# every kg:File: exactly one sha256 (string), exactly one lang, ≥1 inRepo IRI;
# every kg:Class / kg:Function: exactly one name, defined by some file
# (inverse path), and definers must conform to the File shape (sh:node).
KG_METAMODEL: list[tuple] = [
    (KG + "FileShape", T, SH + "NodeShape"),
    (KG + "FileShape", SH + "targetClass", KG + "File"),
    (KG + "FileShape", SH + "property", KG + "FileSha"),
    (KG + "FileShape", SH + "property", KG + "FileLang"),
    (KG + "FileShape", SH + "property", KG + "FileRepo"),
    (KG + "FileSha", SH + "path", KG + "sha256"),
    (KG + "FileSha", SH + "minCount", "1", "literal", XS + "integer"),
    (KG + "FileSha", SH + "maxCount", "1", "literal", XS + "integer"),
    (KG + "FileSha", SH + "datatype", XS + "string"),
    (KG + "FileSha", SH + "pattern", "^[0-9a-f]{64}$", "literal", XS + "string"),
    (KG + "FileLang", SH + "path", KG + "lang"),
    (KG + "FileLang", SH + "minCount", "1", "literal", XS + "integer"),
    (KG + "FileLang", SH + "in", KG + "langs/0"),
    (KG + "langs/0", RDF + "first", "python", "literal", XS + "string"),
    (KG + "langs/0", RDF + "rest", KG + "langs/1"),
    (KG + "langs/1", RDF + "first", "javascript", "literal", XS + "string"),
    (KG + "langs/1", RDF + "rest", RDF + "nil"),
    (KG + "FileRepo", SH + "path", KG + "inRepo"),
    (KG + "FileRepo", SH + "minCount", "1", "literal", XS + "integer"),
    (KG + "FileRepo", SH + "nodeKind", SH + "IRI"),
    # symbols
    (KG + "SymbolShape", T, SH + "NodeShape"),
    (KG + "SymbolShape", SH + "targetClass", KG + "Class"),
    (KG + "SymbolShape", SH + "targetClass", KG + "Function"),
    (KG + "SymbolShape", SH + "property", KG + "SymName"),
    (KG + "SymbolShape", SH + "property", KG + "SymDefiner"),
    (KG + "SymName", SH + "path", KG + "name"),
    (KG + "SymName", SH + "minCount", "1", "literal", XS + "integer"),
    (KG + "SymName", SH + "datatype", XS + "string"),
    (KG + "SymDefiner", SH + "path", KG + "definer"),
    (KG + "definer", SH + "inversePath", KG + "defines"),
    (KG + "SymDefiner", SH + "minCount", "1", "literal", XS + "integer"),
    (KG + "SymDefiner", SH + "node", KG + "FileShape"),
]
