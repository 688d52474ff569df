#!/usr/bin/env python
"""W3C-SHACL-test-suite-style Turtle battery (VERDICT r02 "Next round"
#3): one directory per case under fixtures/ttl/battery/, each holding
real data.ttl + shapes.ttl + expected.ttl files, spec-example shaped
(SPEC §2-§4 constraint walkthroughs).  expected.ttl is a
sh:ValidationReport graph; the comparison (tests/test_ttl_battery.py)
is structural — result descriptors modulo result-node naming, exactly
how the W3C data-shapes suite compares reports modulo bnode
isomorphism.

Regenerate with:  python fixtures/make_ttl_battery.py
"""

from __future__ import annotations

import os
import shutil

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ttl", "battery")

PROLOGUE = """\
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix ex: <ex:> .

"""

# name -> (data body, shapes body, [result descriptor], conforms)
# a descriptor is a dict of Turtle term strings: focus, component
# (required), path/value/severity/message (optional; severity defaults
# to sh:Violation)
CASES: dict[str, tuple[str, str, list[dict]]] = {}


def case(name: str, data: str, shapes: str, results: list[dict]):
    CASES[name] = (data, shapes, results)


# --- §4.2 cardinality ---------------------------------------------------------

case("01_mincount", """
ex:alice a ex:Person ; ex:name "Alice" .
ex:bob a ex:Person .
""", """
ex:PersonShape a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
""", [dict(focus="ex:bob", path="ex:name",
           component="sh:MinCountConstraintComponent")])

case("02_maxcount", """
ex:alice a ex:Person ; ex:email "a@x.org" .
ex:bob a ex:Person ; ex:email "b@x.org", "b2@x.org" .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:email ; sh:maxCount 1 ] .
""", [dict(focus="ex:bob", path="ex:email",
           component="sh:MaxCountConstraintComponent")])

# --- §4.1 value type ----------------------------------------------------------

case("03_datatype", """
ex:alice a ex:Person ; ex:age 30 .
ex:bob a ex:Person ; ex:age "thirty" .
ex:carol a ex:Person ; ex:age "12" .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:age ; sh:datatype xsd:integer ] .
""", [dict(focus="ex:bob", path="ex:age", value='"thirty"',
           component="sh:DatatypeConstraintComponent"),
      dict(focus="ex:carol", path="ex:age", value='"12"',
           component="sh:DatatypeConstraintComponent")])

case("04_class", """
ex:alice a ex:Person ; ex:knows ex:bob, ex:rock .
ex:bob a ex:Person .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:knows ; sh:class ex:Person ] .
""", [dict(focus="ex:alice", path="ex:knows", value="ex:rock",
           component="sh:ClassConstraintComponent")])

case("05_class_subclass", """
ex:Student rdfs:subClassOf ex:Person .
ex:alice a ex:Person ; ex:knows ex:carol, ex:dave .
ex:carol a ex:Student .
ex:dave a ex:Dog .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:knows ; sh:class ex:Person ] .
""", [dict(focus="ex:alice", path="ex:knows", value="ex:dave",
           component="sh:ClassConstraintComponent")])

case("06_class_typed_bnode", """
ex:alice a ex:Person ; ex:knows [ a ex:Person ] .
ex:bob a ex:Person ; ex:knows ex:rock .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:knows ; sh:class ex:Person ] .
""", [dict(focus="ex:bob", path="ex:knows", value="ex:rock",
           component="sh:ClassConstraintComponent")])

case("07_nodekind_iri", """
ex:alice a ex:Person ; ex:homepage <http://a.example/> .
ex:bob a ex:Person ; ex:homepage "not-an-iri" .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:homepage ; sh:nodeKind sh:IRI ] .
""", [dict(focus="ex:bob", path="ex:homepage", value='"not-an-iri"',
           component="sh:NodeKindConstraintComponent")])

case("08_nodekind_literal", """
ex:alice a ex:Person ; ex:label "fine" .
ex:bob a ex:Person ; ex:label ex:thing .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:label ; sh:nodeKind sh:Literal ] .
""", [dict(focus="ex:bob", path="ex:label", value="ex:thing",
           component="sh:NodeKindConstraintComponent")])

# --- §4.3 value range ---------------------------------------------------------

case("09_range", """
ex:alice a ex:Person ; ex:age 44 .
ex:bob a ex:Person ; ex:age 17 .
ex:carol a ex:Person ; ex:age 65 .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:age ;
                sh:minInclusive 18 ; sh:maxExclusive 65 ] .
""", [dict(focus="ex:bob", path="ex:age", value='"17"',
           component="sh:MinInclusiveConstraintComponent"),
      dict(focus="ex:carol", path="ex:age", value='"65"',
           component="sh:MaxExclusiveConstraintComponent")])

# --- §4.4 string-based --------------------------------------------------------

case("10_minmaxlength", """
ex:a a ex:Item ; ex:code "abcd" .
ex:b a ex:Item ; ex:code "ab" .
ex:c a ex:Item ; ex:code "abcdef" .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Item ;
  sh:property [ sh:path ex:code ; sh:minLength 3 ; sh:maxLength 5 ] .
""", [dict(focus="ex:b", path="ex:code", value='"ab"',
           component="sh:MinLengthConstraintComponent"),
      dict(focus="ex:c", path="ex:code", value='"abcdef"',
           component="sh:MaxLengthConstraintComponent")])

case("11_pattern", """
ex:alice a ex:Person ; ex:ssn "123-45-6789" .
ex:bob a ex:Person ; ex:ssn "12-3456" .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:ssn ;
                sh:pattern "^[0-9]{3}-[0-9]{2}-[0-9]{4}$" ] .
""", [dict(focus="ex:bob", path="ex:ssn", value='"12-3456"',
           component="sh:PatternConstraintComponent")])

case("12_languagein", """
ex:a a ex:Doc ; ex:label "Hello"@en .
ex:b a ex:Doc ; ex:label "Hallo"@de .
ex:c a ex:Doc ; ex:label "plain" .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Doc ;
  sh:property [ sh:path ex:label ; sh:languageIn ( "en" "fr" ) ] .
""", [dict(focus="ex:b", path="ex:label", value='"Hallo"@de',
           component="sh:LanguageInConstraintComponent"),
      dict(focus="ex:c", path="ex:label", value='"plain"',
           component="sh:LanguageInConstraintComponent")])

case("13_uniquelang", """
ex:a a ex:Doc ; ex:label "One"@en .
ex:b a ex:Doc ; ex:label "Two"@en, "Three"@en .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Doc ;
  sh:property [ sh:path ex:label ; sh:uniqueLang true ] .
""", [dict(focus="ex:b", path="ex:label",
           component="sh:UniqueLangConstraintComponent")])

# --- §4.5 property pairs ------------------------------------------------------

case("14_equals", """
ex:alice a ex:Person ; ex:firstName "Ann" ; ex:givenName "Ann" .
ex:bob a ex:Person ; ex:firstName "Bo" ; ex:givenName "Bob" .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:firstName ; sh:equals ex:givenName ] .
""", [dict(focus="ex:bob", path="ex:firstName", value='"Bo"',
           component="sh:EqualsConstraintComponent"),
      dict(focus="ex:bob", path="ex:firstName", value='"Bob"',
           component="sh:EqualsConstraintComponent")])

case("15_disjoint", """
ex:alice a ex:Person ; ex:nick "Al" ; ex:name "Alice" .
ex:bob a ex:Person ; ex:nick "Bob" ; ex:name "Bob" .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:nick ; sh:disjoint ex:name ] .
""", [dict(focus="ex:bob", path="ex:nick", value='"Bob"',
           component="sh:DisjointConstraintComponent")])

case("16_lessthan", """
ex:alice a ex:Event ; ex:start 1 ; ex:end 5 .
ex:bob a ex:Event ; ex:start 7 ; ex:end 3 .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Event ;
  sh:property [ sh:path ex:start ; sh:lessThan ex:end ] .
""", [dict(focus="ex:bob", path="ex:start", value='"7"',
           component="sh:LessThanConstraintComponent")])

case("17_lessthanorequals", """
ex:b a ex:Range ; ex:min 7 ; ex:max 7 .
ex:c a ex:Range ; ex:min 9 ; ex:max 2 .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Range ;
  sh:property [ sh:path ex:min ; sh:lessThanOrEquals ex:max ] .
""", [dict(focus="ex:c", path="ex:min", value='"9"',
           component="sh:LessThanOrEqualsConstraintComponent")])

# --- §4.6 logical -------------------------------------------------------------

case("18_not", """
ex:alice a ex:User ; ex:status "active" .
ex:bob a ex:User ; ex:status "banned" .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:User ;
  sh:property [ sh:path ex:status ; sh:not [ sh:hasValue "banned" ] ] .
""", [dict(focus="ex:bob", path="ex:status", value='"banned"',
           component="sh:NotConstraintComponent")])

case("19_and", """
ex:alice a ex:Person ; ex:age 30 .
ex:bob a ex:Person ; ex:age 15 .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:age ;
                sh:and ( [ sh:datatype xsd:integer ]
                         [ sh:minInclusive 18 ] ) ] .
""", [dict(focus="ex:bob", path="ex:age", value='"15"',
           component="sh:AndConstraintComponent")])

case("20_or", """
ex:alice a ex:Person ; ex:contact "mail@x.org" .
ex:carol a ex:Person ; ex:contact ex:carolPage .
ex:bob a ex:Person ; ex:contact 42 .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:contact ;
                sh:or ( [ sh:datatype xsd:string ]
                        [ sh:nodeKind sh:IRI ] ) ] .
""", [dict(focus="ex:bob", path="ex:contact", value='"42"',
           component="sh:OrConstraintComponent")])

case("21_xone", """
ex:alice a ex:Person ; ex:id "ab" .
ex:bob a ex:Person ; ex:id 7 .
ex:carol a ex:Person ; ex:id "abc" .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:id ;
                sh:xone ( [ sh:datatype xsd:integer ]
                          [ sh:maxLength 2 ] ) ] .
""", [dict(focus="ex:bob", path="ex:id", value='"7"',
           component="sh:XoneConstraintComponent"),
      dict(focus="ex:carol", path="ex:id", value='"abc"',
           component="sh:XoneConstraintComponent")])

# --- §4.7 shape-based ---------------------------------------------------------

case("22_node", """
ex:alice a ex:Person ; ex:address ex:addrA .
ex:addrA ex:zip "12345" .
ex:bob a ex:Person ; ex:address ex:addrB .
ex:addrB ex:street "Elm" .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:address ; sh:node ex:AddrShape ] .
ex:AddrShape a sh:NodeShape ;
  sh:property [ sh:path ex:zip ; sh:minCount 1 ] .
""", [dict(focus="ex:bob", path="ex:address", value="ex:addrB",
           component="sh:NodeConstraintComponent")])

case("23_property_nested", """
ex:alice a ex:Person ; ex:address ex:addrA .
ex:addrA ex:city "Paris" .
ex:bob a ex:Person ; ex:address ex:addrB .
ex:addrB ex:street "Elm" .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:address ;
                sh:property [ sh:path ex:city ; sh:minCount 1 ] ] .
""", [dict(focus="ex:addrB", path="ex:city",
           component="sh:MinCountConstraintComponent")])

case("24_qualifiedmin", """
ex:team1 a ex:Team ; ex:member ex:p1, ex:p2 .
ex:team2 a ex:Team ; ex:member ex:p3, ex:dog1 .
ex:p1 a ex:Person . ex:p2 a ex:Person . ex:p3 a ex:Person .
ex:dog1 a ex:Dog .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Team ;
  sh:property [ sh:path ex:member ;
                sh:qualifiedValueShape [ sh:class ex:Person ] ;
                sh:qualifiedMinCount 2 ] .
""", [dict(focus="ex:team2", path="ex:member",
           component="sh:QualifiedMinCountConstraintComponent")])

case("25_qualifiedmax", """
ex:team1 a ex:Team ; ex:member ex:m1, ex:p1 .
ex:team2 a ex:Team ; ex:member ex:m1, ex:m2 .
ex:m1 a ex:Manager . ex:m2 a ex:Manager . ex:p1 a ex:Person .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Team ;
  sh:property [ sh:path ex:member ;
                sh:qualifiedValueShape [ sh:class ex:Manager ] ;
                sh:qualifiedMaxCount 1 ] .
""", [dict(focus="ex:team2", path="ex:member",
           component="sh:QualifiedMaxCountConstraintComponent")])

# --- §4.8 closed --------------------------------------------------------------

case("26_closed", """
ex:p1 a ex:Point ; ex:x 1 ; ex:y 2 .
ex:p2 a ex:Point ; ex:x 1 ; ex:y 2 ; ex:z 3 .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Point ;
  sh:closed true ; sh:ignoredProperties ( rdf:type ) ;
  sh:property [ sh:path ex:x ] ;
  sh:property [ sh:path ex:y ] .
""", [dict(focus="ex:p2", path="ex:z", value='"3"',
           component="sh:ClosedConstraintComponent")])

# --- §4.1 hasValue / in -------------------------------------------------------

case("27_hasvalue", """
ex:alice a ex:User ; ex:role "admin", "dev" .
ex:bob a ex:User ; ex:role "dev" .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:User ;
  sh:property [ sh:path ex:role ; sh:hasValue "admin" ] .
""", [dict(focus="ex:bob", path="ex:role",
           component="sh:HasValueConstraintComponent")])

case("28_in", """
ex:a a ex:Item ; ex:color "red" .
ex:b a ex:Item ; ex:color "yellow" .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Item ;
  sh:property [ sh:path ex:color ; sh:in ( "red" "green" "blue" ) ] .
""", [dict(focus="ex:b", path="ex:color", value='"yellow"',
           component="sh:InConstraintComponent")])

# --- §2.1.3 targets -----------------------------------------------------------

case("29_targetnode", """
ex:special a ex:Thing .
ex:other a ex:Thing ; ex:name "named" .
""", """
ex:S a sh:NodeShape ; sh:targetNode ex:special ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
""", [dict(focus="ex:special", path="ex:name",
           component="sh:MinCountConstraintComponent")])

case("30_target_subjects_objects", """
ex:a ex:knows ex:b .
ex:b ex:name "B" .
ex:c ex:knows "lit" .
""", """
ex:S1 a sh:NodeShape ; sh:targetSubjectsOf ex:knows ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
ex:S2 a sh:NodeShape ; sh:targetObjectsOf ex:knows ;
  sh:nodeKind sh:IRI .
""", [dict(focus="ex:a", path="ex:name",
           component="sh:MinCountConstraintComponent"),
      dict(focus="ex:c", path="ex:name",
           component="sh:MinCountConstraintComponent"),
      dict(focus='"lit"', value='"lit"',
           component="sh:NodeKindConstraintComponent")])

# --- §2.3.1 property paths ----------------------------------------------------

case("31_path_inverse", """
ex:emp1 a ex:Employee . ex:emp2 a ex:Employee .
ex:mgr ex:managerOf ex:emp1 .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Employee ;
  sh:property [ sh:path [ sh:inversePath ex:managerOf ] ;
                sh:minCount 1 ] .
""", [dict(focus="ex:emp2", path='"^ex:managerOf"',
           component="sh:MinCountConstraintComponent")])

case("32_path_sequence", """
ex:a a ex:Person ; ex:worksFor ex:org1 .
ex:org1 ex:city ex:paris .
ex:b a ex:Person ; ex:worksFor ex:org2 .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ( ex:worksFor ex:city ) ; sh:minCount 1 ] .
""", [dict(focus="ex:b", path='"ex:worksFor/ex:city"',
           component="sh:MinCountConstraintComponent")])

case("33_path_alternative", """
ex:a a ex:Person ; ex:phone "123" .
ex:b a ex:Person ; ex:fax "456" .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path [ sh:alternativePath ( ex:phone ex:email ) ] ;
                sh:minCount 1 ] .
""", [dict(focus="ex:b", path='"ex:phone|ex:email"',
           component="sh:MinCountConstraintComponent")])

case("34_path_zeroormore", """
ex:Dept rdfs:subClassOf ex:Org .
ex:d1 a ex:Dept ; ex:partOf ex:o1 .
ex:o1 a ex:Org .
ex:d2 a ex:Dept ; ex:partOf ex:cityX .
ex:cityX a ex:City .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Dept ;
  sh:property [ sh:path [ sh:zeroOrMorePath ex:partOf ] ;
                sh:class ex:Org ] .
""", [dict(focus="ex:d2", path='"(ex:partOf)*"', value="ex:cityX",
           component="sh:ClassConstraintComponent")])

case("35_path_oneormore", """
ex:e1 a ex:Emp ; ex:reportsTo ex:e2 .
ex:e2 a ex:Emp ; ex:reportsTo ex:e1 .
ex:e3 a ex:Emp .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Emp ;
  sh:property [ sh:path [ sh:oneOrMorePath ex:reportsTo ] ;
                sh:minCount 1 ] .
""", [dict(focus="ex:e3", path='"(ex:reportsTo)+"',
           component="sh:MinCountConstraintComponent")])

case("36_path_zeroorone", """
ex:t1 a ex:Thing ; ex:alias ex:t1b .
ex:t2 a ex:Thing ; ex:alias "str" .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Thing ;
  sh:property [ sh:path [ sh:zeroOrOnePath ex:alias ] ;
                sh:nodeKind sh:IRI ] .
""", [dict(focus="ex:t2", path='"(ex:alias)?"', value='"str"',
           component="sh:NodeKindConstraintComponent")])

# --- §2.1.2 severity / message / deactivated ----------------------------------

case("37_severity_message", """
ex:alice a ex:Person ; ex:name "Alice" .
ex:bob a ex:Person .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ;
                sh:severity sh:Warning ;
                sh:message "needs a name" ] .
""", [dict(focus="ex:bob", path="ex:name",
           component="sh:MinCountConstraintComponent",
           severity="sh:Warning", message='"needs a name"')])

case("38_deactivated", """
ex:bob a ex:Person .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ; sh:deactivated true ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
""", [])

case("39_implicit_class_target", """
ex:ok a ex:PersonShape ; ex:name "fine" .
ex:bad a ex:PersonShape .
""", """
ex:PersonShape a rdfs:Class, sh:NodeShape ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
""", [dict(focus="ex:bad", path="ex:name",
           component="sh:MinCountConstraintComponent")])

case("40_pattern_flags", """
ex:a a ex:Code ; ex:tag "ABC" .
ex:b a ex:Code ; ex:tag "abd" .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Code ;
  sh:property [ sh:path ex:tag ; sh:pattern "^abc$" ; sh:flags "i" ] .
""", [dict(focus="ex:b", path="ex:tag", value='"abd"',
           component="sh:PatternConstraintComponent")])

case("41_or_of_property_shapes", """
ex:alice a ex:Contact ; ex:phone "123" .
ex:bob a ex:Contact ; ex:email "b@x.org" .
ex:carl a ex:Contact ; ex:fax "456" .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Contact ;
  sh:or ( [ sh:property [ sh:path ex:phone ; sh:minCount 1 ] ]
          [ sh:property [ sh:path ex:email ; sh:minCount 1 ] ] ) .
""", [dict(focus="ex:carl", value="ex:carl",
           component="sh:OrConstraintComponent")])

# --- §5 SPARQL-based constraints (r04: EXISTS / NOT EXISTS / UNION) -----------

case("42_sparql_not_exists", """
ex:a a ex:Emp ; ex:reportsTo ex:m1 .
ex:m1 ex:reportsTo ex:ceo .
ex:b a ex:Emp ; ex:reportsTo ex:m2 .
ex:c a ex:Emp .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Emp ;
  sh:sparql [ sh:select "PREFIX ex: <ex:> SELECT ?this ?value WHERE { ?this ex:reportsTo ?value . FILTER NOT EXISTS { ?value ex:reportsTo ?up } }" ] .
""", [dict(focus="ex:b", value="ex:m2",
           component="sh:SPARQLConstraintComponent")])

case("43_sparql_exists", """
ex:a a ex:Peer ; ex:knows ex:k1 .
ex:k1 ex:managerOf ex:z .
ex:b a ex:Peer ; ex:knows ex:k2 .
ex:c a ex:Peer .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Peer ;
  sh:sparql [ sh:select "PREFIX ex: <ex:> SELECT ?this WHERE { ?this a ex:Peer . FILTER EXISTS { ?this ex:knows ?k . ?k ex:managerOf ?m } }" ] .
""", [dict(focus="ex:a", component="sh:SPARQLConstraintComponent")])

case("44_sparql_union", """
ex:a a ex:Acct ; ex:email "a@x" .
ex:b a ex:Acct ; ex:phone "555" .
ex:c a ex:Acct .
""", """
ex:S a sh:NodeShape ; sh:targetClass ex:Acct ;
  sh:sparql [ sh:select "PREFIX ex: <ex:> SELECT ?this ?value WHERE { { ?this ex:email ?value } UNION { ?this ex:phone ?value } }" ] .
""", [dict(focus="ex:a", value='"a@x"',
           component="sh:SPARQLConstraintComponent"),
      dict(focus="ex:b", value='"555"',
           component="sh:SPARQLConstraintComponent")])


def render_expected(results: list[dict]) -> str:
    if not results:
        return PROLOGUE + "[] a sh:ValidationReport ; sh:conforms true .\n"
    blocks = []
    for r in results:
        lines = [
            "    a sh:ValidationResult ;",
            f"    sh:focusNode {r['focus']} ;",
        ]
        if "path" in r:
            lines.append(f"    sh:resultPath {r['path']} ;")
        if "value" in r:
            lines.append(f"    sh:value {r['value']} ;")
        lines.append(f"    sh:sourceConstraintComponent {r['component']} ;")
        lines.append(f"    sh:resultSeverity {r.get('severity', 'sh:Violation')} ;")
        if "message" in r:
            lines.append(f"    sh:resultMessage {r['message']} ;")
        blocks.append("  sh:result [\n" + "\n".join(lines) + "\n  ]")
    return (
        PROLOGUE
        + "[] a sh:ValidationReport ;\n  sh:conforms false ;\n"
        + " ;\n".join(blocks)
        + " .\n"
    )


def render_manifest(names) -> str:
    """manifest.ttl in the W3C data-shapes test-suite vocabulary
    (mf:Manifest / mf:entries / sht:Validate / mf:action) — the
    file-per-graph layout: graph references are relative file IRIs and
    mf:result points at each case's expected.ttl (r04; the loader in
    shacl_spark/shacl/manifest.py also reads the suite's self-contained
    layout with inline reports)."""
    head = (
        "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .\n"
        "@prefix mf: <http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#> .\n"
        "@prefix sht: <http://www.w3.org/ns/shacl-test#> .\n\n"
    )
    entries = " ".join(f"<#{n}>" for n in names)
    blocks = [head, f"<> a mf:Manifest ;\n  mf:entries ( {entries} ) .\n\n"]
    for n in names:
        blocks.append(
            f"<#{n}> a sht:Validate ;\n"
            f'  mf:name "{n}" ;\n'
            f"  mf:action [ sht:dataGraph <{n}/data.ttl> ; "
            f"sht:shapesGraph <{n}/shapes.ttl> ] ;\n"
            f"  mf:result <{n}/expected.ttl> ;\n"
            f"  mf:status sht:approved .\n\n"
        )
    return "".join(blocks)


def main() -> None:
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)
    for name, (data, shapes, results) in CASES.items():
        d = os.path.join(OUT, name)
        os.makedirs(d)
        with open(os.path.join(d, "data.ttl"), "w") as f:
            f.write(PROLOGUE + data.lstrip("\n"))
        with open(os.path.join(d, "shapes.ttl"), "w") as f:
            f.write(PROLOGUE + shapes.lstrip("\n"))
        with open(os.path.join(d, "expected.ttl"), "w") as f:
            f.write(render_expected(results))
    with open(os.path.join(OUT, "manifest.ttl"), "w") as f:
        f.write(render_manifest(sorted(CASES)))
    print(f"wrote {len(CASES)} cases + manifest.ttl -> {OUT}")


if __name__ == "__main__":
    main()
