#!/usr/bin/env python
"""Deterministic triples fixture for the driver-visible SHACL queries
(__spark_entry__ `shacl_*`): ~500 triples over 40 persons with planted
irregularities so every constraint component yields a non-trivial
violation set.  Written once to fixtures/shacl_triples.parquet (plain
pandas/pyarrow, no Spark) and committed; both the Spark queries and
the DuckDB oracle SQL read the same file.

Regenerate with:  python fixtures/make_shacl_triples.py
"""

from __future__ import annotations

import os

import pandas as pd

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
XSD = "http://www.w3.org/2001/XMLSchema#"
T = RDF + "type"
SCO = RDFS + "subClassOf"
STR = XSD + "string"
INT = XSD + "integer"
LSTR = RDF + "langString"

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "shacl_triples.parquet")


def build_rows() -> list[tuple]:
    rows: list[tuple] = []

    def t(s, p, o, kind="iri", dt=None, lang=None):
        rows.append((s, p, o, kind, dt, lang))

    # ontology: Employee < Person < Agent; Robot standalone
    t("ex:Person", SCO, "ex:Agent")
    t("ex:Employee", SCO, "ex:Person")

    # orgs: org3 deliberately lacks locatedIn (sequence-path violations)
    for k in range(4):
        t(f"ex:org{k}", T, "ex:Org")
        if k < 3:
            t(f"ex:org{k}", "ex:locatedIn", f"ex:city{k % 2}")

    for i in range(40):
        p = f"ex:p{i}"
        t(p, T, ["ex:Employee", "ex:Person", "ex:Person", "ex:Agent", "ex:Robot"][i % 5])

        # name: missing when i%7==0; an extra alt name when i%11==0
        if i % 7:
            t(p, "ex:name", f"Name{i}", "literal", STR)
        if i % 11 == 0:
            t(p, "ex:name", f"Alt{i}", "literal", STR)

        # age: IRI (i==21), ill-formed (i%13==0), >int64 (i==35),
        # missing (i%9==0), else a normal integer
        if i == 21:
            t(p, "ex:age", "ex:ageNode")
        elif i % 13 == 0:
            t(p, "ex:age", "young", "literal", INT)
        elif i == 35:
            t(p, "ex:age", "99999999999999999999", "literal", INT)
        elif i % 9:
            t(p, "ex:age", str(15 + (i * 3) % 60), "literal", INT)

        # email: some malformed (no @), some persons with 4 emails
        if i % 3:
            e = f"bad-email-{i}" if i % 6 == 3 else f"user{i}@ex.org"
            t(p, "ex:email", e, "literal", STR)
        if i % 12 == 0:
            for suf in "bcd":
                t(p, "ex:email", f"user{i}{suf}@ex.org", "literal", STR)

        # labels: en for all; de sometimes; duplicate-en sometimes;
        # an untagged plain literal sometimes
        t(p, "ex:label", f"Label{i}", "literal", LSTR, "en")
        if i % 4 == 1:
            t(p, "ex:label", f"Etikett{i}", "literal", LSTR, "de")
        if i % 10 == 2:
            t(p, "ex:label", f"Label{i}x", "literal", LSTR, "en")
        if i % 8 == 5:
            t(p, "ex:label", f"Plain{i}", "literal", STR)

        # dept: in {eng,sales,hr} except every 17th
        d = "unknown" if i % 17 == 0 else ["eng", "sales", "hr"][i % 3]
        t(p, "ex:dept", d, "literal", STR)

        # nick: equals the name for even i, else differs
        t(p, "ex:nick", f"Name{i}" if i % 2 == 0 else f"Nick{i}", "literal", STR)

        # backup email: sometimes colliding with the primary
        if i % 10 == 7:
            t(p, "ex:backup", f"user{i}@ex.org", "literal", STR)
        elif i % 3:
            t(p, "ex:backup", f"backup{i}@ex.org", "literal", STR)

        # start < end except i%5==2
        t(p, "ex:start", str(i), "literal", INT)
        t(p, "ex:end", str(i + 10 if i % 5 != 2 else i - 5), "literal", INT)

        # knows: ring edges + occasional literal / robot targets
        if i % 2 == 0:
            t(p, "ex:knows", f"ex:p{(i + 1) % 40}")
        if i % 15 == 4:
            t(p, "ex:knows", f"friend{i}", "literal", STR)
        if i % 5 == 4:
            t(p, "ex:knows", f"ex:p{(i + 5) % 40}")

        # planted sh:class violations on Employee targets (r05: the
        # driver row was vacuous — every Employee's knows-objects fell
        # inside the Person closure, so both engines emitted 0 rows and
        # the hash match proved nothing): p10 knows a Robot (IRI outside
        # the closure), p20 knows a plain literal (non-resource branch)
        if i == 10:
            t(p, "ex:knows", "ex:p14")  # p14 is typed ex:Robot
        if i == 20:
            t(p, "ex:knows", f"mascot{i}", "literal", STR)

        # worksFor: 2/3 of persons; org index cycles over 4 (org3 has no city)
        if i % 3 != 1:
            t(p, "ex:worksFor", f"ex:org{i % 4}")

        # inverse-path source: managers
        if i % 4 == 0:
            t(f"ex:mgr{i // 4}", "ex:managerOf", p)

        # reportsTo: binary-tree chains (for zeroOrMore/oneOrMore)
        if i > 0:
            t(p, "ex:reportsTo", f"ex:p{i // 2}")

    # dedup + deterministic order
    uniq = sorted(set(rows), key=lambda r: tuple("" if x is None else x for x in r))
    return uniq


def main() -> None:
    rows = build_rows()
    df = pd.DataFrame(
        rows, columns=["subj", "pred", "obj", "obj_kind", "obj_dt", "obj_lang"]
    )
    df.to_parquet(OUT, index=False)
    print(f"wrote {len(df)} triples -> {OUT}")


if __name__ == "__main__":
    main()
