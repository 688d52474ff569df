"""W3C data-shapes test-suite manifest loader (VERDICT r03 next-round
#6): consume ``manifest.ttl`` files in the published vocabulary —
``mf:Manifest`` / ``mf:entries`` lists of ``sht:Validate`` entries with
``mf:action [ sht:dataGraph … ; sht:shapesGraph … ]`` — so suite files
from https://w3c.github.io/data-shapes/data-shapes-test-suite/ drop in
unmodified.

Both published layouts are handled:

- **self-contained** (the real suite): ``sht:dataGraph <>`` points at
  the manifest file itself, and ``mf:result`` is an INLINE
  ``sh:ValidationReport`` node in the same graph;
- **file-per-graph** (this repo's battery): the graph references are
  relative file IRIs and ``mf:result`` points at an ``expected.ttl``.

Relative IRIs resolve against the manifest's directory (the engine's
Turtle parser keeps them verbatim when no ``@base`` is declared); a
fragment-only or empty reference means the manifest file itself.
``mf:include`` is followed recursively (the suite's top-level manifests
are include-trees).
"""

from __future__ import annotations

import os
from collections import defaultdict
from dataclasses import dataclass, field

from shacl_spark.functions.terms import RDF, SH
from shacl_spark.shacl.turtle import parse_turtle_file

MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
SHT = "http://www.w3.org/ns/shacl-test#"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"


@dataclass
class ManifestCase:
    name: str
    data_path: str
    shapes_path: str
    conforms: bool
    expected: list[dict] = field(default_factory=list)
    status: str | None = None

    def data_rows(self) -> list[tuple]:
        return parse_turtle_file(self.data_path)

    def shapes_rows(self) -> list[tuple]:
        return parse_turtle_file(self.shapes_path)


def _index(rows) -> dict:
    po: dict = defaultdict(lambda: defaultdict(list))
    for r in rows:
        po[r[0]][r[1]].append(r)
    return po


def _list_items(po, head: str) -> list[str]:
    out = []
    while head and head != RDF + "nil":
        firsts = po[head].get(RDF + "first")
        if not firsts:
            break
        out.append(firsts[0][2])
        rests = po[head].get(RDF + "rest")
        head = rests[0][2] if rests else None
    return out


def _resolve(ref: str, manifest_path: str) -> str:
    ref = ref.split("#", 1)[0]
    if ref == "":
        return manifest_path
    if "://" in ref or os.path.isabs(ref):
        return ref
    return os.path.join(os.path.dirname(manifest_path), ref)


def _report_from_graph(po, report_node: str) -> tuple[bool, list[dict]]:
    conforms = True
    cvals = po[report_node].get(SH + "conforms")
    if cvals:
        conforms = cvals[0][2] == "true"
    results = []
    for rnode_row in po[report_node].get(SH + "result", []):
        rnode = rnode_row[2]
        pv = po[rnode]

        def one(pred: str):
            vals = pv.get(pred)
            return vals[0][2] if vals else None

        results.append(
            {
                "focus": one(SH + "focusNode"),
                "path": one(SH + "resultPath"),
                "value": one(SH + "value"),
                "component": one(SH + "sourceConstraintComponent"),
                "severity": one(SH + "resultSeverity"),
                "message": one(SH + "resultMessage"),
            }
        )
    return conforms, results


def load_manifest(
    path: str, _visited: set[str] | None = None
) -> list[ManifestCase]:
    """Parse a manifest.ttl (+ its mf:include closure) into validate
    cases with resolved graph paths and expected reports.  The include
    walk is cycle-safe (r04 review #4): a manifest reached twice —
    self-include, mutual includes, or a shared child of two parents —
    is loaded once, not recursed into forever / duplicated."""
    visited = _visited if _visited is not None else set()
    real = os.path.realpath(path)
    if real in visited:
        return []
    visited.add(real)
    rows = parse_turtle_file(path)
    po = _index(rows)

    cases: list[ManifestCase] = []
    manifest_nodes = [
        s for s, pv in po.items() if any(r[2] == MF + "Manifest" for r in pv.get(RDF + "type", []))
    ]
    for m in manifest_nodes:
        for inc_row in po[m].get(MF + "include", []):
            cases.extend(load_manifest(_resolve(inc_row[2], path), visited))
        for head_row in po[m].get(MF + "entries", []):
            for entry in _list_items(po, head_row[2]):
                pv = po[entry]
                if not any(
                    r[2] == SHT + "Validate" for r in pv.get(RDF + "type", [])
                ):
                    continue
                names = pv.get(MF + "name") or pv.get(RDFS_LABEL)
                name = (
                    names[0][2]
                    if names
                    else (entry.split("#", 1)[1] if "#" in entry else entry)
                )
                action_rows = pv.get(MF + "action")
                if not action_rows:
                    raise ValueError(f"manifest: entry {entry!r} has no mf:action")
                act = po[action_rows[0][2]]
                data_ref = act.get(SHT + "dataGraph")
                shapes_ref = act.get(SHT + "shapesGraph")
                if not data_ref or not shapes_ref:
                    raise ValueError(
                        f"manifest: entry {entry!r} action lacks data/shapes graph"
                    )
                data_path = _resolve(data_ref[0][2], path)
                shapes_path = _resolve(shapes_ref[0][2], path)

                result_rows = pv.get(MF + "result")
                if not result_rows:
                    raise ValueError(f"manifest: entry {entry!r} has no mf:result")
                rnode = result_rows[0][2]
                if any(
                    r[2] == SH + "ValidationReport"
                    for r in po[rnode].get(RDF + "type", [])
                ):
                    conforms, expected = _report_from_graph(po, rnode)
                else:
                    rpath = _resolve(rnode, path)
                    rpo = _index(parse_turtle_file(rpath))
                    rep_nodes = [
                        s
                        for s, pv2 in rpo.items()
                        if any(
                            r[2] == SH + "ValidationReport"
                            for r in pv2.get(RDF + "type", [])
                        )
                    ]
                    if not rep_nodes:
                        raise ValueError(
                            f"manifest: {rpath!r} holds no sh:ValidationReport"
                        )
                    conforms, expected = _report_from_graph(rpo, rep_nodes[0])
                status_rows = pv.get(MF + "status")
                cases.append(
                    ManifestCase(
                        name=name,
                        data_path=data_path,
                        shapes_path=shapes_path,
                        conforms=conforms,
                        expected=expected,
                        status=status_rows[0][2] if status_rows else None,
                    )
                )
    return cases
