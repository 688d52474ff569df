"""W3C-data-shapes-style Turtle battery: every directory under
fixtures/ttl/battery/ holds real (data.ttl, shapes.ttl, expected.ttl)
files; the engine's report must match the expected sh:ValidationReport
structurally — result descriptors (focus/path/value/component/severity
[/message]) modulo result-node naming, exactly how the W3C suite
compares reports modulo bnode isomorphism.  Each case also runs
engine-vs-interpretive-oracle parity (VERDICT r02 "Next round" #3)."""

from __future__ import annotations

import glob
import os
from collections import Counter, defaultdict

import pytest

from shacl_spark.functions.terms import RDF, SH, triples_from_rows
from shacl_spark.shacl import validate
from shacl_spark.shacl.turtle import parse_turtle_file
from tests.oracle import Oracle, precision_recall

BATTERY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures", "ttl", "battery",
)
CASE_DIRS = sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(BATTERY, "*")) if os.path.isdir(p)
)


def _expected_report(path: str) -> tuple[bool, list[dict]]:
    """Parse expected.ttl into (conforms, result descriptors)."""
    rows = parse_turtle_file(path)
    props: dict[str, dict[str, list[str]]] = defaultdict(lambda: defaultdict(list))
    for r in rows:
        props[r[0]][r[1]].append(r[2])
    conforms, results = True, []
    for subj, pv in props.items():
        if SH + "ValidationReport" in pv.get(RDF + "type", []):
            conforms = pv[SH + "conforms"][0] == "true"
        if SH + "ValidationResult" in pv.get(RDF + "type", []):
            results.append(
                {
                    "focus": pv[SH + "focusNode"][0],
                    "path": (pv.get(SH + "resultPath") or [None])[0],
                    "value": (pv.get(SH + "value") or [None])[0],
                    "component": pv[SH + "sourceConstraintComponent"][0],
                    "severity": pv[SH + "resultSeverity"][0],
                    "message": (pv.get(SH + "resultMessage") or [None])[0],
                }
            )
    return conforms, results


def test_battery_present():
    assert len(CASE_DIRS) >= 25, CASE_DIRS


@pytest.mark.parametrize("name", CASE_DIRS)
def test_ttl_case(spark, name):
    d = os.path.join(BATTERY, name)
    data = parse_turtle_file(os.path.join(d, "data.ttl"))
    shapes = parse_turtle_file(os.path.join(d, "shapes.ttl"))
    conforms, expected = _expected_report(os.path.join(d, "expected.ttl"))

    rep_rows = validate(spark, triples_from_rows(spark, data), shapes).collect()

    assert (len(rep_rows) == 0) == conforms, f"{name}: conforms mismatch"
    got = Counter(
        (r["focus"], r["path"], r["value"], r["component"], r["severity"])
        for r in rep_rows
    )
    want = Counter(
        (e["focus"], e["path"], e["value"], e["component"], e["severity"])
        for e in expected
    )
    assert got == want, (
        f"{name}:\n engine-only={sorted(got - want)}\n expected-only={sorted(want - got)}"
    )
    for e in expected:
        if e["message"] is not None:
            assert any(
                r["focus"] == e["focus"] and r["component"] == e["component"]
                and r["message"] == e["message"]
                for r in rep_rows
            ), f"{name}: message {e['message']!r} not stamped"

    # engine vs interpretive oracle on the same Turtle-derived rows
    p, r = precision_recall(rep_rows, Oracle(data, shapes).validate())
    assert (p, r) == (1.0, 1.0), f"{name}: oracle parity P={p} R={r}"
