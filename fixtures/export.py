"""Materialize the SHACL fixture cases as CSV directories
(FIXTURES.md §2 layout): fixtures/<name>/{data.csv,shapes.csv}.

The golden expected reports are produced by tests/oracle.py at test
time (engine-vs-oracle parity is the gate), so expected_report.csv is
written here from the oracle for human inspection.

Run: python -m fixtures.export
"""

from __future__ import annotations

import csv
import os

from fixtures.shacl_cases import CASES

HEADER = ["subj", "pred", "obj", "obj_kind", "obj_dt", "obj_lang"]


def _write(path: str, rows) -> None:
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(HEADER)
        for r in rows:
            r = list(r) + [None] * (6 - len(r))
            if r[3] is None:
                r[3] = "iri"
            w.writerow(r)


def main() -> None:
    base = os.path.dirname(__file__)
    from tests.oracle import Oracle

    for name, case in sorted(CASES.items()):
        d = os.path.join(base, name)
        os.makedirs(d, exist_ok=True)
        _write(os.path.join(d, "data.csv"), case["data"])
        _write(os.path.join(d, "shapes.csv"), case["shapes"])
        results = Oracle(case["data"], case["shapes"]).validate()
        with open(os.path.join(d, "expected_report.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["focus", "path", "value", "component", "severity"])
            for r in sorted(results, key=lambda r: (r.focus, r.component, str(r.value))):
                w.writerow([r.focus, r.path, r.value, r.component, r.severity])
    print(f"wrote {len(CASES)} fixture dirs under {base}")


if __name__ == "__main__":
    main()
