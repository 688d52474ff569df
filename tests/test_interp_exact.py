"""Row-EXACT engine-vs-interpreter equality (r05).

The parity suite compares (focus, path, value, component, severity)
SETS; since the interpreter doubles as incremental revalidation's
local fast path (shacl/interp.py), it must reproduce the engine's
report MULTISET on ALL columns — term metadata, path_kind, default
messages, duplicate multiplicities.  test_incremental compares full
sorted rows, so any divergence here would surface there as a
false incremental mismatch.
"""

from __future__ import annotations

import pytest

from fixtures.shacl_cases import CASES
from shacl_spark.functions.terms import triples_from_rows
from shacl_spark.shacl import validate
from shacl_spark.shacl.interp import Oracle

NULL = "␀"


def _engine_rows(spark, case):
    return sorted(
        tuple(NULL if v is None else str(v) for v in r)
        for r in validate(
            spark, triples_from_rows(spark, case["data"]), case["shapes"]
        ).collect()
    )


def _interp_rows(case, only_keys=None):
    return sorted(
        tuple(NULL if v is None else str(v) for v in r.as_row())
        for r in Oracle(case["data"], case["shapes"]).validate(only_keys=only_keys)
    )


@pytest.mark.parametrize("name", sorted(CASES))
def test_case_exact_rows(spark, name):
    case = CASES[name]
    e, i = _engine_rows(spark, case), _interp_rows(case)
    if e != i:
        eo = [r for r in e if r not in i]
        io = [r for r in i if r not in e]
        pytest.fail(
            f"{name}: engine {len(e)} rows, interp {len(i)} rows\n"
            f"engine-only: {eo[:5]}\ninterp-only: {io[:5]}"
        )


def test_only_keys_mirrors_only_nodes(spark):
    """validate(only_keys=...) must equal the engine Validator's
    only_nodes restriction row-for-row."""
    from pyspark.sql import functions as F

    from shacl_spark.functions.terms import node_key
    from shacl_spark.shacl.engine import Validator
    from shacl_spark.shacl.parser import parse_shapes_graph

    case = CASES["closed_extra_prop"]
    shapes = case["shapes"]
    sg = shapes if not isinstance(shapes, list) else parse_shapes_graph(shapes)
    interp = Oracle(case["data"], sg)
    all_focus = {
        node_key(f.kind, f.value, f.dt, f.lang)
        for sh in interp.shapes.entry_shapes()
        for f in interp.focus_nodes(sh)
    }
    keep = set(sorted(all_focus)[: max(1, len(all_focus) // 2)])
    only = spark.createDataFrame([(k,) for k in sorted(keep)], "node string")
    eng = sorted(
        tuple(NULL if v is None else str(v) for v in r)
        for r in Validator(
            spark,
            triples_from_rows(spark, case["data"]),
            sg,
            only_nodes=only,
        ).validate().collect()
    )
    assert eng == _interp_rows(case, only_keys=keep)
