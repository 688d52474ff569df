"""Every __spark_entry__.queries() entry runs; every oracle_sql()
entry hash-matches DuckDB (driver-gate mirror, sf0.001 for speed —
the driver itself runs sf0.01)."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.contract import compare, duck_con

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_DIR)
    yield c
    c.close()


def test_oracle_keys_subset():
    assert set(ORACLES) <= set(QUERIES)


def test_driver_window_composition():
    """The driver hash-checks only the FIRST 50 queries() entries
    (VERDICT r02 #1).  Every shacl_* query, the flagship kg extraction,
    and the priority base list must sit inside that window, and every
    in-window entry must carry an oracle unless it is one of the
    documented rows-only ops."""
    window = list(QUERIES)[: entrymod.DRIVER_WINDOW]
    shacl = [
        n for n in QUERIES
        if n.startswith("shacl_") and n not in entrymod._POST_WINDOW_SHACL
    ]
    assert set(shacl) <= set(window), sorted(set(shacl) - set(window))
    # post-window shacl entries stay registered (contract-hash-checked)
    assert entrymod._POST_WINDOW_SHACL <= set(QUERIES)
    assert "kg_extract_documents" in window
    assert set(entrymod._PRIORITY_BASE) <= set(window)
    # r04: no rows-only entries left in the window — ann_lsh_topk got a
    # plane-literal oracle and dedup_clusters replaced dedup_minhash_lsh
    missing = [n for n in window if n not in ORACLES]
    assert not missing, f"in-window queries without an oracle: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    n = df.count()
    assert n >= 0
    assert df.columns  # stable schema


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, con, name):
    df = QUERIES[name](spark, SF_DIR)
    ok, msg = compare(df, con, ORACLES[name])
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    out = entrymod.entry(spark)
    rows = out.collect()
    assert len(rows) > 0
    metrics = {r["metric"]: r["value"] for r in rows}
    assert metrics["kg_triples"] > 0
    assert metrics["kg_violations"] == 0
