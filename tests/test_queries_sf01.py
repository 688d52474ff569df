"""Headline queries re-verified at sf0.1 (100× the default contract
scale): catches plan regressions that tiny inputs hide — broadcast
threshold flips, AQE skew decisions, partition-count cliffs
(VERDICT r01 "Next round" #10).

The full registry runs at sf0.001/sf0.01 in test_queries_contract.py;
this module re-runs the perf-critical subset (the bench.py HEADLINE
set) against DuckDB at sf0.1.  Skips cleanly if the sf0.1 testdata is
absent."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from bench import HEADLINE
from tests.contract import compare, duck_con

SF_DIR = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="sf0.1 testdata not present"
)

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()
CASES = [q for q in HEADLINE if q in ORACLES]


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", CASES)
def test_headline_matches_oracle_sf01(spark, con, name):
    df = QUERIES[name](spark, SF_DIR)
    ok, msg = compare(df, con, ORACLES[name])
    assert ok, f"{name}@sf0.1: {msg}"
