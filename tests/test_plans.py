"""Physical-plan assertions — the 100 TB properties, locked in as
tests (SURVEY.md §4.3): filters and column pruning must reach the
parquet scan, small dimensions must broadcast, extraction must stay
shuffle-free with exactly ONE Python stage, and the canonical-rewrite
joins must broadcast the component map.  A plan regression (e.g. a
broadcast-threshold flip or an accidental extra Exchange) fails here
even when tiny-data results stay correct."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def queries():
    return entrymod.queries()


def test_filter_and_column_pushdown(spark, queries):
    plan = _plan(queries["scan_project_filter"](spark, SF))
    assert "PushedFilters: [" in plan
    assert "GreaterThan(l_discount,0.05)" in plan
    # column pruning: the 2-filter 4-column projection must not read
    # the wide comment/address columns
    assert "l_comment" not in plan
    read_schema = plan.split("ReadSchema:")[1]
    assert "l_orderkey" in read_schema


def test_small_dims_broadcast(spark, queries):
    plan = _plan(queries["join_broadcast_dims"](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_extraction_is_shuffle_free_single_python_stage(spark):
    from shacl_spark.kg.extract import extract_triples
    from shacl_spark.sources.corpus import synth_corpus

    plan = _plan(extract_triples(synth_corpus(spark, 100, parts=4)))
    assert plan.count("Exchange") == 0, "extraction must stay a narrow map plan"
    assert plan.count("ArrowEvalPython") == 1, "exactly ONE Arrow UDF crossing"


def test_semi_anti_join_shapes(spark, queries):
    semi = _plan(queries["join_semi"](spark, SF))
    anti = _plan(queries["join_anti"](spark, SF))
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_canonical_rewrite_broadcasts_component_map(spark):
    from shacl_spark.functions.terms import triples_from_rows
    from shacl_spark.kg.canon import rewrite_triples

    triples = triples_from_rows(
        spark, [(f"ex:s{i}", "ex:p", f"ex:o{i}") for i in range(10)]
    )
    comp_map = spark.createDataFrame(
        [("ex:s1", "ex:s0")], "id string, canonical string"
    )
    plan = _plan(rewrite_triples(triples, comp_map))
    assert plan.count("BroadcastHashJoin") >= 2  # subj + obj rewrite joins
    assert "SortMergeJoin" not in plan


def test_validation_plan_has_no_cartesian_product(spark):
    """Every constraint join is an equi-join — the OPTIMIZED logical
    plan (AQE hides the physical tree pre-execution) must contain no
    cartesian product, and the class-closure join must carry the
    broadcast hint."""
    from fixtures.shacl_cases import CASES
    from shacl_spark.functions.terms import triples_from_rows
    from shacl_spark.shacl.engine import Validator
    from shacl_spark.shacl.parser import parse_shapes_graph

    from shacl_spark.shacl.targets import focus_nodes

    case = CASES["deep_subclass_closure"]
    v = Validator(
        spark,
        triples_from_rows(spark, case["data"]),
        parse_shapes_graph(case["shapes"]),
    )
    # evaluate() directly: validate()'s memo seeding lazily checkpoints
    # the report (LogicalRDD), which hides the join tree from inspection
    shape = next(iter(v.shapes.entry_shapes()))
    rep = v.evaluate(shape, focus_nodes(spark, shape, v.t, v.closure))
    logical = rep._jdf.queryExecution().optimizedPlan().toString()
    assert "Join Cross" not in logical
    assert "cartesian" not in logical.lower()
    assert "Join" in logical  # the constraint equi-joins are present
