"""Incremental revalidation (r03): validate only the focus nodes a
triple delta can affect, merge with the previous report.

At 100 TB nobody revalidates the whole graph because one feed changed;
the sound contract is:

    new_report = incremental_revalidate(spark, triples_new, changed,
                                        shapes, prev_report)
    # == validate(spark, triples_new, shapes)   (proven in tests)

``changed`` holds every triple ADDED or REMOVED (the caller's CDC
stream knows); ``triples_new`` is the post-change graph.  The affected
set is computed CONSERVATIVELY from a static analysis of the shapes
graph:

- **footprint** — the set of predicates any constraint can traverse
  (paths, equals/disjoint/lessThan pairs, sh:sparql BGP patterns,
  rdf:type for sh:class), a hop-depth bound D (path lengths composed
  through shape references along the DAG), the predicates under ``*``/
  ``+``/``?`` paths (expanded to fixpoint, not depth-bounded), and a
  wildcard flag for ``sh:closed`` (which inspects every predicate).
- **seeds** — subjects and objects (full term identity: literal objects
  can be focus nodes via targetObjectsOf) of every changed triple.
  Target membership is decided by triples touching the node itself, so
  seeding covers target changes with zero extra hops.
- **expansion** — D undirected hops through footprint-predicate edges
  between resources (a value's rdf:type change must reach the focus
  pointing AT it), plus fixpoint expansion along recursive-path
  predicates.
- **escape hatch** — a delta touching ``rdfs:subClassOf`` invalidates
  class closures globally: fall back to full revalidation (correct and
  rare; ontology edits are not row-rate events).

The restricted validation itself reuses the engine end-to-end
(``Validator(only_nodes=...)``); unaffected report rows carry over from
``prev_report`` by focus-term anti-join.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shacl_spark.functions.terms import (
    RDF_TYPE,
    RDFS_SUBCLASSOF,
    node_key_col,
    subject_kind_col,
)
from shacl_spark.shacl.engine import Validator, validate
from shacl_spark.shacl.parser import parse_shapes_graph
from shacl_spark.shacl.shapes import (
    AlternativePath,
    InversePath,
    OneOrMorePath,
    Path,
    PredicatePath,
    PropertyShape,
    SequencePath,
    ShapesGraph,
    ZeroOrMorePath,
    ZeroOrOnePath,
)


@dataclass
class Footprint:
    preds: set[str] = field(default_factory=set)
    depth: int = 1
    recursive_preds: set[str] = field(default_factory=set)
    wildcard: bool = False          # sh:closed inspects every predicate
    subclass_sensitive: bool = False  # any class closure in use


def _path_info(path: Path) -> tuple[set[str], int, set[str]]:
    """(predicates, hop length, predicates needing fixpoint expansion)."""
    if isinstance(path, PredicatePath):
        return {path.iri}, 1, set()
    if isinstance(path, InversePath):
        return _path_info(path.inner)
    if isinstance(path, SequencePath):
        preds: set[str] = set()
        rec: set[str] = set()
        depth = 0
        for s in path.steps:
            p, d, r = _path_info(s)
            preds |= p
            rec |= r
            depth += d
        return preds, depth, rec
    if isinstance(path, AlternativePath):
        preds, depth, rec = set(), 1, set()
        for o in path.options:
            p, d, r = _path_info(o)
            preds |= p
            depth = max(depth, d)
            rec |= r
        return preds, depth, rec
    if isinstance(path, (ZeroOrMorePath, OneOrMorePath, ZeroOrOnePath)):
        p, d, r = _path_info(path.inner)
        if isinstance(path, ZeroOrOnePath):
            return p, d, r
        return p, d, r | p
    raise ValueError(f"unknown path {path!r}")


def shapes_footprint(shapes: ShapesGraph) -> Footprint:
    fp = Footprint()
    memo: dict[str, int] = {}

    def depth_of(iri: str) -> int:
        if iri in memo:
            return memo[iri]
        memo[iri] = 0  # DAG (parser rejects cycles); placeholder
        shape = shapes[iri]
        own = 1
        p_len = 0
        if isinstance(shape, PropertyShape) and shape.path is not None:
            preds, p_len, rec = _path_info(shape.path)
            fp.preds |= preds
            fp.recursive_preds |= rec
            own = max(own, p_len)
        pair = (
            set(shape.equals) | set(shape.disjoint)
            | set(shape.less_than) | set(shape.less_than_or_equals)
        )
        if pair:
            fp.preds |= pair
            own = max(own, 1)
        if shape.class_:
            # a value's instance-ness depends on the value's OWN
            # rdf:type triples: a type change seeds the value (it is
            # the subject) and reaches the focus backwards through the
            # PATH predicates — rdf:type is deliberately NOT a hop
            # edge, else every class node becomes a hub connecting all
            # its instances 2-hops apart (measured: the affected set
            # degenerates to the whole graph).  subClassOf changes take
            # the full-revalidation hatch instead.
            fp.subclass_sensitive = True
            own = max(own, p_len, 1)
        if shape.target_classes or shape.implicit_class_target:
            fp.subclass_sensitive = True
        if shape.closed:
            fp.wildcard = True
        for select_text, _msg in shape.sparql:
            from shacl_spark.shacl.sparql import parse_sparql, substitute_path

            q = parse_sparql(substitute_path(select_text, shape))
            pats = list(q.patterns) + [p for g in q.optionals for p in g]
            fp.preds |= {p.p for p in pats}
            own = max(own, len(pats))
        for ref in shape.referenced_shapes():
            own = max(own, p_len + depth_of(ref))
        memo[iri] = own
        return own

    for iri in shapes.shapes:
        fp.depth = max(fp.depth, depth_of(iri))
    return fp


def affected_node_keys(
    spark: SparkSession, triples: DataFrame, changed: DataFrame, fp: Footprint
) -> DataFrame:
    """DF[node] of term keys whose validation results the delta can
    influence (conservative superset)."""
    subj_seeds = changed.select(
        F.col("subj").alias("id")
    )
    obj_res_seeds = changed.where(F.col("obj_kind").isin("iri", "bnode")).select(
        F.col("obj").alias("id")
    )
    ids = subj_seeds.unionByName(obj_res_seeds).distinct().localCheckpoint(eager=True)

    base = triples if fp.wildcard else triples.where(
        F.col("pred").isin(*sorted(fp.preds)) if fp.preds else F.lit(False)
    )
    res = base.where(F.col("obj_kind").isin("iri", "bnode"))
    sym = (
        res.select(F.col("subj").alias("a"), F.col("obj").alias("b"))
        .unionByName(res.select(F.col("obj").alias("a"), F.col("subj").alias("b")))
        .dropDuplicates(["a", "b"])
        .localCheckpoint(eager=True)
    )
    frontier, acc = ids, ids
    for _ in range(fp.depth):
        frontier = (
            sym.join(frontier, sym["a"] == frontier["id"])
            .select(F.col("b").alias("id"))
            .distinct()
            .join(acc, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break
        acc = acc.unionByName(frontier).localCheckpoint(eager=True)
    if fp.recursive_preds:
        rsym = sym if fp.wildcard else (
            triples.where(
                F.col("pred").isin(*sorted(fp.recursive_preds))
                & F.col("obj_kind").isin("iri", "bnode")
            )
            .select(F.col("subj").alias("a"), F.col("obj").alias("b"))
        )
        if not fp.wildcard:
            rsym = rsym.unionByName(
                rsym.select(F.col("b").alias("a"), F.col("a").alias("b"))
            ).dropDuplicates(["a", "b"]).localCheckpoint(eager=True)
        frontier = acc
        for _ in range(30):
            frontier = (
                rsym.join(frontier, rsym["a"] == frontier["id"])
                .select(F.col("b").alias("id"))
                .distinct()
                .join(acc, "id", "left_anti")
                .localCheckpoint(eager=True)
            )
            if frontier.isEmpty():
                break
            acc = acc.unionByName(frontier).localCheckpoint(eager=True)

    resource_keys = acc.select(F.col("id").alias("node"))
    # literal objects of changed triples can be focus nodes themselves
    # (sh:targetObjectsOf) — seed them with full term identity
    literal_keys = changed.where(F.col("obj_kind") == "literal").select(
        node_key_col(
            F.col("obj_kind"), F.col("obj"), F.col("obj_dt"), F.col("obj_lang")
        ).alias("node")
    )
    return resource_keys.unionByName(literal_keys).distinct()


def incremental_revalidate(
    spark: SparkSession,
    triples: DataFrame,
    changed: DataFrame,
    shapes_rows_or_graph,
    prev_report: DataFrame,
    assume_distinct: bool = False,
) -> DataFrame:
    """Equivalent to ``validate(spark, triples, shapes)`` when
    ``prev_report`` is the full report of the pre-change graph and
    ``changed`` holds every added/removed triple (tests prove the
    equivalence on randomized deltas)."""
    shapes = (
        shapes_rows_or_graph
        if isinstance(shapes_rows_or_graph, ShapesGraph)
        else parse_shapes_graph(shapes_rows_or_graph)
    )
    fp = shapes_footprint(shapes)
    if fp.subclass_sensitive and not changed.where(
        F.col("pred") == RDFS_SUBCLASSOF
    ).isEmpty():
        return validate(spark, triples, shapes, assume_distinct=assume_distinct)

    aff = affected_node_keys(spark, triples, changed, fp)
    new_rows = Validator(
        spark, triples, shapes, assume_distinct=assume_distinct, only_nodes=aff
    ).validate()
    prev_key = node_key_col(
        F.col("focus_kind"), F.col("focus"), F.col("focus_dt"), F.col("focus_lang")
    )
    prev_keep = (
        prev_report.withColumn("__k", prev_key)
        .join(aff.withColumnRenamed("node", "__k"), "__k", "left_anti")
        .drop("__k")
    )
    return prev_keep.unionByName(new_rows)
