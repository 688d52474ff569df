"""Target selection → focus node frames (SPEC §2.1.3; SURVEY.md §2.C).

The class hierarchy (rdfs:subClassOf closure) is computed ONCE per
validation run with the shared fixpoint iterator and is tiny relative
to the data, so every use is a broadcast join against the (huge)
rdf:type triples — no shuffle on the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from shacl_spark.functions.terms import (
    RDF_TYPE,
    RDFS_SUBCLASSOF,
    node_key,
    node_key_col,
    subject_kind_col,
)
from shacl_spark.operators.fixpoint import iterate_to_fixpoint
from shacl_spark.shacl.shapes import Shape, Term

NODE_SCHEMA = T.StructType(
    [
        T.StructField("node", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("dt", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def empty_nodes(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], NODE_SCHEMA)


def nodes_from_terms(spark: SparkSession, terms) -> DataFrame:
    rows = [(node_key(t.kind, t.value, t.dt, t.lang), t.kind, t.dt, t.lang) for t in terms]
    return spark.createDataFrame(rows, NODE_SCHEMA)


def subclass_closure(triples: DataFrame) -> DataFrame:
    """Reflexive-transitive rdfs:subClassOf closure → DF[sub, sup].

    Universe = every IRI appearing as a class (rdf:type object or
    subClassOf endpoint).  The hierarchy is assumed driver-small (true
    for any real ontology); the closure frame is broadcast at use sites.
    """
    sco = triples.where(F.col("pred") == RDFS_SUBCLASSOF).select(
        F.col("subj").alias("sub"), F.col("obj").alias("sup")
    )
    classes = (
        triples.where(F.col("pred") == RDF_TYPE)
        .select(F.col("obj").alias("c"))
        .unionByName(sco.select(F.col("sub").alias("c")))
        .unionByName(sco.select(F.col("sup").alias("c")))
        .distinct()
    )
    reflexive = classes.select(F.col("c").alias("sub"), F.col("c").alias("sup"))

    # no class hierarchy (the common KG case): closure = reflexive pairs,
    # skip the fixpoint's eager checkpoint actions entirely (lazy
    # checkpoint: computed inside the first consumer job, then cached)
    if sco.isEmpty():
        return reflexive.localCheckpoint(eager=False)

    def step(frontier: DataFrame) -> DataFrame:
        # extend each known (sub, sup) by one edge sup -subClassOf-> sup2
        return frontier.alias("f").join(
            sco.alias("e"), F.col("f.sup") == F.col("e.sub"), "inner"
        ).select(F.col("f.sub").alias("sub"), F.col("e.sup").alias("sup"))

    return iterate_to_fixpoint(reflexive, step, key_cols=["sub", "sup"])


def subclass_closure_map(
    triples: DataFrame, max_schema_rows: int = 1_000_000
) -> dict[str, set[str]] | None:
    """DRIVER-side subclass hierarchy: super → direct subs, collected
    from the (ontology-sized) subClassOf edge list (r06 — the same
    schema-is-small assumption entailment.py makes).  Returns None when
    the edge list exceeds the cap; callers then fall back to the
    distributed :func:`subclass_closure` frame.  With the map in hand,
    target/class instance selection becomes a literal ``isin`` filter —
    no classes-universe distinct, no closure fixpoint, no broadcast
    join materializations (profiled r06: those were ~a dozen separate
    AQE jobs per validation)."""
    from collections import defaultdict

    rows = (
        triples.where(F.col("pred") == RDFS_SUBCLASSOF)
        .select("subj", "obj")
        .limit(max_schema_rows + 1)
        .collect()
    )
    if len(rows) > max_schema_rows:
        return None
    down: dict[str, set[str]] = defaultdict(set)
    for r in rows:
        down[r[1]].add(r[0])
    return dict(down)


def subtypes_of(down: dict[str, set[str]], classes) -> set[str]:
    """``classes`` plus every transitive subclass (cycle-safe)."""
    out = set(classes)
    frontier = list(classes)
    while frontier:
        c = frontier.pop()
        for s in down.get(c, ()):
            if s not in out:
                out.add(s)
                frontier.append(s)
    return out


def _typed_nodes(triples: DataFrame, subtypes: set[str]) -> DataFrame:
    """Distinct subjects with rdf:type in ``subtypes`` (driver list).
    Small lists inline as a literal isin; large ones broadcast-join a
    parallelized frame (thousands of isin literals choke Catalyst
    re-analysis — measured in shacl/incremental.py)."""
    typed = triples.where(F.col("pred") == RDF_TYPE)
    subs = sorted(subtypes)
    if len(subs) <= 256:
        hits = typed.where(F.col("obj").isin(subs)) if subs else typed.limit(0)
    else:
        sdf = triples.sparkSession.createDataFrame(
            [(s,) for s in subs], "sub string"
        )
        hits = typed.join(F.broadcast(sdf), F.col("obj") == F.col("sub"), "inner")
    return (
        hits.select(F.col("subj").alias("node"))
        .distinct()
        .select(
            "node",
            subject_kind_col(F.col("node")).alias("kind"),
            F.lit(None).cast("string").alias("dt"),
            F.lit(None).cast("string").alias("lang"),
        )
    )


def instances_of(triples: DataFrame, closure, class_iri: str) -> DataFrame:
    """SHACL instances of ``class_iri``: nodes with rdf:type T where
    T subClassOf* class_iri.  ``closure`` is either the driver-side
    direct-subs map (literal filter, no join) or the distributed
    closure frame (broadcast the small slice)."""
    if isinstance(closure, dict):
        return _typed_nodes(triples, subtypes_of(closure, [class_iri]))
    subtypes = closure.where(F.col("sup") == class_iri).select("sub")
    return (
        triples.where(F.col("pred") == RDF_TYPE)
        .join(F.broadcast(subtypes), F.col("obj") == F.col("sub"), "inner")
        .select(F.col("subj").alias("node"))
        .distinct()
        .select(
            "node",
            subject_kind_col(F.col("node")).alias("kind"),
            F.lit(None).cast("string").alias("dt"),
            F.lit(None).cast("string").alias("lang"),
        )
    )


def focus_nodes(
    spark: SparkSession, shape: Shape, triples: DataFrame, closure: DataFrame
) -> DataFrame:
    """Union of all declared targets, deduped on term identity."""
    frames: list[DataFrame] = []
    if shape.target_nodes:
        frames.append(nodes_from_terms(spark, shape.target_nodes))

    classes = list(shape.target_classes)
    if shape.implicit_class_target:
        classes.append(shape.iri)
    if classes:
        # one type-scan for ALL target classes (a shape with k
        # targetClass declarations would otherwise scan the rdf:type
        # slice k times and dedup k frames); with a driver-side closure
        # map the subtype set inlines as a literal filter — no join
        if isinstance(closure, dict):
            frames.append(_typed_nodes(triples, subtypes_of(closure, classes)))
        else:
            subtypes = (
                closure.where(F.col("sup").isin(classes)).select("sub").distinct()
            )
            frames.append(
                triples.where(F.col("pred") == RDF_TYPE)
                .join(F.broadcast(subtypes), F.col("obj") == F.col("sub"), "inner")
                .select(F.col("subj").alias("node"))
                .distinct()
                .select(
                    "node",
                    subject_kind_col(F.col("node")).alias("kind"),
                    F.lit(None).cast("string").alias("dt"),
                    F.lit(None).cast("string").alias("lang"),
                )
            )

    for p in shape.target_subjects_of:
        frames.append(
            triples.where(F.col("pred") == p)
            .select(F.col("subj").alias("node"))
            .distinct()
            .select(
                "node",
                subject_kind_col(F.col("node")).alias("kind"),
                F.lit(None).cast("string").alias("dt"),
                F.lit(None).cast("string").alias("lang"),
            )
        )
    for p in shape.target_objects_of:
        frames.append(
            triples.where(F.col("pred") == p)
            .select(
                node_key_col(
                    F.col("obj_kind"), F.col("obj"), F.col("obj_dt"), F.col("obj_lang")
                ).alias("node"),
                F.col("obj_kind").alias("kind"),
                F.col("obj_dt").alias("dt"),
                F.col("obj_lang").alias("lang"),
            )
            .dropDuplicates(["node"])
        )

    if not frames:
        return empty_nodes(spark)
    if len(frames) == 1:
        return frames[0]  # every constituent above is already distinct
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.dropDuplicates(["node", "kind", "dt", "lang"])
