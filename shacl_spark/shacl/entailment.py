"""RDFS entailment (r05) — materialize the RDFS closure of a triple
frame before validation or querying.

SHACL hook: a shapes graph may declare ``sh:entailment
<http://www.w3.org/ns/entailment/RDFS>`` (SPEC §1.5 — a processor
"MAY support" entailment regimes; unsupported regimes must fail).
``validate(..., entailment='rdfs')`` (or the shapes-graph declaration)
runs this closure over the data graph first.

Rule subset — the classic RDFS "core" derivation rules over user
vocabulary (the container/annotation axioms of the full RDFS model
theory produce only rdf:/rdfs: namespace noise and are omitted,
matching what pragmatic validators implement):

    rdfs5   (p subPropertyOf q), (q subPropertyOf r) -> (p subPropertyOf r)
    rdfs7   (s p o), (p subPropertyOf q)             -> (s q o)
    rdfs2   (s p o), (p domain C)                    -> (s type C)
    rdfs3   (s p o), (p range C), o is IRI/bnode     -> (o type C)
    rdfs11  (C subClassOf D), (D subClassOf E)       -> (C subClassOf E)
    rdfs9   (s type C), (C subClassOf D)             -> (s type D)

Scale shape: the SCHEMA statements (subClassOf / subPropertyOf /
domain / range) are ontology-sized — orders of magnitude smaller than
the data graph — so their transitive closures are computed on the
driver and applied to the big frame as BROADCAST joins: one joins-only
linear pass over the data, no fixpoint on the distributed side, no
shuffle except the final dedup anti-join.  A schema larger than
``max_schema_rows`` raises instead of silently collecting the world.

Rule composition is ordered so one pass is complete: property closure
first (rdfs7 feeds rdfs2/3 through the derived predicates), then
domain/range typing, then class closure over ALL type statements
(original + derived).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shacl_spark.functions.terms import RDF, RDFS, TERM_COLS

SCO = RDFS + "subClassOf"
SPO = RDFS + "subPropertyOf"
DOM = RDFS + "domain"
RNG = RDFS + "range"
TYPE = RDF + "type"

RDFS_ENTAILMENT_IRI = "http://www.w3.org/ns/entailment/RDFS"


def _transitive(edges: dict[str, set[str]]) -> dict[str, set[str]]:
    """Strict transitive closure of a small driver-side DAG/graph
    (cycle-safe: a member of its own closure is just dropped)."""
    out: dict[str, set[str]] = {}
    for start in edges:
        seen: set[str] = set()
        frontier = list(edges[start])
        while frontier:
            n = frontier.pop()
            if n in seen:
                continue
            seen.add(n)
            frontier.extend(edges.get(n, ()))
        seen.discard(start)
        out[start] = seen
    return out


def _pairs_df(spark: SparkSession, closure: dict[str, set[str]], a: str, b: str):
    rows = sorted(
        (k, v) for k, vs in closure.items() for v in vs
    )
    if not rows:
        return None
    return F.broadcast(spark.createDataFrame(rows, f"{a} string, {b} string"))


def _as_triples(df: DataFrame) -> DataFrame:
    """Reduce derived rows to the six term columns; lineage (if the
    input carries any) is padded with NULLs at union time — entailed
    triples have no single source file."""
    return df.select(*TERM_COLS)


def rdfs_entailment(
    triples: DataFrame, max_schema_rows: int = 1_000_000
) -> DataFrame:
    """Return ``triples`` plus every rdfs2/3/5/7/9/11 consequence,
    deduplicated on term identity.  Deterministic: derived triples are
    a pure function of the input; originals keep their lineage and a
    derived duplicate of an existing triple is dropped (anti-join), so
    no original row is ever replaced by a lineage-less twin."""
    spark = triples.sparkSession
    schema_rows = (
        triples.where(F.col("pred").isin(SCO, SPO, DOM, RNG))
        .where(F.col("obj_kind") != "literal")
        .select("pred", "subj", "obj")
        .limit(max_schema_rows + 1)
        .collect()
    )
    if len(schema_rows) > max_schema_rows:
        raise ValueError(
            f"rdfs_entailment: schema statements exceed {max_schema_rows}; "
            "raise max_schema_rows if the ontology really is this large"
        )
    sco: dict[str, set[str]] = defaultdict(set)
    spo: dict[str, set[str]] = defaultdict(set)
    dom: dict[str, set[str]] = defaultdict(set)
    rng: dict[str, set[str]] = defaultdict(set)
    for r in schema_rows:
        {SCO: sco, SPO: spo, DOM: dom, RNG: rng}[r["pred"]][r["subj"]].add(
            r["obj"]
        )
    sco_c = _transitive(sco)
    spo_c = _transitive(spo)

    derived = []

    # rdfs5 — new subPropertyOf edges from the transitive closure
    # (strict supers beyond the asserted ones); rdfs11 likewise below.
    # Emitted as data so a downstream consumer sees the closed schema.
    def _schema_frame(closure, asserted, pred):
        rows = sorted(
            (s, o)
            for s, os_ in closure.items()
            for o in os_
            if o not in asserted.get(s, ())
        )
        if not rows:
            return None
        df = spark.createDataFrame(rows, "subj string, obj string")
        return _as_triples(
            df.select(
                "subj",
                F.lit(pred).alias("pred"),
                "obj",
                F.lit("iri").alias("obj_kind"),
                F.lit(None).cast("string").alias("obj_dt"),
                F.lit(None).cast("string").alias("obj_lang"),
            )
        )

    f = _schema_frame(spo_c, spo, SPO)
    if f is not None:
        derived.append(f)
    f = _schema_frame(sco_c, sco, SCO)
    if f is not None:
        derived.append(f)

    # rdfs7 — (s p o) + p ⊑* q  ->  (s q o).  Broadcast map join; the
    # derived frame also feeds domain/range typing below.
    pm = _pairs_df(spark, spo_c, "p", "q")
    prop_derived = None
    if pm is not None:
        prop_derived = _as_triples(
            triples.join(pm, triples["pred"] == pm["p"]).select(
                "subj",
                F.col("q").alias("pred"),
                "obj", "obj_kind", "obj_dt", "obj_lang",
            )
        )
        derived.append(prop_derived)

    stmts = triples.select(*TERM_COLS)
    if prop_derived is not None:
        stmts = stmts.unionByName(prop_derived.select(*TERM_COLS))

    def _type_row(subj_col: str):
        return (
            F.col(subj_col).alias("subj"),
            F.lit(TYPE).alias("pred"),
            F.col("c").alias("obj"),
            F.lit("iri").alias("obj_kind"),
            F.lit(None).cast("string").alias("obj_dt"),
            F.lit(None).cast("string").alias("obj_lang"),
        )

    # rdfs2 / rdfs3 — domain/range typing over the property-closed
    # statement set.  Asserted domains/ranges also apply through their
    # SUPERproperty statements only via rdfs7's output, which is
    # already in ``stmts`` — the standard rule composition.
    dm = _pairs_df(spark, {k: v for k, v in dom.items()}, "p", "c")
    if dm is not None:
        derived.append(
            _as_triples(
                stmts.join(dm, stmts["pred"] == dm["p"]).select(*_type_row("subj"))
            )
        )
    rm = _pairs_df(spark, {k: v for k, v in rng.items()}, "p", "c")
    if rm is not None:
        derived.append(
            _as_triples(
                stmts.join(rm, stmts["pred"] == rm["p"])
                .where(F.col("obj_kind") != "literal")
                .select(*_type_row("obj"))
            )
        )

    # rdfs9 — class closure over ALL type statements, incl. the ones
    # rdfs2/3 just derived (their classes' supers must apply too).
    cm = _pairs_df(spark, sco_c, "c0", "c")
    if cm is not None:
        typed = stmts.where(F.col("pred") == TYPE).select(
            "subj", F.col("obj").alias("c0")
        )
        for d in list(derived):
            dt_ = d.where(F.col("pred") == TYPE).select(
                "subj", F.col("obj").alias("c0")
            )
            typed = typed.unionByName(dt_)
        derived.append(
            _as_triples(
                typed.join(cm, "c0").select(*_type_row("subj")).distinct()
            )
        )

    if not derived:
        return triples
    new = derived[0]
    for d in derived[1:]:
        new = new.unionByName(d)
    new = new.dropDuplicates(TERM_COLS)
    # null-SAFE anti-join (ADVICE r05, high): obj_dt/obj_lang are NULL
    # for IRI objects, and a column-name join's NULL=NULL never matches,
    # so a derived triple that is also asserted would survive and
    # duplicate — violating RDF set semantics for bag-sensitive
    # consumers (COUNT over an entailed graph).  Same condition shape
    # as rules.infer_new.
    orig = triples.select(*TERM_COLS)
    cond = None
    for c in TERM_COLS:
        eq = new[c].eqNullSafe(orig[c])
        cond = eq if cond is None else (cond & eq)
    new = new.join(orig, cond, "left_anti")
    for c in triples.columns:
        if c not in new.columns:
            new = new.withColumn(c, F.lit(None).cast(triples.schema[c].dataType))
    return triples.unionByName(new.select(*triples.columns))
