"""Canonical rewrite + entity canonicalization pipeline (SURVEY.md
§2.A A9–A12): near-duplicate symbol/mention names → one canonical IRI.

Pipeline: distinct entity names → LSH candidate pairs (minhash.py) →
pandas-UDF Jaccard scores (link.py) → connected components (cc.py) →
rewrite subj/obj through the component map.  The component map is tiny
relative to the triple set (only matched entities appear), so both
rewrite joins broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shacl_spark.functions.terms import KG, RDF_TYPE
from shacl_spark.kg.cc import connected_components
from shacl_spark.kg.link import score_pairs
from shacl_spark.kg.minhash import candidate_pairs


def entity_name_frame(triples: DataFrame) -> DataFrame:
    """Linkable entities: defined symbols (via kg:name literals) and
    mention IRIs — DF[id, name].

    ONE scan emits both entity kinds via a when-array explode (r06,
    VERDICT r05 #8): the old two-filter union scanned the triple frame
    twice per consumer.  A row can satisfy both arms (a kg:name literal
    that happens to start with the mention prefix) — both entries are
    emitted, exactly as the union did, and the final dropDuplicates
    keeps one row per id either way."""
    arms = [
        F.when(
            F.col("pred") == KG + "name",
            F.struct(F.col("subj").alias("id"), F.col("obj").alias("name")),
        ),
        F.when(
            F.col("obj").startswith(KG + "mention/"),
            F.struct(
                F.col("obj").alias("id"),
                F.substring_index(F.col("obj"), "/", -1).alias("name"),
            ),
        ),
    ]
    return (
        triples.select(F.explode(F.array(*arms)).alias("e"))
        .where(F.col("e").isNotNull())
        .select(F.col("e.id").alias("id"), F.col("e.name").alias("name"))
        .dropDuplicates(["id"])
    )


def build_component_map(
    triples: DataFrame,
    threshold: float = 0.75,
    n_hashes: int = 64,
    bands: int = 16,
    max_bucket: int = 64,
    cc_stats: dict | None = None,
) -> DataFrame:
    """DF[id, canonical] for every entity that belongs to a match
    component (representative = min IRI, deterministic).  ``cc_stats``
    is passed through to connected_components for convergence
    observability.

    Two-tier matching (the 100 TB shape, fixed r03): entities sharing
    an IDENTICAL name are grouped LINEARLY (one groupBy → star edges to
    the min-id representative) — at corpus scale a popular class name
    appears in thousands of files, and pushing those through LSH either
    explodes quadratically or, with the bucket cap, silently drops them
    (exactly what happened at 20k files: every same-name bucket blew
    past max_bucket and the match graph came back EMPTY).  LSH + the
    pandas-UDF scorer then run over DISTINCT names only — the near-dup
    problem ("HttpClient" vs "HTTPClient") is a property of names, not
    of their occurrences, and the distinct-name frame is orders of
    magnitude smaller."""
    # the name frame feeds three consumers (reps, the LSH pipeline via
    # distinct names, and the final member-glue join); checkpoint it
    # once — it is O(entities), tiny next to the triple set, and
    # without this every downstream action recomputes the full triple
    # scan + distinct (measured ~5 s/pass at the 20k-file bench corpus)
    names = entity_name_frame(triples).localCheckpoint(eager=True)
    reps = names.groupBy("name").agg(F.min("id").alias("rep"))
    distinct_names = reps.select(F.col("rep").alias("id"), "name")
    # materialize=False: connected_components checkpoints the scored
    # pair pipeline one step later, so a separate pair checkpoint job
    # here would be pure overhead; the bucket-cap Observation resolves
    # against THAT materialization instead (r06)
    pairs = candidate_pairs(
        distinct_names, n_hashes=n_hashes, bands=bands, max_bucket=max_bucket,
        stats=cc_stats, materialize=False,
    )
    matches = score_pairs(pairs, threshold=threshold)
    # the ITERATIVE algorithm runs only on the rep-level near-dup graph
    # (O(#distinct names) nodes); gluing the exact-name stars back is
    # two hash joins — components over (stars ∪ matches) factor exactly
    # this way because every member's only edge is to its name's rep,
    # and component minima coincide (rep = min id per name)
    rep_comps = connected_components(
        matches.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        stats=cc_stats,
    )
    if cc_stats is not None:
        from shacl_spark.kg.minhash import resolve_lsh_stats

        resolve_lsh_stats(cc_stats)
    canon_of_name = reps.join(
        rep_comps, reps["rep"] == rep_comps["id"], "left"
    ).select(
        "name", F.coalesce("component", "rep").alias("canonical")
    )
    return (
        names.join(canon_of_name, "name")
        .where(F.col("id") != F.col("canonical"))
        .select("id", "canonical")
    )


def rewrite_triples(
    triples: DataFrame, comp_map: DataFrame, broadcast_map: bool = True
) -> DataFrame:
    """A11: rewrite subj and obj through the canonical map (two
    broadcast joins + coalesce), then re-dedup (A12) keeping the
    lexicographically smallest provenance per triple — dropDuplicates
    would keep whichever copy the physical plan happened to encounter
    first, making the output differ between the broadcast and shuffle
    rewrite plans (and across resumes), which breaks the byte-identity
    resumability story.

    ``broadcast_map=False`` switches to shuffle joins for deployments
    where the map outgrows executor memory (it is O(matched entities);
    with r03's exact-name tier that is every duplicated symbol, so at
    extreme corpus scale prefer False and let AQE pick).

    The subj and obj joins consume the SAME broadcast: both sides hint
    the identical (id, canonical) plan and rename only above the join,
    so ReuseExchange collapses them into one BroadcastExchange — the
    map is O(matched entities) and collecting it twice was the largest
    serial (driver-side, input-proportional) slice of the rewrite
    (measured r05: two 650k-row broadcasts at the 100k-file corpus).

    The shuffle plan hints SHUFFLE_HASH on the map side: Catalyst's
    default sort-merge join SORTS the fat triple frame twice, and the
    sort — not the shuffle — dominated (measured r05 at 6M triples /
    1.3M-row map: SMJ 19.1 s vs hash 4.2 s, 4.5×).  Hash build on the
    map side is safe at any corpus scale: the per-partition build set
    is O(matched entities / shuffle partitions) — strictly smaller
    than what the broadcast plan would pin on every executor."""
    wrap = (
        F.broadcast if broadcast_map else (lambda df: df.hint("shuffle_hash"))
    )
    base_map = wrap(comp_map.select("id", "canonical"))
    subj_map = base_map.select(
        F.col("id").alias("subj"), F.col("canonical").alias("subj_canon")
    )
    obj_map = base_map.select(
        F.col("id").alias("obj"), F.col("canonical").alias("obj_canon")
    )
    ident = ["subj", "pred", "obj", "obj_kind", "obj_dt", "obj_lang"]
    extra = [c for c in triples.columns if c not in ident]
    rewritten = (
        triples.join(subj_map, "subj", "left")
        .join(obj_map, "obj", "left")
        .select(
            F.coalesce("subj_canon", "subj").alias("subj"),
            "pred",
            # only rewrite IRI objects — literal lexical forms never change
            F.when(
                F.col("obj_kind") == "iri", F.coalesce("obj_canon", "obj")
            ).otherwise(F.col("obj")).alias("obj"),
            "obj_kind",
            "obj_dt",
            "obj_lang",
            *extra,
        )
    )
    # obj_kind participates in triple identity: an IRI object and a
    # literal object with the same lexical form are distinct triples
    # (matches engine.py's input normalization; ADVICE r01).  Same
    # single shuffle as dropDuplicates — a hash aggregate on the
    # identity key — but min(struct) instead of arbitrary-first for the
    # surviving provenance.  The provenance struct is derived from the
    # input frame's ACTUAL extra columns (ADVICE r05, low: hard-coding
    # src_repo/... broke callers passing a bare six-column frame, which
    # the pre-r05 dropDuplicates handled fine).
    if not extra:
        return rewritten.dropDuplicates(ident)
    prov = F.min(F.struct(*extra)).alias("_prov")
    return (
        rewritten.groupBy(*ident)
        .agg(prov)
        .select(*ident, *[F.col(f"_prov.{c}").alias(c) for c in extra])
    )


def canonicalize(
    triples: DataFrame,
    threshold: float = 0.75,
    cc_stats: dict | None = None,
    checkpoint_input: bool = True,
    broadcast_map: bool = True,
) -> DataFrame:
    """Full A7–A12: link, resolve, rewrite, dedup.

    ``checkpoint_input=True`` (default) materializes the triple frame
    once before the two passes over it (entity names, rewrite) — right
    when the input is a computed lineage like a fresh extraction, whose
    re-run would dominate.  Pass False at deployment scale when the
    input is already columnar storage: rescanning parquet beats
    materializing 100 TB to executor memory.

    ``broadcast_map`` picks the rewrite join strategy (see
    rewrite_triples): True is fastest while the component map fits the
    driver (bench scale); False is the cluster-scale plan — the map is
    O(matched entities), which grows with the corpus, and the shuffle
    join keeps the rewrite fully partition-parallel with no
    driver-side collect on the hot path."""
    if checkpoint_input:
        triples = triples.localCheckpoint(eager=True)
    comp_map = build_component_map(triples, threshold=threshold, cc_stats=cc_stats)
    return rewrite_triples(triples, comp_map, broadcast_map=broadcast_map)
