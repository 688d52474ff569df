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
    mention IRIs — DF[id, name]."""
    named = triples.where(F.col("pred") == KG + "name").select(
        F.col("subj").alias("id"), F.col("obj").alias("name")
    )
    mentions = (
        triples.where(F.col("obj").startswith(KG + "mention/"))
        .select(F.col("obj").alias("id"))
        .distinct()
        .withColumn("name", F.substring_index(F.col("id"), "/", -1))
    )
    return named.unionByName(mentions).dropDuplicates(["id"])


def build_component_map(
    triples: DataFrame,
    threshold: float = 0.75,
    n_hashes: int = 64,
    bands: int = 16,
    max_bucket: int = 64,
) -> DataFrame:
    """DF[id, canonical] for every entity that belongs to a match
    component (representative = min IRI, deterministic)."""
    names = entity_name_frame(triples)
    pairs = candidate_pairs(
        names, n_hashes=n_hashes, bands=bands, max_bucket=max_bucket
    )
    matches = score_pairs(pairs, threshold=threshold)
    comps = connected_components(
        matches.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    return comps.where(F.col("id") != F.col("component")).select(
        "id", F.col("component").alias("canonical")
    )


def rewrite_triples(triples: DataFrame, comp_map: DataFrame) -> DataFrame:
    """A11: rewrite subj and obj through the canonical map (two
    broadcast joins + coalesce), then re-dedup (A12)."""
    subj_map = F.broadcast(
        comp_map.select(F.col("id").alias("subj"), F.col("canonical").alias("subj_canon"))
    )
    obj_map = F.broadcast(
        comp_map.select(F.col("id").alias("obj"), F.col("canonical").alias("obj_canon"))
    )
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
            "src_repo",
            "src_path",
            "src_commit",
            "part_id",
        )
    )
    # obj_kind participates in triple identity: an IRI object and a
    # literal object with the same lexical form are distinct triples
    # (matches engine.py's input normalization; ADVICE r01)
    return rewritten.dropDuplicates(
        ["subj", "pred", "obj", "obj_kind", "obj_dt", "obj_lang"]
    )


def canonicalize(triples: DataFrame, threshold: float = 0.75) -> DataFrame:
    """Full A7–A12: link, resolve, rewrite, dedup."""
    comp_map = build_component_map(triples, threshold=threshold)
    return rewrite_triples(triples, comp_map)
