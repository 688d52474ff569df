"""Entity-linking similarity scoring (SURVEY.md §2.A A9).

Candidate pairs (from LSH blocking) are scored with an Arrow-batched
pandas UDF computing character-shingle Jaccard — whole batches in
numpy/pure-python sets, no per-row Spark overhead.  Dictionary linking
broadcasts the (small) canonical-entity dictionary per BASELINE.json:6
("broadcast dictionary of canonical entity IRIs … pandas-UDF
similarity scorer").
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NORM_RE = re.compile(r"[^a-z0-9]")


def _shingle_set(name: str, k: int = 3) -> set[str]:
    norm = _NORM_RE.sub("", name.lower())
    if len(norm) < k:
        norm = norm.ljust(k, "_")
    return {norm[i : i + k] for i in range(len(norm) - k + 1)}


def jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = _shingle_set(a, k), _shingle_set(b, k)
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 0.0


@F.pandas_udf(T.DoubleType())
def jaccard_udf(name_a: pd.Series, name_b: pd.Series) -> pd.Series:
    # cache shingle sets within the batch — candidate pairs repeat names
    cache: dict[str, set[str]] = {}

    def get(n: str) -> set[str]:
        s = cache.get(n)
        if s is None:
            s = _shingle_set(n)
            cache[n] = s
        return s

    out = []
    for a, b in zip(name_a, name_b):
        sa, sb = get(a), get(b)
        union = len(sa | sb)
        out.append(len(sa & sb) / union if union else 0.0)
    return pd.Series(out)


def score_pairs(pairs: DataFrame, threshold: float = 0.6) -> DataFrame:
    """pairs DF[id_a, id_b, name_a, name_b] → matches above threshold."""
    return (
        pairs.withColumn("score", jaccard_udf("name_a", "name_b"))
        .where(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def link_to_dictionary(
    mentions: DataFrame,
    dictionary: DataFrame,
    mention_id: str = "id",
    mention_name: str = "name",
    dict_iri: str = "iri",
    dict_name: str = "name",
    threshold: float = 0.5,
) -> DataFrame:
    """Best dictionary match per mention: broadcast the dictionary,
    block on the first character of the normalized form (cheap guard
    against a full cross product), score with the pandas UDF, keep the
    per-mention argmax above threshold → DF[id, canonical_iri, score]."""
    from pyspark.sql import Window as W

    m = mentions.select(
        F.col(mention_id).alias("id"),
        F.col(mention_name).alias("mname"),
        F.substring(F.regexp_replace(F.lower(mention_name), "[^a-z0-9]", ""), 1, 1).alias("blk"),
    )
    d = dictionary.select(
        F.col(dict_iri).alias("canonical_iri"),
        F.col(dict_name).alias("dname"),
        F.substring(F.regexp_replace(F.lower(dict_name), "[^a-z0-9]", ""), 1, 1).alias("blk"),
    )
    scored = (
        m.join(F.broadcast(d), "blk", "inner")
        .withColumn("score", jaccard_udf("mname", "dname"))
        .where(F.col("score") >= threshold)
    )
    w = W.partitionBy("id").orderBy(F.desc("score"), F.asc("canonical_iri"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("id", "canonical_iri", "score")
    )
