"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline — broadcast the (small)
  query set, score every row with JVM-side higher-order functions,
  take per-query top-k with a ranking window.
- IVF-style LSH-bucketed ANN: deterministic random-hyperplane sign
  buckets (planes derived from a fixed seed on the driver, embedded as
  literal arrays → pure Column math).  At 100 TB the bucket key is the
  shuffle/partition key; queries probe only their own bucket (and
  optionally neighboring buckets by flipping one bit — multiprobe).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from shacl_spark.functions.vectors import cosine_similarity, dot, l2_norm


def _planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit hyperplanes (driver-side, tiny)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / norm for x in v])
    return planes


def hyperplane_bucket(vec: Column, n_planes: int = 8, dim: int = 64, seed: int = 42) -> Column:
    """LSH bucket id = sign-bit string of dot products with fixed
    hyperplanes — entirely JVM-side (literal plane arrays + zip_with)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(_planes(dim, n_planes, seed)):
        plane_col = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(vec, plane_col) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return bucket


def brute_force_topk(
    data: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query: broadcast queries (small side),
    score all data rows, per-query ranking window.

    DF[query_id, vec_id, cosine, rank]."""
    # norms are precomputed ONCE per row/query instead of per scored
    # pair (r06): cosine = dot/(dn·qn) evaluates the same expressions
    # in the same order, so values are bit-identical, but the k-way
    # fan-out no longer recomputes each side's norm k times
    q = F.broadcast(
        queries.select(
            F.col(query_id), F.col(vec_col).alias("qv"),
            l2_norm(F.col(vec_col)).alias("qn"),
        )
    )
    scored = data.select(
        F.col(id_col), F.col(vec_col).alias("dv"),
        l2_norm(F.col(vec_col)).alias("dn"),
    ).crossJoin(q)
    scored = scored.withColumn(
        "cosine", dot(F.col("dv"), F.col("qv")) / (F.col("dn") * F.col("qn"))
    )
    w = W.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, id_col, "cosine", "rank")
    )


def lsh_topk(
    data: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    k: int = 10,
    n_planes: int = 6,
    dim: int = 64,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: equi-join on the hyperplane bucket instead of
    a cross product.  With multiprobe, each query also probes the
    n_planes one-bit-flip neighbor buckets (recall boost at small cost).
    The scale path: data is hash-partitioned by bucket; per-bucket
    candidate sets are tiny fractions of the corpus."""
    d = (
        data.select(
            F.col(id_col), F.col(vec_col).alias("dv"),
            l2_norm(F.col(vec_col)).alias("dn"),
        )
        .withColumn("bucket", hyperplane_bucket(F.col("dv"), n_planes, dim))
    )

    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
    ).withColumn("qbucket", hyperplane_bucket(F.col("qv"), n_planes, dim))
    if multiprobe:
        probes = F.array(
            F.col("qbucket"),
            *[F.col("qbucket").bitwiseXOR(F.lit(1 << i)).cast("long") for i in range(n_planes)],
        )
        q = q.withColumn("bucket", F.explode(probes))
    else:
        q = q.withColumn("bucket", F.col("qbucket"))

    scored = d.join(F.broadcast(q.select(query_id, "qv", "qn", "bucket")), "bucket")
    scored = scored.withColumn(
        "cosine", dot(F.col("dv"), F.col("qv")) / (F.col("dn") * F.col("qn"))
    )
    w = W.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, id_col, "cosine", "rank")
    )


def centroids_by_label(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """Per-label mean vector — element-wise agg via posexplode +
    groupBy(label, pos) + array rebuild.  (A grouped-agg pandas UDF is
    the alternative; this stays JVM-side.)"""
    exploded = emb.select(
        F.col(label_col), F.posexplode(F.col(vec_col)).alias("pos", "x")
    )
    means = exploded.groupBy(label_col, "pos").agg(F.avg("x").alias("m"))
    return (
        means.groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            label_col,
            F.transform(F.col("pm"), lambda s: s["m"]).alias("centroid"),
        )
    )


def ivf_topk(
    data: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF-flat approximate top-k (r04): a coarse quantizer assigns
    every vector to its nearest centroid (the inverted-list cell), and
    each query searches only its ``nprobe`` nearest cells.

    The quantizer here is deterministic — the ``n_centroids`` lowest-id
    data vectors, collected to the driver (tiny: n_centroids × dim) and
    embedded as literal arrays, so assignment is pure JVM Column math
    with NO join, exactly how a k-means codebook would be broadcast at
    deployment scale (train offline, ship the codebook).  At 100 TB the
    cell id is the partition key: each probe touches ~nprobe/n_centroids
    of the corpus.

    DF[query_id, vec_id, cosine, rank]."""
    cent_rows = (
        data.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy("i")
        .limit(n_centroids)
        .collect()
    )
    cents = [[float(x) for x in r["v"]] for r in cent_rows]

    def cell_of(vec: Column, top_n: int) -> Column:
        """Ranked nearest-centroid cell ids (argmax cosine, ties to the
        LARGER index — mirrored in the DuckDB oracle)."""
        scored = F.array(
            *[
                F.struct(
                    cosine_similarity(
                        vec, F.array(*[F.lit(x) for x in c])
                    ).alias("c"),
                    F.lit(j).alias("j"),
                )
                for j, c in enumerate(cents)
            ]
        )
        ranked = F.sort_array(scored, asc=False)  # (c desc, j desc)
        return F.slice(F.transform(ranked, lambda s: s["j"]), 1, top_n)

    d = data.select(
        F.col(id_col), F.col(vec_col).alias("dv"),
        l2_norm(F.col(vec_col)).alias("dn"),
    ).withColumn("cell", cell_of(F.col("dv"), 1)[0])

    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
    ).withColumn("cell", F.explode(cell_of(F.col("qv"), nprobe)))
    scored = d.join(F.broadcast(q.select(query_id, "qv", "qn", "cell")), "cell")
    scored = scored.withColumn(
        "cosine", dot(F.col("dv"), F.col("qv")) / (F.col("dn") * F.col("qn"))
    )
    w = W.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, id_col, "cosine", "rank")
    )
