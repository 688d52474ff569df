"""Multimodal column plumbing (images/audio/video as opaque binary +
typed metadata).

The decode libraries (PIL/ffmpeg/librosa) are NOT in this container,
so the decode kernels are deterministic fakes / explicit
NotImplementedError stubs — but the Spark-side machinery is real and
tested: schema, Arrow batch shape, ``mapInPandas`` partition flow,
binary-safe partitioning, and metadata pushdown.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        # double (not float32) so the deterministic stub kernel is
        # bit-reproducible by the DuckDB oracle; a real embedding
        # kernel would use float32 here
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def synth_media(spark: SparkSession, n: int, parts: int = 8) -> DataFrame:
    """Deterministic fake media table — payload bytes derived from the
    id, so tests are reproducible without real codecs."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = ("image", "audio", "video")[i % 3]
                payload = bytes((i * 31 + j) % 256 for j in range(128 + i % 64))
                rows.append(
                    (
                        i,
                        kind,
                        {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                        64 + i % 512 if kind != "audio" else None,
                        64 + (i * 7) % 512 if kind != "audio" else None,
                        1000 + i % 60000 if kind != "image" else None,
                        payload,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_SCHEMA.fields]
            )

    return spark.range(0, n, numPartitions=parts).mapInPandas(gen, MEDIA_SCHEMA)


def decode_image(payload: bytes) -> object:
    """Real decode requires PIL — not in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; wire the real kernel here on a "
        "cluster image that ships the codec libraries"
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding/feature extractor:
    byte-histogram moments.  Replaces decode_image+model.forward.

    Buckets accumulate EXACT integer byte sums and normalize once in
    double, in the same operation order the DuckDB oracle uses
    (SUM / 255.0 / n * dim) — bit-identical pre-round, so round(…, 6)
    agrees on both sides (no representable exact-half cases exist)."""
    acc = [0] * dim
    for j, b in enumerate(payload):
        acc[j % dim] += b
    n = max(len(payload), 1)
    return [round(x / 255.0 / n * dim, 6) for x in acc]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction — the real-world shape: iterate
    Arrow batches, run the (stubbed) kernel per batch, emit a narrow
    feature frame.  Batch sizing is controlled by
    spark.sql.execution.arrow.maxRecordsPerBatch (binary payloads are
    wide — keep batches small)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_feature(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "n_bytes": [len(p) for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: computes the frame timestamps to
    decode (JVM-side), leaving the decode itself to the stubbed kernel.
    Demonstrates metadata-only pushdown: no payload bytes move."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
