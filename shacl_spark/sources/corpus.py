"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Input shape per BASELINE.json:15 — ``(repo, path, commit, lang,
content)``.  Generation is a pure function of the file index with a
fixed seed, so:

- it scales: built with ``spark.range(n).mapInPandas`` — each executor
  generates its slice independently, no driver materialization, no
  shuffle; at 10^12-file scale the same code fans out across executors;
- it is reproducible: the pure-Python ``gen_file(i)`` is shared with
  tests/oracle.py, making per-row ``sha256(content)`` parity
  (BASELINE.json:15) testable byte-for-byte.

Planted structure (drives downstream tests):
- hub imports: ``os``/``sys``/``json`` in ~30% of files → skew handling;
- near-duplicate entity names (``HttpClient``/``HTTPClient``/
  ``http_client``) in ~5% of files → entity linking/canonicalization;
- 90% python / 10% javascript → multi-lang extraction dispatch.
"""

from __future__ import annotations

import hashlib
import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
    ]
)

SEED = 42

_MODULES = [f"lib{i}" for i in range(47)] + ["os", "sys", "json"]
_HUBS = ["os", "sys", "json"]
_DUP_FAMILIES = [
    ["HttpClient", "HTTPClient", "http_client"],
    ["JsonParser", "JSONParser", "json_parser"],
    ["DbConn", "DBConn", "db_conn"],
]
_NAMES = [f"Widget{i}" for i in range(40)]
_VERBS = ["run", "load", "save", "parse", "emit", "fold", "scan", "push"]


def gen_file(i: int) -> tuple[str, str, str, str, str]:
    """Pure deterministic generator for file #i (shared with the oracle)."""
    rng = random.Random(SEED * 1_000_003 + i)
    repo = f"org{i % 7}/repo{i % 23}"
    lang = "python" if rng.random() < 0.9 else "javascript"
    ext = "py" if lang == "python" else "js"
    path = f"src/pkg{i % 11}/mod{i}.{ext}"
    commit = hashlib.sha256(f"{repo}:{i % 5}".encode()).hexdigest()[:40]

    imports = []
    if rng.random() < 0.30:  # planted hub imports → skew
        imports.append(rng.choice(_HUBS))
    imports += rng.sample(_MODULES[:47], rng.randint(1, 4))

    classes = []
    if rng.random() < 0.05:  # planted near-duplicate entities
        fam = rng.choice(_DUP_FAMILIES)
        classes.append((rng.choice(fam), "object"))
    for _ in range(rng.randint(0, 4)):
        classes.append((rng.choice(_NAMES), rng.choice(_NAMES + ["object"])))

    funcs = [f"{rng.choice(_VERBS)}_{rng.randrange(100)}" for _ in range(rng.randint(1, 8))]
    calls = rng.sample(funcs + imports, min(len(funcs + imports), rng.randint(1, 6)))

    lines: list[str] = []
    if lang == "python":
        for m in imports:
            if rng.random() < 0.5:
                lines.append(f"import {m}")
            else:
                lines.append(f"from {m} import {rng.choice(_VERBS)}")
        for cname, base in classes:
            lines.append(f"class {cname}({base}):")
            lines.append("    pass")
        for fn in funcs:
            kw = "async def" if rng.random() < 0.1 else "def"
            lines.append(f"{kw} {fn}(x):")
            lines.append(f"    return {rng.choice(calls)}(x)")
    else:
        for m in imports:
            lines.append(f"const {m} = require('{m}');")
        for cname, base in classes:
            lines.append(f"class {cname} extends {base} {{}}")
        for fn in funcs:
            lines.append(f"function {fn}(x) {{ return {rng.choice(calls)}(x); }}")
    content = "\n".join(lines) + "\n"
    return repo, path, commit, lang, content


def gen_rows(n: int, start: int = 0) -> list[tuple[str, str, str, str, str]]:
    """Driver/oracle-side batch generation (small n only)."""
    return [gen_file(i) for i in range(start, start + n)]


def synth_corpus(
    spark: SparkSession,
    n_files: int,
    parts: int | None = None,
    with_mentions: bool = True,
) -> DataFrame:
    """Distributed generation: ``spark.range`` → ``mapInPandas``.

    Narrow (no shuffle); each task generates only its index slice.

    ``with_mentions=True`` (default) additionally runs the mention
    extractor (kg/extract.extract_mentions_batch — the SAME kernel the
    Arrow UDF applies) inside the generation stage and emits the
    result as a ``mentions`` column.  extract_triples consumes it when
    present, so generation + mention detection cross the JVM↔Python
    boundary ONCE instead of twice (guide §4: each mapInPandas /
    pandas-UDF stage pays a per-task Python-runner round trip — at the
    bench's frozen 128-partition contract that second stage alone cost
    ~0.5 s of pure machinery).  Triples are identical either way (same
    kernel, same content)."""
    parts = parts or max(spark.sparkContext.defaultParallelism, 8)

    if with_mentions:
        from shacl_spark.kg.extract import MENTION_SCHEMA, extract_mentions_batch

        schema = T.StructType(
            list(CORPUS_SCHEMA.fields) + [T.StructField("mentions", MENTION_SCHEMA, False)]
        )

        def gen(batches):
            for pdf in batches:
                rows = [gen_file(int(i)) for i in pdf["id"]]
                out = pd.DataFrame(
                    rows, columns=["repo", "path", "commit", "lang", "content"]
                )
                out["mentions"] = extract_mentions_batch(out["content"], out["lang"])
                yield out

        return spark.range(0, n_files, numPartitions=parts).mapInPandas(gen, schema)

    def gen_plain(batches):
        for pdf in batches:
            rows = [gen_file(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    return spark.range(0, n_files, numPartitions=parts).mapInPandas(gen_plain, CORPUS_SCHEMA)
