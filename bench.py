#!/usr/bin/env python
"""Benchmark harness.

Default mode (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``--kg-only N_FILES`` : run just the KG extract→dedup pipeline over a
N_FILES synthetic corpus and print its JSON (used by --scaling).
``--scaling``         : spawn two subprocesses (local[8], local[32])
running the SAME --kg-only job on the SAME input and write the
throughput + scaling-efficiency table to BENCH/BASELINE.md — the
sandbox substitute for the N vs 4N executor criterion
(BASELINE.json:14; driver instruction).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HEADLINE = [
    "agg_pricing_summary",
    "join_broadcast_dims",
    "join_shuffle_revenue_topk",
    "join_asof_latest_order",
    "window_topk_per_group",
    "rollup_revenue",
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "ann_brute_force_topk",
    "text_token_stats",
    "stream_tumbling_counts",
    "kg_extract_documents",
]

KG_BENCH_FILES = int(os.environ.get("SPARK_GRAFT_KG_FILES", "20000"))


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_kg(spark, n_files: int) -> dict:
    """Extraction+dedup throughput (triples/sec) over the synthetic
    corpus — the pipeline's hot path (linking/validation are bounded by
    the distinct-entity count, not corpus size)."""
    from shacl_spark.kg.extract import extract_triples
    from shacl_spark.sources.corpus import synth_corpus

    corpus = synth_corpus(spark, n_files)
    t0 = time.time()
    n_triples = extract_triples(corpus, n_parts=1024).count()
    dt = time.time() - t0
    return {
        "n_files": n_files,
        "n_triples": n_triples,
        "sec": round(dt, 2),
        "triples_per_sec": round(n_triples / dt, 1),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kg-only", type=int, default=0)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    if args.scaling:
        return run_scaling()

    from shacl_spark.session import get_spark

    spark = get_spark("bench", master=args.master)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    if args.kg_only:
        out = run_kg(spark, args.kg_only)
        print(json.dumps(out))
        return 0

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)

    kg = run_kg(spark, KG_BENCH_FILES)
    total = round(sum(timings.values()) + kg["sec"], 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_kg_extract",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_of(sf_dir),
                "kg": kg,
            }
        )
    )
    return 0


def run_scaling() -> int:
    """local[8] vs local[32] on the same input: throughput + efficiency."""
    results = {}
    n_files = KG_BENCH_FILES
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        out = subprocess.run(
            [sys.executable, __file__, "--kg-only", str(n_files)],
            env=env,
            capture_output=True,
            text=True,
            timeout=1800,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)

    thr8 = results[8]["triples_per_sec"]
    thr32 = results[32]["triples_per_sec"]
    eff = round((thr32 / thr8) / 4.0, 3)

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH — measured scaling evidence (BASELINE.json:14 criterion)

Same job (synthetic-corpus triple extraction + dedup, {n_files} files,
{results[8]['n_triples']} triples) at two parallelism levels on the same
input — the sandbox substitute for N vs 4N executors.

| parallelism | wall sec | triples/sec |
| --- | --- | --- |
| local[8]  | {results[8]['sec']} | {thr8} |
| local[32] | {results[32]['sec']} | {thr32} |

**Scaling efficiency (thr32 / thr8) / 4 = {eff}**  (target ≥ 0.80)
"""
        )
    print(json.dumps({"thr8": thr8, "thr32": thr32, "efficiency": eff}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
