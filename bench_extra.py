#!/usr/bin/env python
"""Isolation benchmarks (guide §1.4) — NOT the driver contract.

Times individual declared queries with the noop sink (computes every
column of every row, discards the result) instead of count() so the
optimizer cannot prune work, warm best-of-N, one job description per
query so the UI/event log stays readable (§1.5).

Usage::

    python bench_extra.py [query ...]          # default: headline set
    SPARK_GRAFT_SF_DIR=/tmp/sf1synth python bench_extra.py join_shuffle_revenue_topk

Prints one JSON line: {"sf_dir": ..., "runs": N, "queries": {name:
{"best": s, "runs": [...]}}}.
"""

from __future__ import annotations

import json
import os
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


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main(argv: list[str] | None = None) -> int:
    names = (argv if argv is not None else sys.argv[1:]) or HEADLINE
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    from shacl_spark.session import get_spark

    spark = get_spark("bench_extra")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        sc = spark.sparkContext
        sc.setJobDescription(f"bench_extra: {name} (warm)")
        noop(fn(spark, sf_dir))  # warm: python workers, codegen, FS cache
        runs = []
        for i in range(n_runs):
            sc.setJobDescription(f"bench_extra: {name} [{i}]")
            t0 = time.time()
            noop(fn(spark, sf_dir))
            runs.append(round(time.time() - t0, 3))
        sc.setJobDescription(None)
        out[name] = {"best": min(runs), "runs": runs}
    print(json.dumps({"sf_dir": sf_dir, "runs": n_runs, "queries": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
