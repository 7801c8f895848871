#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized via a count over the result (no
collect of payloads), after a warm-up of the parquet footers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from solarpaneldatawrangler_spark.plans import CATALOG  # noqa: E402
from solarpaneldatawrangler_spark.session import get_spark, sf_dir_from_env  # noqa: E402

# headline set: scans/top-k, join+agg, window, grid, spatial, CC, dedup,
# text, ANN — one per operator family
HEADLINE = [
    "q01_priority_scan",
    "q06_broadcast_join_agg",
    "q09_groupby_topk",
    "q12_window_rank",
    "q20_sessionize",
    "q30_deg2num",
    "q35_gc_retention",
    "q36_grid_enum",
    "q38_spatial_contains",
    "q40_connected_components",
    "q50_exact_dedup",
    "q52_quality_score",
    "q55_minhash_neardup",
    "q58_ann_bruteforce",
]


def main() -> None:
    sf_dir = sf_dir_from_env()
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    spark = get_spark("spark-wrangler-bench")
    # best-of-N: this host shows occasional ~100s external stalls; the
    # minimum is the engine's actual cost
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))

    # warm the JVM + parquet footers so query 1 doesn't pay session startup
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        spec = CATALOG[name]
        best, n = float("inf"), 0
        for _ in range(max(repeats, 1)):
            t0 = time.perf_counter()
            n = spec.fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        total += best
        print(f"# {name}: {best:.3f}s ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_query_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
