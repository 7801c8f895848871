#!/usr/bin/env python
"""Cold-pass regression A/B (r13 VERDICT item 1).

The r13 builder-canonical record showed the cache-off (cold) headline
pass regress 4.510 -> 5.920 s vs r12 at a QUIETER canary, uniformly
1.13-1.48x across all 14 queries, with the extras same-set sum +21% —
in the same round the bench gained a fresh-JVM headline child and
q58_dist reps (commit 8397671).  Ordering says the fresh-headline child
cannot be the cause (it runs AFTER the cold pass), so this script
isolates the candidate causes inside ONE process, same host window:

  cold_early      cache-off headline pass run immediately after the
                  warm pass — zero gauntlet state, no children yet.
  cold_late       the SAME pass after q58_dist reps + the full EXTRA
                  gauntlet + store setups — exactly the bench position.
  cold_post_child the SAME pass again right after a fresh child JVM
                  (the snake child) has run and exited.

If cold_late ~= cold_early, harness position/session state is innocent
and the r13 number was host drift the canary missed; if cold_late >>
cold_early uniformly, the gauntlet perturbs the cold measurement and
bench.py should move the cold pass before the extras.  cold_post_child
isolates the child-JVM-perturbation hypothesis specifically.

Writes bench_out/r14_cold_ab.json.  Run on a quiet host.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from solarpaneldatawrangler_spark.session import get_spark, sf_dir_from_env  # noqa: E402
from solarpaneldatawrangler_spark.sources import star  # noqa: E402


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")
    sf_dir = sf_dir_from_env()
    spark = get_spark("cold-ab")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

    def loadavg() -> list[float]:
        try:
            return [round(x, 2) for x in os.getloadavg()]
        except OSError:
            return []

    def canary() -> float:
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id * 3 + 1)").collect()
        return round(time.perf_counter() - t0, 3)

    def run_set(label: str) -> dict[str, float]:
        out: dict[str, float] = {}
        for name in bench.HEADLINE:
            fn = bench._headline_fn(name)
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            out[name] = round(best, 3)
        print(
            f"# {label}: {sum(out.values()):.3f}s load={loadavg()}",
            file=sys.stderr,
        )
        return out

    def cache_off() -> None:
        os.environ["SPARK_GRAFT_CACHE_TABLES"] = "0"
        star._MEMO.clear()
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()
            time.sleep(1.0)
        except Exception:  # noqa: BLE001
            pass

    def cache_on() -> None:
        os.environ["SPARK_GRAFT_CACHE_TABLES"] = "1"
        star._MEMO.clear()

    rec: dict = {"canary_start": min(canary() for _ in range(2)),
                 "load_start": loadavg(), "repeats": repeats, "sf_dir": sf_dir}

    # Phase A: warm (cached) headline — the bench's "value" conditions
    warm = run_set("warm")
    rec["warm"] = warm

    # Phase B: cold EARLY — no gauntlet state yet
    cache_off()
    rec["cold_early"] = run_set("cold_early")

    # Phase C: replicate the r13 additions in order: q58_dist reps
    cache_on()
    fn = bench._headline_fn("q58_ann_bruteforce")
    q58 = []
    for _ in range(8):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        q58.append(round(time.perf_counter() - t0, 3))
    rec["q58_dist"] = sorted(q58)

    # Phase D: store setups + the full EXTRA gauntlet (timed loosely —
    # the extras total is itself a comparison point vs r12/r13 records)
    for setup in (bench._ivf_store_dir, bench._fp_store_dir, bench._sig_store_dir):
        try:
            setup(spark, sf_dir)
        except Exception as ex:  # noqa: BLE001
            print(f"# setup {setup.__name__}: {ex}", file=sys.stderr)
    try:
        bench._ivfpq_store_dir(spark, sf_dir)
        from solarpaneldatawrangler_spark.operators.dsir import dsir_ratios_for_dir

        dsir_ratios_for_dir(sf_dir, n_buckets=512)
        from solarpaneldatawrangler_spark.plans.extension_queries2 import (
            _q75_bucketed_tables,
        )

        _q75_bucketed_tables(spark, sf_dir)
    except Exception as ex:  # noqa: BLE001
        print(f"# setup: {ex}", file=sys.stderr)
    extras: dict[str, float] = {}
    for name, fnx in bench.EXTRA.items():
        try:
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                fnx(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            extras[name] = round(best, 3)
        except Exception as ex:  # noqa: BLE001
            print(f"# extra {name}: {ex}", file=sys.stderr)
    rec["extras_total"] = round(sum(extras.values()), 3)
    rec["extras"] = extras
    rec["load_after_extras"] = loadavg()

    # Phase E: cold LATE — the exact bench position (post-gauntlet)
    cache_off()
    rec["cold_late"] = run_set("cold_late")

    # Phase F: run a child JVM (the snake child), then cold again
    try:
        rec["snake_fresh_s"] = round(bench._cc_snake_fresh_seconds(), 3)
    except Exception as ex:  # noqa: BLE001
        print(f"# snake child: {ex}", file=sys.stderr)
    cache_off()
    rec["cold_post_child"] = run_set("cold_post_child")

    rec["canary_end"] = min(canary() for _ in range(2))
    rec["load_end"] = loadavg()
    for k in ("warm", "cold_early", "cold_late", "cold_post_child"):
        rec[f"{k}_total"] = round(sum(rec[k].values()), 3)

    out = os.path.join(REPO, "bench_out", "r14_cold_ab.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps({k: v for k, v in rec.items()
                      if not isinstance(v, dict)}))


if __name__ == "__main__":
    main()
