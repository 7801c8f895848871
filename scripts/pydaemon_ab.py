"""A/B microbench: stock pyspark.daemon vs the preimport daemon
(solarpaneldatawrangler_spark.pydaemon) — measures the fixed
Python-worker startup cost taxing every Arrow stage (the r16
"Not yet optimized" item 2: ~0.19 s driver-submit -> worker-entry).

Each arm runs in its OWN subprocess/JVM (the daemon module is fixed at
first Python task). Timed units per arm:

- first_arrow_s: the very first 1-partition mapInPandas job of the app
  (pays daemon launch + worker fork + worker-side imports)
- warm_arrow_s: median of N subsequent identical jobs (workers reused)
- fanout_arrow_s: one 32-partition mapInPandas job on a fresh app
  (pays up to 32 forks in parallel; the cluster-shaped cost)
- q58_s: the catalog's real ANN brute-force query, noop-sink style
  collect (sf0.01 — small, the fixed costs dominate)

Usage: python scripts/pydaemon_ab.py [repeats]   (default 5)
Prints one JSON line per arm; run interleaved A,B,A,B... to cancel
load drift.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from solarpaneldatawrangler_spark.session import get_spark

mode = {mode!r}
extra = {{}}
if mode == "pre":
    extra["spark.python.daemon.module"] = "solarpaneldatawrangler_spark.pydaemon"
spark = get_spark("pydaemon_ab_" + mode, cpus=32, extra_conf=extra)
sc = spark.sparkContext

import pandas as pd

def ident(it):
    for b in it:
        yield b

# JVM warmup WITHOUT touching the python worker path
spark.range(2_000_000).selectExpr("sum(id*3+1)").collect()

df1 = spark.range(1000, numPartitions=1).selectExpr("id", "id * 2 as v")

def run_once(df):
    t0 = time.perf_counter()
    df.mapInPandas(ident, "id long, v long").write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

first = run_once(df1)
warm = [run_once(df1) for _ in range(7)]

df32 = spark.range(320000, numPartitions=32).selectExpr("id", "id * 2 as v")
fan = run_once(df32)

# real query: q58 at sf0.01
import __spark_entry__ as e
qs = e.queries()
t0 = time.perf_counter()
qs["q58_ann_bruteforce"](spark, "/root/testdata/sf0.01").write.format("noop").mode("overwrite").save()
q58 = time.perf_counter() - t0

load = open("/proc/loadavg").read().split()[0]
print(json.dumps({{"mode": mode, "first_arrow_s": round(first, 4),
                  "warm_arrow_s": round(sorted(warm)[len(warm)//2], 4),
                  "warm_min_s": round(min(warm), 4),
                  "fanout_arrow_s": round(fan, 4),
                  "q58_s": round(q58, 4), "load1": load}}))
spark.stop()
"""


def run_arm(mode: str) -> dict:
    code = CHILD.format(repo=REPO, mode=mode)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=600,
    )
    for line in out.stdout.splitlines()[::-1]:
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"arm {mode} produced no JSON:\n{out.stderr[-2000:]}")


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    results: dict[str, list[dict]] = {"stock": [], "pre": []}
    for i in range(repeats):
        for mode in ("stock", "pre"):
            r = run_arm(mode)
            results[mode].append(r)
            print(json.dumps(r), flush=True)
    summary = {}
    for mode, rs in results.items():
        summary[mode] = {
            k: round(statistics.median([r[k] for r in rs]), 4)
            for k in ("first_arrow_s", "warm_arrow_s", "warm_min_s", "fanout_arrow_s", "q58_s")
        }
        summary[mode + "_best"] = {
            k: round(min(r[k] for r in rs), 4)
            for k in ("first_arrow_s", "warm_arrow_s", "fanout_arrow_s", "q58_s")
        }
    print(json.dumps({"summary": summary}, indent=1))


if __name__ == "__main__":
    main()
