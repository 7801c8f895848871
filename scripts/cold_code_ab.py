#!/usr/bin/env python
"""Interleaved r12-code vs r13-code cold-pass A/B (r13 VERDICT item 1).

scripts/cold_ab.py already exonerated harness POSITION (cold_early
5.842 > cold_late 5.368 > cold_post_child 4.91 — the opposite ordering
the perturbation hypothesis predicts) and showed the canary itself
swings 0.384 -> 0.09 within one run. What remains is CODE: did any r13
change (integer-exact rounding, lease TTL, decorrelated embeddings)
make the cache-off scans slower across the board?

Method: N interleaved fresh child JVMs, alternating between the repo
at HEAD and a worktree pinned at the r12 final commit (fd07af6).  Each
child runs the full headline set cache-off (one untimed warmup pass,
then best-of-3 per query) and prints per-query seconds.  Interleaving
means host drift hits both arms equally; a real code cost shows as a
consistent per-query delta with matching sign across reps.

Usage: python scripts/cold_code_ab.py [reps] [r12_tree_path]
Writes bench_out/r14_cold_code_ab.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import json, os, sys, time
sys.path.insert(0, {tree!r})
os.environ["SPARK_GRAFT_CACHE_TABLES"] = "0"
from solarpaneldatawrangler_spark.session import get_spark
spark = get_spark("cold-code-ab")
spark.read.parquet({sf_dir!r} + "/lineitem.parquet").count()
import bench
names = [n for n in bench.HEADLINE if not {only!r} or n in {only!r}]
for name in names:                   # untimed warmup (codegen/JIT)
    bench._headline_fn(name)(spark, {sf_dir!r}).count()
qt = {{}}
for name in names:
    fn = bench._headline_fn(name)
    best = float("inf")
    for _ in range(int(os.environ.get("SPARK_GRAFT_AB_REPEATS", "3"))):
        t0 = time.perf_counter()
        fn(spark, {sf_dir!r}).count()
        best = min(best, time.perf_counter() - t0)
    qt[name] = round(best, 3)
t0 = time.perf_counter()
spark.range(200_000_000).selectExpr("sum(id * 3 + 1)").collect()
print("COLD_AB " + json.dumps({{"queries": qt,
    "canary": round(time.perf_counter() - t0, 3)}}))
"""


def run_child(tree: str, sf_dir: str, only: str = "") -> dict:
    out = subprocess.run(
        [sys.executable, "-c",
         _CHILD.format(tree=tree, sf_dir=sf_dir, only=only)],
        capture_output=True, text=True, timeout=1200, cwd=tree,
    )
    for line in out.stdout.splitlines():
        if line.startswith("COLD_AB "):
            return json.loads(line[len("COLD_AB "):])
    raise RuntimeError(f"child at {tree} failed: rc={out.returncode} "
                       f"stderr={out.stderr[-400:]}")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    r12 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/r12tree"
    if not os.path.isdir(r12):
        # reproduce-friendly: materialize the r12 arm on demand
        subprocess.run(
            ["git", "-C", REPO, "worktree", "add", r12, "fd07af6"],
            check=True,
        )
    only = sys.argv[3] if len(sys.argv) > 3 else ""  # comma-joined subset
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rec: dict = {"arms": {"r13": REPO, "r12": r12}, "reps": reps,
                 "only": only or None, "runs": []}
    for i in range(reps):
        for arm, tree in (("r12", r12), ("r13", REPO)):
            t0 = time.time()
            r = run_child(tree, sf_dir, only)
            r.update(arm=arm, rep=i,
                     total=round(sum(r["queries"].values()), 3))
            rec["runs"].append(r)
            print(f"# rep{i} {arm}: total={r['total']} "
                  f"canary={r['canary']} wall={time.time()-t0:.0f}s",
                  flush=True)
    for arm in ("r12", "r13"):
        runs = [r for r in rec["runs"] if r["arm"] == arm]
        rec[f"{arm}_best_total"] = min(r["total"] for r in runs)
        rec[f"{arm}_per_query_best"] = {
            q: min(r["queries"][q] for r in runs)
            for q in runs[0]["queries"]
        }
    rec["per_query_ratio_r13_over_r12"] = {
        q: round(rec["r13_per_query_best"][q]
                 / max(rec["r12_per_query_best"][q], 1e-9), 3)
        for q in rec["r13_per_query_best"]
    }
    suffix = "_subset" if only else ""
    out = os.path.join(REPO, "bench_out", f"r14_cold_code_ab{suffix}.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps({k: v for k, v in rec.items() if k != "runs"}))


if __name__ == "__main__":
    main()
