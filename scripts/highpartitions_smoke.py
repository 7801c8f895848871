"""Cluster-parallelism smoke (r13 item 8): run the ENTIRE 50-query
catalog strict-green at sf0.01 with spark.sql.shuffle.partitions=2000
— the order of parallelism a real 1000-executor cluster would run at —
proving no plan silently depends on the local[32] assumption
(shuffle_partitions == cores). AQE partition coalescing stays ON, as
it would on the real cluster; what this smokes is every repartition(),
window, join and agg still producing identical hashed results when the
pre-AQE shuffle fan-out is 60x wider.

Usage: python scripts/highpartitions_smoke.py
Record: bench_out/r{round}_partitions2000.json (round from BENCH_r*.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GATE_DIR = "/root/testdata/sf0.01"
PARTITIONS = 2000
from roundtag import current_round  # noqa: E402 — dependency-free (r15)

RECORD = os.path.join(
    REPO, "bench_out", f"r{current_round():02d}_partitions2000.json"
)


def main() -> None:
    from solarpaneldatawrangler_spark.plans import CATALOG
    from solarpaneldatawrangler_spark.session import get_spark
    from tests.oracle_harness import compare, run_oracle

    spark = get_spark(
        "partitions2000-smoke", shuffle_partitions=PARTITIONS
    )
    assert (
        spark.conf.get("spark.sql.shuffle.partitions") == str(PARTITIONS)
    ), "session reused with the wrong partition conf — run in a fresh process"
    out: dict = {
        "shuffle_partitions": PARTITIONS,
        "sf_dir": GATE_DIR,
        "n": len(CATALOG),
        "green": 0,
        "rows_only": 0,
        "failed": {},
        "per_query_sec": {},
    }
    t_all = time.monotonic()
    for name in sorted(CATALOG):
        spec = CATALOG[name]
        t0 = time.monotonic()
        try:
            df = spec.fn(spark, GATE_DIR)
            if spec.oracle is None:
                df.count()
                out["rows_only"] += 1
                status = "rows-only"
            else:
                compare(df, run_oracle(spec.oracle, GATE_DIR), name, strict=True)
                out["green"] += 1
                status = "GREEN"
        except Exception as ex:  # noqa: BLE001 — smoke must finish
            out["failed"][name] = f"{type(ex).__name__}: {ex}"[:400]
            status = f"FAILED: {type(ex).__name__}"
        dt = round(time.monotonic() - t0, 3)
        out["per_query_sec"][name] = dt
        print(f"# {name}: {status} in {dt}s", flush=True)
    out["total_sec"] = round(time.monotonic() - t_all, 1)
    print(
        f"# partitions={PARTITIONS}: {out['green']} green / "
        f"{out['rows_only']} rows-only / {len(out['failed'])} failed "
        f"of {out['n']} in {out['total_sec']}s"
    )
    os.makedirs(os.path.dirname(RECORD), exist_ok=True)
    with open(RECORD, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"# wrote {RECORD}")


if __name__ == "__main__":
    main()
