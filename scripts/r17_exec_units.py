"""r17 iteration harness: the bench's 14 headline EXEC units only
(noop-sink best-of-N over the pre-built frame, SPARK_GRAFT_CACHE_TABLES
=1, same fns via bench._headline_fn) — so optimization A/Bs re-measure
the driver-facing series in ~2 min instead of the full bench's ~15.

Usage: python scripts/r17_exec_units.py [out.json] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")

OUT = sys.argv[1] if len(sys.argv) > 1 else None
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import bench
    from solarpaneldatawrangler_spark.session import get_spark

    spark = get_spark("r17-exec-units")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    out: dict[str, object] = {
        "sf_dir": SF_DIR,
        "repeats": REPEATS,
        "times": {},
        "loads": {},
    }
    for name in bench.HEADLINE:
        spark.sparkContext.setJobDescription(f"exec:{name}")
        try:
            df = bench._headline_fn(name)(spark, SF_DIR)
            df.schema
            if name in getattr(bench, "EXEC_WARMUP_UNITS", ()):
                df.write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            out["times"][name] = round(best, 3)
        except Exception as ex:  # noqa: BLE001
            out["times"][name] = f"ERROR {type(ex).__name__}: {ex}"[:200]
        out["loads"][name] = [round(x, 2) for x in os.getloadavg()]
        print(f"# {name}: {out['times'][name]} load={out['loads'][name]}")
        spark.sparkContext.setJobDescription(None)
    vals = [v for v in out["times"].values() if isinstance(v, float)]
    out["total"] = round(sum(vals), 3)
    print(f"# total: {out['total']}")
    if OUT:
        with open(OUT, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
        print(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
