"""r17 parallel-scaling evidence (VERDICT r16 item 1): the 8-vs-32-core
ratio at sf0.1 is ~1 for every query because sf0.1 is overhead-bound —
this probe re-measures the 14 headline exec units plus the top extras
arms at sf1 (10x the volume) under local[8] and local[32], in separate
child processes (one JVM per core count), and commits the per-query
ratio table. A data-bound query should show ratio >= ~2 at 4x cores;
a ratio near 1 at sf1 needs a root cause.

Usage:
    python scripts/r17_core_ratio.py            # orchestrate 32 then 8
    python scripts/r17_core_ratio.py worker N   # (internal) one JVM
Writes bench_out/r17_core_ratio_sf1.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get(
    "R17_RATIO_SF_DIR", os.path.join(REPO, "testdata_sf1")
)
REPEATS = int(os.environ.get("R17_RATIO_REPEATS", "3"))

# extras arms included in the probe: the heaviest data-bound arms from
# the r16 record (md5/winnow, dedup joins, BPE loop, tfidf, q63 control)
# plus the iterative snake (expected NOT to scale — scheduler-bound by
# design, documented as such)
EXTRA_ARMS = [
    "x_winnow_fixed",
    "x_decontaminate",
    "x_dedup_clusters",
    "x_cross_dedup",
    "x_q63_frozen_knobs",
    "x_tfidf_keywords",
    "x_curation_gates",
    "x_minhash_bands8",
    "x_bpe_train_dist",
    "x_cc_snake_1000",
]


def worker(cpus: int) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    import bench  # noqa: E402  (after CPUS is set)
    from solarpaneldatawrangler_spark.session import get_spark

    spark = get_spark(f"r17-core-ratio-{cpus}")
    assert spark.sparkContext.master == f"local[{cpus}]"
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    # pre-fit cached artifacts so the timed units measure plans, not
    # one-time driver-side training (the sf1_sweep warmup contract)
    from solarpaneldatawrangler_spark.operators.dsir import dsir_ratios_for_dir

    dsir_ratios_for_dir(SF_DIR, n_buckets=512)

    out: dict[str, object] = {"cpus": cpus, "times": {}, "loads": {}}
    units = [(n, bench._headline_fn(n)) for n in bench.HEADLINE]
    units += [(n, bench.EXTRA[n]) for n in EXTRA_ARMS]
    for name, fn in units:
        spark.sparkContext.setJobDescription(f"ratio[{cpus}]:{name}")
        try:
            df = fn(spark, SF_DIR)
            df.schema
            best = float("inf")
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            out["times"][name] = round(best, 3)
        except Exception as ex:  # noqa: BLE001
            out["times"][name] = f"ERROR {type(ex).__name__}: {ex}"[:200]
        out["loads"][name] = [round(x, 2) for x in os.getloadavg()]
        print(
            f"# [{cpus}] {name}: {out['times'][name]}"
            f" load={out['loads'][name]}",
            file=sys.stderr,
        )
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


def main() -> None:
    results = {}
    for cpus in (32, 8):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "worker", str(cpus)],
            capture_output=True,
            text=True,
            env=env,
            cwd=REPO,
        )
        sys.stderr.write(p.stderr[-4000:])
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    t32, t8 = results[32]["times"], results[8]["times"]
    ratios = {
        k: round(t8[k] / t32[k], 2)
        for k in t32
        if isinstance(t32.get(k), float)
        and isinstance(t8.get(k), float)
        and t32[k] > 0
    }
    rec = {
        "sf_dir": SF_DIR,
        "repeats": REPEATS,
        "cpus_hi": 32,
        "cpus_lo": 8,
        "t32": t32,
        "t8": t8,
        "ratio_t8_over_t32": ratios,
        "loads_32": results[32]["loads"],
        "loads_8": results[8]["loads"],
        "means": (
            "per-unit noop-sink best-of-N in a single JVM per core count;"
            " ratio = t(local[8]) / t(local[32]); 4x cores ideal = 4.0,"
            " data-bound healthy >= ~2, overhead-bound ~1"
        ),
    }
    path = os.path.join(REPO, "bench_out", "r17_core_ratio_sf1.json")
    with open(path, "w") as fh:
        json.dump(rec, fh, indent=1, sort_keys=True)
    print(f"# wrote {path}")
    for k in sorted(ratios, key=ratios.get):
        print(f"{k}: 32c={t32[k]} 8c={t8[k]} ratio={ratios[k]}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]))
    else:
        main()
