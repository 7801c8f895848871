"""sf10 scale probe (r13 item 5): 100x the bench volume for the heavy
hitters — the 14 headline queries plus q55/q63/q66 — Spark-side only
(no DuckDB oracle replay at this scale; correctness is gated at
sf0.01/sf0.1/sf1.0), under the 2x volume-scaled rule vs sf0.1:

    pass iff spark_s(sf10) <= max(2 * 100 * spark_s(sf0.1), floor)

Data: generated with the SAME replica recipe as the sf1 sweep
(scripts/sf1_sweep.generate — id shift replica*10M keeps every
intra-replica join/FK chain; injective per-word document suffix keeps
dedup surfaces linear), just replicas=100 into {repo}/testdata_sf10
(gitignored, ~1.7 GB parquet). Trained artifacts (BPE merges, IVF
centroids, PQ codebooks) train at the default ORACLE_SF_DIR (sf0.01) —
the realistic deployment shape: quantizers fit on a sample, applied at
scale.

Timing: each query runs once untimed at sf0.01 (codegen + artifact
warmup), then timed at sf0.1 and at sf10; materialization is a count()
over the result (the bench.py contract — no driver payload collect at
100x volume).

Usage: python scripts/sf10_probe.py [generate|run|all] [--force]
Record: bench_out/r{round}_sf10.json (round inferred from BENCH_r*.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

SF10_DIR = os.path.join(REPO, "testdata_sf10")
BASE_DIR = "/root/testdata/sf0.1"
WARM_DIR = "/root/testdata/sf0.01"
REPLICAS = 100
from roundtag import current_round  # noqa: E402 — dependency-free (r15)

RECORD = os.path.join(REPO, "bench_out", f"r{current_round():02d}_sf10.json")
FLOOR_S = 5.0
EXTRA = [
    "q55_minhash_neardup",
    "q63_embedding_neardup",
    "q66_winnow_fingerprint",
]


def _names() -> list[str]:
    import bench

    out = list(bench.HEADLINE)
    for n in EXTRA:
        if n not in out:
            out.append(n)
    return out


# r15 (judge item 7): the q63 GATE query itself now runs the deployment
# knobs (q63_deployment_knobs scales n_lists/n_planes/sample_cap with
# the corpus; floors reproduce the old frozen values at gate scale), so
# the probe no longer needs a scaled override — the headline pass rules
# the gate query directly. The FROZEN parameterization survives as the
# control arm below (bench._q63_frozen_bench), so the record keeps
# showing the quadratic-shaped behavior the rotation retired.
WORKLOADS: dict = {}
FROZEN_ARMS = {"q63_embedding_neardup": "_q63_frozen_bench"}



def generate(force: bool = False) -> None:
    from sf1_sweep import generate as gen

    gen(force=force, base_dir=BASE_DIR, out_dir=SF10_DIR, replicas=REPLICAS)


def run() -> dict:
    import bench

    from solarpaneldatawrangler_spark.plans.catalog import assert_oracle_dir
    from solarpaneldatawrangler_spark.session import get_spark

    # r16 guard (judge item 2): the probe's contract is artifacts
    # trained at the DEFAULT gate dir (quantizers fit on a sample,
    # applied at scale) — a leaked SPARK_GRAFT_ORACLE_SF_DIR override
    # would silently retrain them and change what the probe measures
    assert_oracle_dir(WARM_DIR)

    # 600s network/heartbeat window (r15): the frozen q63 control arm
    # intentionally runs multi-minute quadratic straggler tasks, and a
    # driver GC / co-tenant CPU-starve pause past the default 120s
    # killed the whole context mid-probe (HeartbeatReceiver removed
    # the local executor; every later arm died with it)
    spark = get_spark(
        "sf10-probe", extra_conf={"spark.network.timeout": "600s"}
    )
    out: dict = {
        "sf": 10.0,
        "sf_dir": SF10_DIR,
        "generated_from": (
            f"{BASE_DIR} x{REPLICAS} replicas via scripts/sf1_sweep.generate"
        ),
        "scale_rule": (
            f"spark_s <= max(2 * {REPLICAS} * spark_s_sf01,"
            f" {FLOOR_S}s floor); volume factor vs sf0.1 = {REPLICAS}"
        ),
        "per_query": {},
    }
    for name in _names():
        fn = WORKLOADS.get(name) or bench._headline_fn(name)
        pq: dict = {}
        out["per_query"][name] = pq
        if name in FROZEN_ARMS:
            pq["workload"] = (
                "gate query runs deployment knobs since r15 "
                "(q63_deployment_knobs); frozen_* keys time the "
                "retired frozen parameterization (bench."
                f"{FROZEN_ARMS[name]}) as the quadratic-shaped control"
            )
            # r13 ADVICE (kept under r15's rotation): the record must
            # show the FROZEN-knob behavior (quadratic by construction
            # at this volume — N²/n_lists with n_lists pinned), now as
            # an explicit control arm rather than the gate query.
            if os.environ.get("SPARK_GRAFT_SF10_FROZEN", "1") == "1":
                try:
                    gate_fn = getattr(bench, FROZEN_ARMS[name])
                    gate_fn(spark, WARM_DIR).count()
                    t0 = time.monotonic()
                    gate_fn(spark, BASE_DIR).count()
                    f_sf01 = round(time.monotonic() - t0, 3)
                    t0 = time.monotonic()
                    pq["frozen_rows_sf10"] = gate_fn(spark, SF10_DIR).count()
                    pq["frozen_spark_s"] = round(time.monotonic() - t0, 3)
                    fscaled = REPLICAS * f_sf01
                    pq["frozen_spark_s_sf01"] = f_sf01
                    pq["frozen_scaled_ratio"] = (
                        round(pq["frozen_spark_s"] / fscaled, 4)
                        if fscaled > 0
                        else None
                    )
                    pq["frozen_under_2x"] = bool(
                        pq["frozen_spark_s"] <= max(2 * fscaled, FLOOR_S)
                    )
                    print(
                        f"# {name} FROZEN knobs: {pq['frozen_spark_s']}s "
                        f"(ratio {pq['frozen_scaled_ratio']})",
                        flush=True,
                    )
                except Exception as ex:  # noqa: BLE001 — probe must finish
                    pq["frozen_error"] = f"{type(ex).__name__}: {ex}"[:400]
        try:
            fn(spark, WARM_DIR).count()  # untimed warmup
            t0 = time.monotonic()
            fn(spark, BASE_DIR).count()
            pq["spark_s_sf01"] = round(time.monotonic() - t0, 3)
            t0 = time.monotonic()
            pq["rows_sf10"] = fn(spark, SF10_DIR).count()
            pq["spark_s"] = round(time.monotonic() - t0, 3)
            scaled = REPLICAS * pq["spark_s_sf01"]
            pq["scaled_ratio"] = (
                round(pq["spark_s"] / scaled, 4) if scaled > 0 else None
            )
            pq["under_2x"] = bool(
                pq["spark_s"] <= max(2 * scaled, FLOOR_S)
            )
            status = (
                f"{pq['spark_s']}s (sf01 {pq['spark_s_sf01']}s, "
                f"ratio {pq['scaled_ratio']}, rows {pq['rows_sf10']})"
            )
        except Exception as ex:  # noqa: BLE001 — probe must finish
            pq["error"] = f"{type(ex).__name__}: {ex}"[:400]
            pq["under_2x"] = False
            status = f"FAILED: {type(ex).__name__}"
        print(f"# {name}: {status}", flush=True)
    out["all_under_2x"] = bool(
        all(pq.get("under_2x") for pq in out["per_query"].values())
    )
    print(f"# sf10 probe: all_under_2x={out['all_under_2x']}")
    return out


def main() -> None:
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what not in ("generate", "run", "all"):
        sys.exit(f"unknown stage {what!r} — usage: sf10_probe.py "
                 "[generate|run|all] [--force]")
    if what in ("generate", "all"):
        generate(force="--force" in sys.argv)
    if what in ("run", "all"):
        rec = run()
        os.makedirs(os.path.dirname(RECORD), exist_ok=True)
        with open(RECORD, "w") as fh:
            json.dump(rec, fh, indent=1)
        print(f"# wrote {RECORD}")


if __name__ == "__main__":
    main()
