#!/usr/bin/env python
"""Executor-loss + dead-mutator fault injection (r15 VERDICT item 3).

The reference's defining operational property is restartability — the
resume-where-you-left-off loop (/root/reference/run_inference.py:101-128)
over flag columns (/root/reference/solardb.py:23,43-44). The rebuild's
translation of that property to Spark's failure model has three layers,
and until r15 each was tested only on healthy paths:

1. TASK/STAGE-LEVEL recovery (Spark-native): a lost executor's tasks
   re-run elsewhere, lost shuffle output triggers stage resubmission,
   lost persist()ed cache partitions recompute from lineage. The
   store-append arm kills one executor JVM (SIGKILL, no shutdown
   hooks) mid `write_fingerprint_store(mode='append')` and asserts the
   SAME driver call completes with the lease released and the store's
   distinct-fingerprint set identical to a healthy twin's.

2. APPLICATION-LEVEL retry (the operator contract where Spark-native
   recovery ends): the iterative CC loop localCheckpoints its label
   frame each fused round, and localCheckpoint blocks DIE with their
   executor — Spark cannot recompute truncated lineage, so the job
   fails. The documented model is: every plan here is a PURE builder
   over immutable inputs, so re-running the query converges to the
   identical answer (the idempotence that replaces the reference's
   flag-column resume). The CC arm kills an executor mid-loop and
   asserts either outcome lands on the truth labels: survived (kill
   landed between checkpoint materializations) or failed-then-rerun.

3. LEASE liveness (dead mutator): a REAL crashed holder — a separate
   process that runs the real _acquire_lease protocol and then
   os._exit(1) without releasing — leaves a stale lease; with
   SPARK_GRAFT_LEASE_TTL_MS set, the next writer must reap it after
   expiry and complete, and the store must stay consistent (a dead
   writer's uncommitted _temporary output is invisible to readers).

Must run in a FRESH process (master fixed at session build):
    python scripts/fault_injection_smoke.py
Writes bench_out/r{N}_faultinject.json. The CI-able variant is
tests/test_fault_injection.py (runs this in a subprocess and asserts
the verdict keys).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# master must be set before the first get_spark anywhere
os.environ.setdefault("SPARK_GRAFT_MASTER", "local-cluster[2,4,2048]")
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("SPARK_DRIVER_MEM", "8g")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_FI", "/root/testdata/sf0.01")


def _round_tag() -> str:
    from bench import current_round  # shared round tag (r15 ADVICE)

    return f"r{current_round():02d}"


def _executor_pids(app_id: str) -> list[int]:
    """PIDs of THIS application's executor JVMs (local-cluster spawns
    real CoarseGrainedExecutorBackend processes; the --app-id argument
    scopes the match so a co-tenant Spark app is never killed)."""
    out = subprocess.run(
        ["ps", "-eo", "pid,args"], capture_output=True, text=True
    ).stdout
    pids = []
    for line in out.splitlines():
        if "CoarseGrainedExecutorBackend" in line and app_id in line:
            pids.append(int(line.strip().split(None, 1)[0]))
    return sorted(pids)


def _kill_one_executor_after(app_id: str, delay_s: float, log: dict):
    """Daemon thread: SIGKILL one executor JVM after delay_s. SIGKILL,
    not SIGTERM — no shutdown hooks, no block-manager deregistration,
    the hard-crash shape a real node loss has."""

    def _k():
        time.sleep(delay_s)
        pids = _executor_pids(app_id)
        log["executors_seen"] = len(pids)
        if pids:
            os.kill(pids[0], signal.SIGKILL)
            log["killed_pid"] = pids[0]
            log["killed_at_s"] = round(delay_s, 3)

    t = threading.Thread(target=_k, daemon=True)
    t.start()
    return t


def _wait_executors(app_id: str, want: int, timeout_s: float = 60.0) -> int:
    """Wait for the standalone master to respawn executors up to
    ``want`` (it replaces EXITED executors; the next arm should start
    at full capacity so arms don't contaminate each other)."""
    deadline = time.monotonic() + timeout_s
    n = len(_executor_pids(app_id))
    while n < want and time.monotonic() < deadline:
        time.sleep(1.0)
        n = len(_executor_pids(app_id))
    return n


def cc_arm(spark, rec: dict) -> None:
    """Kill one executor mid distributed-CC iteration; the result must
    land on the healthy truth either via surviving the loss or via the
    documented app-level rerun of the pure plan."""
    from pyspark.sql import functions as F

    from solarpaneldatawrangler_spark.operators.clustering import (
        connected_components,
    )

    app_id = spark.sparkContext.applicationId
    arm: dict = {}
    rec["cc"] = arm

    def build():
        # diameter-2000 snake, distributed loop FORCED
        # (local_max_nodes=0): ~11 fused pointer-jumping rounds, each
        # localCheckpointing the label frame — maximal exposure of the
        # checkpoint-block-loss window
        tiles = spark.range(2000).select(
            F.col("id").cast("int").alias("column"),
            F.lit(0).cast("int").alias("row"),
        )
        return connected_components(tiles, local_max_nodes=0)

    truth = sorted(map(tuple, build().collect()))
    t0 = time.monotonic()
    warm = sorted(map(tuple, build().collect()))
    healthy_s = time.monotonic() - t0
    assert warm == truth
    arm["healthy_s"] = round(healthy_s, 3)
    arm["n_labels"] = len(truth)

    outcome, got = None, None
    for attempt, frac in enumerate((0.4, 0.15)):
        kill_log: dict = {}
        _kill_one_executor_after(app_id, frac * healthy_s, kill_log)
        t0 = time.monotonic()
        try:
            got = sorted(map(tuple, build().collect()))
            outcome = "survived"
        except Exception as ex:  # noqa: BLE001 — the documented path
            arm["error"] = f"{type(ex).__name__}: {str(ex)[:300]}"
            # application-level retry: the plan is a pure builder over
            # immutable inputs — a fresh build + rerun must converge
            got = sorted(map(tuple, build().collect()))
            outcome = "failed_then_app_retry"
        wall = time.monotonic() - t0
        arm["faulted_s"] = round(wall, 3)
        arm["kill"] = kill_log
        # the kill must land INSIDE the faulted window to count
        if "killed_pid" in kill_log and wall > frac * healthy_s:
            arm["kill_landed"] = True
            break
        arm["kill_landed"] = False
        outcome = f"{outcome}_but_kill_missed_window"
        _wait_executors(app_id, 2)
    arm["outcome"] = outcome
    arm["match"] = got == truth
    _wait_executors(app_id, 2)


def cc_reliable_arm(spark, rec: dict) -> None:
    """r16 VERDICT item 4: the SAME kill as cc_arm, but with
    resilience='reliable' (persist()ed inputs + reliable-checkpointed
    loop frames) the ONE driver call must complete through the
    executor loss — in-job survival via task/stage retry and
    checkpoint-file reads, no app-level rerun — with labels
    bit-identical to the healthy truth. This is the stronger
    translation of the reference's resume-without-redo
    (run_inference.py:101-128): at 100 TB, losing an hour-long CC job
    to one preempted node is the cost this mode removes."""
    from pyspark.sql import functions as F

    from solarpaneldatawrangler_spark.operators.clustering import (
        connected_components,
    )

    app_id = spark.sparkContext.applicationId
    arm: dict = {}
    rec["cc_reliable"] = arm
    ckpt = tempfile.mkdtemp(prefix="spark_graft_fi_ckpt_")
    spark.sparkContext.setCheckpointDir(ckpt)
    arm["checkpoint_dir"] = ckpt

    def build():
        tiles = spark.range(2000).select(
            F.col("id").cast("int").alias("column"),
            F.lit(0).cast("int").alias("row"),
        )
        return connected_components(
            tiles, local_max_nodes=0, resilience="reliable"
        )

    truth = sorted(map(tuple, build().collect()))
    t0 = time.monotonic()
    warm = sorted(map(tuple, build().collect()))
    healthy_s = time.monotonic() - t0
    assert warm == truth
    arm["healthy_s"] = round(healthy_s, 3)
    arm["n_labels"] = len(truth)

    outcome, got = None, None
    for attempt, frac in enumerate((0.4, 0.15, 0.6)):
        kill_log: dict = {}
        _kill_one_executor_after(app_id, frac * healthy_s, kill_log)
        t0 = time.monotonic()
        try:
            got = sorted(map(tuple, build().collect()))
            outcome = "survived"
        except Exception as ex:  # noqa: BLE001 — NOT acceptable here
            arm["error"] = f"{type(ex).__name__}: {str(ex)[:300]}"
            outcome = "failed"
            got = None
        wall = time.monotonic() - t0
        arm["faulted_s"] = round(wall, 3)
        arm["kill"] = kill_log
        if "killed_pid" in kill_log and wall > frac * healthy_s:
            arm["kill_landed"] = True
            break
        arm["kill_landed"] = False
        outcome = f"{outcome}_but_kill_missed_window"
        _wait_executors(app_id, 2)
    arm["outcome"] = outcome
    arm["match"] = got == truth
    _wait_executors(app_id, 2)


def _store_fps(spark, path: str) -> tuple[int, list[str]]:
    """(row_count, sorted distinct fingerprints) of the store's current
    committed generation."""
    from solarpaneldatawrangler_spark.operators import dedup

    gen = dedup._current_gen(spark, path)
    df = spark.read.parquet(gen[1]).select("fingerprint")
    return df.count(), sorted(
        r[0] for r in df.distinct().collect()
    )


def store_arm(spark, rec: dict) -> None:
    """Kill one executor mid fingerprint-store append; the SAME driver
    call must complete (task/stage retry), release the lease, and leave
    the store's distinct-fingerprint set equal to a healthy twin's."""
    from pyspark.sql import functions as F

    from solarpaneldatawrangler_spark.operators.dedup import (
        write_fingerprint_store,
    )
    from solarpaneldatawrangler_spark.sources.star import load_table

    app_id = spark.sparkContext.applicationId
    arm: dict = {}
    rec["store"] = arm
    base = tempfile.mkdtemp(prefix="spark_graft_fi_store_")
    arm["base"] = base
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 3 == 0)
    batch = docs.filter(F.col("doc_id") % 3 == 1)

    healthy = f"{base}/healthy"
    faulted = f"{base}/faulted"
    for p in (healthy, faulted):
        write_fingerprint_store(corpus, p, n_buckets=32)
    t0 = time.monotonic()
    write_fingerprint_store(batch, healthy, n_buckets=32, mode="append")
    healthy_s = time.monotonic() - t0
    arm["healthy_append_s"] = round(healthy_s, 3)
    _, truth = _store_fps(spark, healthy)
    arm["truth_n_fps"] = len(truth)

    outcome = None
    for attempt, frac in enumerate((0.3, 0.1)):
        kill_log: dict = {}
        _kill_one_executor_after(app_id, frac * healthy_s, kill_log)
        t0 = time.monotonic()
        try:
            write_fingerprint_store(
                batch, faulted, n_buckets=32, mode="append"
            )
            outcome = "survived"
        except Exception as ex:  # noqa: BLE001
            # even on failure the lease must have been released
            # (finally) — proven below by appending again WITHOUT a TTL
            arm["error"] = f"{type(ex).__name__}: {str(ex)[:300]}"
            write_fingerprint_store(
                batch, faulted, n_buckets=32, mode="append"
            )
            outcome = "failed_then_driver_retry"
        wall = time.monotonic() - t0
        arm["faulted_s"] = round(wall, 3)
        arm["kill"] = kill_log
        if "killed_pid" in kill_log and wall > frac * healthy_s:
            arm["kill_landed"] = True
            break
        arm["kill_landed"] = False
        outcome = f"{outcome}_but_kill_missed_window"
        _wait_executors(app_id, 2)
    arm["outcome"] = outcome
    n_rows, fps = _store_fps(spark, faulted)
    arm["rows"] = n_rows
    arm["match"] = fps == truth
    # lease released: a fresh mutation must acquire immediately
    # (TTL stays disabled here — this is the finally-path, not reaping)
    t0 = time.monotonic()
    write_fingerprint_store(
        docs.filter(F.col("doc_id") % 3 == 2),
        faulted,
        n_buckets=32,
        mode="append",
    )
    arm["lease_reacquire_s"] = round(time.monotonic() - t0, 3)
    arm["lease_released"] = True
    _wait_executors(app_id, 2)


_CRASH_HOLDER_CHILD = """
import os, sys
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_MASTER"] = "local[1]"
from solarpaneldatawrangler_spark.session import get_spark
from solarpaneldatawrangler_spark.operators import dedup
spark = get_spark("crash-holder", cpus=1, shuffle_partitions=1)
dedup._acquire_lease(spark, {path!r})
print("LEASE_HELD", flush=True)
os._exit(1)  # crash: no release, no finally, no shutdown hooks
"""


def ttl_arm(spark, rec: dict) -> None:
    """A REAL dead mutator (separate process, real _acquire_lease, hard
    exit) leaves a stale lease; with SPARK_GRAFT_LEASE_TTL_MS set the
    next writer reaps it after expiry and completes."""
    from pyspark.sql import functions as F

    from solarpaneldatawrangler_spark.operators.dedup import (
        write_fingerprint_store,
    )
    from solarpaneldatawrangler_spark.sources.star import load_table

    arm: dict = {}
    rec["ttl"] = arm
    base = tempfile.mkdtemp(prefix="spark_graft_fi_ttl_")
    store = f"{base}/store"
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    write_fingerprint_store(
        docs.filter(F.col("doc_id") % 3 == 0), store, n_buckets=32
    )

    out = subprocess.run(
        [sys.executable, "-c",
         _CRASH_HOLDER_CHILD.format(repo=REPO, path=store)],
        capture_output=True, text=True, timeout=300,
    )
    arm["holder_crashed"] = "LEASE_HELD" in out.stdout
    if not arm["holder_crashed"]:
        arm["holder_stderr"] = out.stderr[-300:]
        return

    ttl_ms = 4000
    os.environ["SPARK_GRAFT_LEASE_TTL_MS"] = str(ttl_ms)
    try:
        time.sleep(ttl_ms / 1000 + 1.0)  # let the orphan expire
        import warnings

        t0 = time.monotonic()
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            write_fingerprint_store(
                docs.filter(F.col("doc_id") % 3 == 1),
                store, n_buckets=32, mode="append",
            )
            arm["reap_warned"] = any(
                "lease self-heal" in str(x.message) for x in w
            )
        arm["reaped_append_s"] = round(time.monotonic() - t0, 3)
        arm["append_after_reap"] = True
    finally:
        os.environ.pop("SPARK_GRAFT_LEASE_TTL_MS", None)
    n_rows, fps = _store_fps(spark, store)
    arm["n_fps"] = len(fps)
    arm["consistent"] = n_rows >= len(fps) > 0


def main() -> None:
    from solarpaneldatawrangler_spark.session import get_spark

    spark = get_spark("fault-injection-smoke")
    master = spark.sparkContext.master
    assert master.startswith("local-cluster"), master
    app_id = spark.sparkContext.applicationId
    rec: dict = {"master": master, "sf_dir": SF_DIR, "app_id": app_id}
    # warm the cluster so healthy baselines aren't first-run outliers
    spark.range(1000).selectExpr("sum(id)").collect()
    n = _wait_executors(app_id, 2)
    rec["executors_at_start"] = n

    for arm_fn in (cc_arm, cc_reliable_arm, store_arm, ttl_arm):
        try:
            arm_fn(spark, rec)
        except Exception as ex:  # noqa: BLE001 — record, keep going
            rec[f"{arm_fn.__name__}_fatal"] = (
                f"{type(ex).__name__}: {str(ex)[:400]}"
            )

    rec["verdict"] = {
        "cc_recovered_identical": bool(
            rec.get("cc", {}).get("match")
            and rec.get("cc", {}).get("kill_landed")
        ),
        # r16 item 4: reliable mode must survive IN-JOB (no app retry)
        "cc_reliable_survived_in_job": bool(
            rec.get("cc_reliable", {}).get("outcome") == "survived"
            and rec.get("cc_reliable", {}).get("match")
            and rec.get("cc_reliable", {}).get("kill_landed")
        ),
        "store_recovered_identical": bool(
            rec.get("store", {}).get("match")
            and rec.get("store", {}).get("kill_landed")
            and rec.get("store", {}).get("lease_released")
        ),
        "lease_ttl_reaped": bool(
            rec.get("ttl", {}).get("holder_crashed")
            and rec.get("ttl", {}).get("append_after_reap")
            and rec.get("ttl", {}).get("consistent")
        ),
    }
    out_path = os.path.join(
        REPO, "bench_out", f"{_round_tag()}_faultinject.json"
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print("FAULT_INJECT " + json.dumps(rec["verdict"]))
    print(f"# wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
