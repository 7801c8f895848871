"""CI-able executor-loss / dead-mutator fault injection (r15 VERDICT
item 3) — runs scripts/fault_injection_smoke.py in a subprocess (the
local-cluster master is fixed at session build, so it cannot share the
suite's local[32] session) and asserts its three verdicts:

  cc_recovered_identical    one executor JVM SIGKILLed mid distributed-
                            CC iteration; the labels must land on the
                            healthy truth — either Spark-native
                            survival or the documented app-level rerun
                            of the pure plan (localCheckpoint blocks
                            die with their executor by design; the r15
                            smoke measured exactly that failure:
                            CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND, and the
                            rerun converged bit-identical)
  cc_reliable_survived_in_job  (r16 VERDICT item 4) same kill with
                            resilience='reliable': the ONE driver call
                            must complete through the executor loss —
                            persist()ed inputs recompute from lineage,
                            loop frames read back from reliable
                            checkpoint files — labels bit-identical,
                            no app retry allowed
  store_recovered_identical executor SIGKILLed mid fingerprint-store
                            append; the SAME driver call must complete
                            via task/stage retry, release the lease,
                            and match a healthy twin's distinct
                            fingerprints
  lease_ttl_reaped          a REAL crashed holder (separate process,
                            real _acquire_lease, os._exit(1)) leaves a
                            stale lease; with SPARK_GRAFT_LEASE_TTL_MS
                            set, the next writer reaps after expiry
                            and the store stays consistent

The kill verdicts additionally require kill_landed=True (the SIGKILL
fired INSIDE the faulted window — a kill that misses its window is
retried once with a shorter delay, and a still-missed kill fails the
verdict rather than passing vacuously). This is the reference's
restartability property (/root/reference/run_inference.py:101-128,
flag columns solardb.py:23,43-44) translated to Spark's failure model:
task retry where Spark recovers, idempotent pure-plan rerun where it
cannot, lease TTL self-heal for dead mutators.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_fault_injection_verdicts():
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_MASTER", None)  # script sets local-cluster
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "fault_injection_smoke.py")],
        capture_output=True,
        text=True,
        timeout=1080,
        cwd=REPO,
        env=env,
    )
    verdict = None
    for line in out.stdout.splitlines():
        if line.startswith("FAULT_INJECT "):
            verdict = json.loads(line[len("FAULT_INJECT "):])
    assert verdict is not None, (
        f"smoke produced no verdict: rc={out.returncode} "
        f"stderr={out.stderr[-800:]}"
    )
    assert verdict == {
        "cc_recovered_identical": True,
        "cc_reliable_survived_in_job": True,
        "store_recovered_identical": True,
        "lease_ttl_reaped": True,
    }, f"fault-injection verdicts: {verdict}\nstderr={out.stderr[-800:]}"
