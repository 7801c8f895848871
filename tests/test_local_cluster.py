"""CI-able local-cluster smoke (r13 VERDICT item 4, reduced variant).

Runs a representative catalog subset on ``local-cluster[2,4,2048]`` —
two REAL separate executor JVMs — in a subprocess (the master is fixed
at session build, so it cannot share the suite's local[32] session).
The subset exercises each single-JVM-assumption family the full smoke
(scripts/local_cluster_smoke.py) covers:

  q40  connected components — localCheckpoint + iterative plan across
       executor JVMs (driver-local union-find routing unaffected)
  q38  spatial contains — the py4j planner probe (driver-side only by
       design; this proves executors never need it)
  q55  minhash near-dup — HOF-heavy expressions serialized to workers
  q62  multimodal — Arrow pandas-UDF python workers ON executors
  q58  ANN brute force — mapInPandas BLAS in executor python workers
  q26  upsert — exchange/join correctness across two executors
  q70  streaming — availableNow microbatches on a real cluster master

Strict oracle compare for every subset member (none are rows-only),
so a pass here is hash-level, not just no-crash.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SUBSET = [
    "q26_upsert",
    "q38_spatial_contains",
    "q40_connected_components",
    "q55_minhash_neardup",
    "q58_ann_bruteforce",
    "q62_multimodal_pipeline",
    "q70_streaming_window",
]


@pytest.mark.slow
def test_local_cluster_subset_strict_green():
    env = dict(
        os.environ,
        SPARK_GRAFT_MASTER="local-cluster[2,4,2048]",
        SPARK_GRAFT_CPUS="8",
        SPARK_DRIVER_MEM="8g",
    )
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "local_cluster_smoke.py"),
            "/root/testdata/sf0.01",
            ",".join(SUBSET),
        ],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=REPO,
        env=env,
    )
    rec = None
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            rec = json.loads(line)
    assert rec is not None, (
        f"smoke produced no record: rc={out.returncode} "
        f"stderr={out.stderr[-800:]}"
    )
    assert rec["master"].startswith("local-cluster")
    assert rec["n"] == len(SUBSET)
    assert rec["strict_green"], (
        f"local-cluster subset not green: {rec} "
        f"stdout_tail={out.stdout[-800:]}"
    )
