"""Round-tag helper — dependency-free ON PURPOSE (r15).

bench.py imports the whole package (CATALOG) at module top, and the
catalog builds its data-dependent VALUES oracles at import time against
$SPARK_GRAFT_ORACLE_SF_DIR. Scripts that must set env BEFORE the
package imports (sf1_sweep exports ORACLE_SF_DIR, the cluster smokes
export SPARK_GRAFT_MASTER) therefore cannot take the round tag from
bench at module top — r15's first sf1 sweep did exactly that and every
data-dependent oracle silently trained at the default sf0.01 (7/50
strict failures, all in the VALUES-oracle family). This module imports
nothing but os, so any script can import it first.
"""

from __future__ import annotations

import os

_REPO = os.path.dirname(os.path.abspath(__file__))


def current_round() -> int:
    """THE round tag for bench_out records — single definition (r15,
    ADVICE: previously copy-pasted into five scripts, and max+1
    mislabels any probe re-run AFTER the round's BENCH_r{N}.json
    lands).

    Resolution order:
      1. $SPARK_GRAFT_ROUND — explicit override; set it when re-running
         a probe for a round whose BENCH record already exists.
      2. max existing BENCH_r*.json + 1 — during a round this equals
         the in-flight round number (the driver writes BENCH_r{N}.json
         only after the round ends).
    """
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        return int(env)
    prior = [
        int(f[len("BENCH_r"):-len(".json")])
        for f in os.listdir(_REPO)
        if f.startswith("BENCH_r") and f.endswith(".json")
        and f[len("BENCH_r"):-len(".json")].isdigit()
    ]
    return (max(prior) if prior else 0) + 1
