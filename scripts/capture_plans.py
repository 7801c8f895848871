#!/usr/bin/env python
"""Capture .explain("formatted") for every catalog query plus the
pinned bench headline workloads into plans/r16/<name>_<tag>.txt.

Usage: python scripts/capture_plans.py <tag> [name ...]
  tag: "before" / "after" (file suffix)
  name: optional subset of query names (default: all catalog + headline)

Plan capture only builds DataFrames (no actions except where a builder
itself runs one, e.g. CC's size-probe count), so it is cheap and safe
to run alongside nothing else.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solarpaneldatawrangler_spark.plans import CATALOG  # noqa: E402
from solarpaneldatawrangler_spark.session import get_spark, sf_dir_from_env  # noqa: E402

# r17: the plans dir follows the current round (was hardcoded r16)
from roundtag import current_round  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    f"r{current_round():02d}",
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    os.makedirs(OUT_DIR, exist_ok=True)
    sf_dir = sf_dir_from_env()
    spark = get_spark("capture-plans")

    import bench

    targets: dict[str, object] = {}
    for name, spec in sorted(CATALOG.items()):
        targets[name] = spec.fn
    # the pinned headline workloads diverge from the catalog fns; the
    # bench times these, so the judge-facing plan files must cover them
    for name, fn in bench.HEADLINE_FNS.items():
        targets[f"headline_{name}"] = fn

    for name, fn in targets.items():
        if only and name not in only and name.replace("headline_", "") not in only:
            continue
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture the failure instead of dying
            plan = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}"
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} [{tag}]\n{plan}")
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
