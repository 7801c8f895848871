"""r17 skew-handling evidence (VERDICT r16 item 5, guide §2.5): the
engine ships two skew mitigations — AQE skew-join splitting (on in
session.py) and operators.skew.salted_join — but no committed evidence
either fires. This probe builds the reference-domain skew case (one
huge city: a single polygon_name key carrying ~1000x the tiles of its
peers), makes the dimension side non-broadcastable (threshold -1, the
salted_join contract), and measures three arms over the identical join:

  smj_skew_split : sort-merge join, AQE skewJoin ON  -> the hot
                   partition is split at runtime (plan shows
                   AQEShuffleRead ... skewed)
  smj_straggler  : same join, AQE skewJoin OFF       -> one straggler
                   task owns the hot key
  salted_join    : operators.skew.salted_join, AQE skewJoin OFF ->
                   the salt spreads the hot key over 16 tasks

The skew thresholds are lowered (8 MB) to fire at probe volume — the
mechanism under test is the SPLIT, not the 256 MB production default;
both arms run under the identical thresholds so the comparison is
apples-to-apples. Row counts are asserted identical across arms
(salting must not change results). Writes
bench_out/r17_skew_probe.json and plans/r17/skew_{split,straggler}.txt.

Usage: python scripts/r17_skew_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HOT_ROWS = 8_000_000
COLD_KEYS = 1_000
COLD_ROWS_PER_KEY = 1_000
REPEATS = 3


def main() -> None:
    from pyspark.sql import functions as F

    from solarpaneldatawrangler_spark.operators.skew import salted_join
    from solarpaneldatawrangler_spark.session import get_spark

    spark = get_spark("r17-skew-probe")
    sc = spark.sparkContext

    # fact: one hot polygon (key 0) with HOT_ROWS tiles, COLD_KEYS
    # polygons with COLD_ROWS_PER_KEY tiles each; a ~64-byte payload
    # gives the hot partition real bytes for the size-based skew gate
    # payload must be INCOMPRESSIBLE (md5 chains): the skew gate is on
    # COMPRESSED shuffle bytes, and a repeat('x',64) payload lz4'd the
    # 1M-row hot partition under the 8 MB threshold — the first probe
    # run showed 'coalesced', never 'skewed' (kept in git history as
    # the cautionary tale)
    def payload(col):
        return F.concat(
            F.md5(col.cast("string")),
            F.md5((col + 1).cast("string")),
            F.md5((col + 2).cast("string")),
            F.md5((col + 3).cast("string")),
        )

    hot = spark.range(HOT_ROWS).select(
        F.lit(0).alias("poly"),
        F.col("id").alias("tile_id"),
        payload(F.col("id")).alias("payload"),
    )
    cold = spark.range(COLD_KEYS * COLD_ROWS_PER_KEY).select(
        (F.col("id") % COLD_KEYS + 1).alias("poly"),
        (F.col("id") + HOT_ROWS).alias("tile_id"),
        payload(F.col("id") + HOT_ROWS).alias("payload"),
    )
    fact = hot.unionByName(cold).localCheckpoint()  # pin inputs once
    dim = (
        spark.range(COLD_KEYS + 1)
        .select(
            F.col("id").alias("poly"),
            F.md5(F.col("id").cast("string")).alias("meta"),
        )
        .localCheckpoint()
    )

    def join_plain():
        j = fact.join(dim, "poly")
        return j.select(
            F.sum(F.length("payload") + F.length("meta")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )

    def join_salted():
        j = salted_join(fact, dim, "poly", salt_buckets=16)
        return j.select(
            F.sum(F.length("payload") + F.length("meta")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )

    thr = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    orig = {k: spark.conf.get(k) for k in thr}

    out: dict[str, object] = {
        "hot_rows": HOT_ROWS,
        "cold_keys": COLD_KEYS,
        "cold_rows_per_key": COLD_ROWS_PER_KEY,
        "repeats": REPEATS,
        "times": {},
        "rows": {},
        "loads": {},
    }
    plans: dict[str, str] = {}

    def arm(name: str, build, skew_on: bool) -> None:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        sc.setJobDescription(f"skew-probe:{name}")
        best = float("inf")
        for _ in range(REPEATS):
            # REBUILD per repeat: re-collecting the same DataFrame
            # reuses its completed shuffle map stages, so repeats 2+
            # skipped the very work the probe measures
            df = build()
            t0 = time.perf_counter()
            row = df.collect()[0]
            best = min(best, time.perf_counter() - t0)
        out["times"][name] = round(best, 3)
        out["rows"][name] = [row["s"], row["n"]]
        out["loads"][name] = [round(x, 2) for x in os.getloadavg()]
        # final (AQE-re-optimized) executed plan, which is where the
        # skew-split AQEShuffleRead shows up
        plans[name] = (
            df._jdf.queryExecution().executedPlan().toString()
        )
        print(f"# {name}: {out['times'][name]}s rows={row['n']}")
        sc.setJobDescription(None)

    try:
        for k, v in thr.items():
            spark.conf.set(k, v)
        arm("smj_skew_split", join_plain, skew_on=True)
        arm("smj_straggler", join_plain, skew_on=False)
        arm("salted_join", join_salted, skew_on=False)
    finally:
        for k, v in orig.items():
            spark.conf.set(k, v)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    assert out["rows"]["smj_skew_split"] == out["rows"]["smj_straggler"]
    assert out["rows"]["smj_skew_split"] == out["rows"]["salted_join"], (
        "salting changed the join result"
    )
    out["skew_split_in_plan"] = "skewed" in plans["smj_skew_split"]
    out["straggler_plan_has_no_split"] = (
        "skewed" not in plans["smj_straggler"]
    )

    os.makedirs(os.path.join(REPO, "plans", "r17"), exist_ok=True)
    for name, key in (
        ("skew_split", "smj_skew_split"),
        ("skew_straggler", "smj_straggler"),
        ("skew_salted", "salted_join"),
    ):
        with open(os.path.join(REPO, "plans", "r17", f"{name}.txt"), "w") as fh:
            fh.write(plans[key])
    path = os.path.join(REPO, "bench_out", "r17_skew_probe.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"# wrote {path}")


if __name__ == "__main__":
    main()
