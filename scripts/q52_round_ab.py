#!/usr/bin/env python
"""Bench-context A/B of the exact-rounding variants on q52 (r13
VERDICT item 2).

DESIGN.md's pinned A/B measured the integer-exact rounding at ~10% on
an isolated quality scan, but the r13 canonical bench showed q52 warm
0.193 -> 0.250 s (1.30x) and cache-off 0.151 -> 0.313 s (2.07x). This
script reconciles: the EXACT bench workload (bench._quality_headline,
the pinned q52 HEADLINE fn), same session, warm (cached tables) and
cache-off passes, four variants of the terminal rounding expression —

  hybrid        the shipping r13 helper: per-row CASE int64/decimal
  decimal_only  the wide decimal(38,0) path unconditionally
  int64_only    the fast path unconditionally (valid at bench scale:
                numerators are orders of magnitude under 2^52/2e6)
  double_round  the pre-r13 F.round(num/den, 6) control — NOT
                value-identical near ties; timed for the cost baseline

Variants are interleaved round-robin (reps x order-rotated) so host
drift hits all arms equally; value-identity of the three exact arms is
VERIFIED by md5-hashing the full result each pass. Keep whichever
exact arm is cheapest (r13 VERDICT: if the int64 fast path wins
nowhere, delete it).

Writes bench_out/r14_q52_ab.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

_DEC = "decimal(38,0)"


def _decimal_only(num, den, dp):
    p = 10 ** dp
    n_w = F.abs(num).cast("long").cast(_DEC)
    d_w = den.cast("long").cast(_DEC)
    a_w = F.lit(2 * p).cast(_DEC) * n_w + d_w
    b_w = F.lit(2).cast(_DEC) * d_w
    q = ((a_w - F.pmod(a_w, b_w)) / b_w).cast("long")
    signed = F.when(num < 0, -q).otherwise(q)
    return signed.cast("double") / F.lit(float(p))


def _int64_only(num, den, dp):
    p = 10 ** dp
    n_l = F.abs(num).cast("long")
    d_l = den.cast("long")
    a_l = F.lit(2 * p).cast("long") * n_l + d_l
    b_l = F.lit(2).cast("long") * d_l
    q = ((a_l - F.pmod(a_l, b_l)) / b_l).cast("long")
    signed = F.when(num < 0, -q).otherwise(q)
    return signed.cast("double") / F.lit(float(p))


def _double_round(num, den, dp):
    return F.round(num.cast("double") / den.cast("double"), dp)


def _hof_bound(inner):
    """Evaluate num/den exactly ONCE by binding them to a higher-order
    -function lambda variable (single-element transform): the r13
    helper's CASE references num — in q52 a large token-HOF expression
    — ~4x, and HOF-bearing expressions fall out of whole-stage-codegen
    subexpression elimination, so each reference re-evaluates the
    numerator. The binding makes every reference a variable read."""

    def variant(num, den, dp):
        arr = F.array(
            F.struct(
                num.cast("long").alias("n"), den.cast("long").alias("d")
            )
        )
        return F.element_at(
            F.transform(
                arr,
                lambda s: inner(s.getField("n"), s.getField("d"), dp),
            ),
            1,
        )

    return variant


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")
    import bench
    from solarpaneldatawrangler_spark.functions import rounding
    from solarpaneldatawrangler_spark.functions import text as text_mod
    from solarpaneldatawrangler_spark.session import (
        get_spark,
        sf_dir_from_env,
    )
    from solarpaneldatawrangler_spark.sources import star

    variants = {
        "hybrid": rounding.round_ratio_half_away,
        "decimal_only": _decimal_only,
        "int64_only": _int64_only,
        "double_round": _double_round,
        "hof_decimal": _hof_bound(_decimal_only),
        "hof_int64": _hof_bound(_int64_only),
    }
    sf_dir = sf_dir_from_env()
    spark = get_spark("q52-round-ab")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5"))

    def measure(variant_fn) -> tuple[float, float, str]:
        """Returns (build_s, exec_s, value_hash).

        build_s: DataFrame construction + analysis (df.schema) — the
        driver-side py4j/analyzer cost of the expression tree. THIS is
        where the bench's q52 'regression' actually lives: the pinned
        workload's .count() prunes the quality column to a zero-column
        scan (ReadSchema struct<>, verified by explain), so the timed
        window only ever contained plan build + a metadata count.
        exec_s: an honest full evaluation — agg(sum(quality)) forces
        the expression for every row (what a real consumer pays)."""
        orig = text_mod.round_ratio_half_away
        text_mod.round_ratio_half_away = variant_fn
        try:
            t0 = time.perf_counter()
            df = bench._quality_headline(spark, sf_dir)
            df.schema  # force analysis
            build_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            df.agg(
                F.count(F.lit(1)).alias("n"), F.sum("quality").alias("s")
            ).collect()
            dt = time.perf_counter() - t0
            digest = df.agg(
                F.md5(
                    F.concat_ws(
                        ",",
                        F.sort_array(  # canonical order: hash is value-only
                            F.collect_list(
                                F.concat_ws(
                                    ":",
                                    F.col("doc_id"),
                                    F.col("quality").cast("string"),
                                )
                            )
                        ),
                    )
                ).alias("h")
            ).collect()[0][0]
        finally:
            text_mod.round_ratio_half_away = orig
        return round(build_s, 3), dt, digest

    rec: dict = {"sf_dir": sf_dir, "reps": reps, "passes": {}}
    names = list(variants)
    for mode in ("warm", "cache_off"):
        if mode == "cache_off":
            os.environ["SPARK_GRAFT_CACHE_TABLES"] = "0"
            star._MEMO.clear()
            spark.catalog.clearCache()
            try:
                spark.sparkContext._jvm.System.gc()
                time.sleep(1.0)
            except Exception:  # noqa: BLE001
                pass
        times: dict[str, list[float]] = {n: [] for n in names}
        builds: dict[str, list[float]] = {n: [] for n in names}
        hashes: dict[str, set] = {n: set() for n in names}
        for i in range(reps):
            order = names[i % len(names):] + names[: i % len(names)]
            for n in order:
                b, dt, h = measure(variants[n])
                builds[n].append(b)
                times[n].append(round(dt, 3))
                hashes[n].add(h)
        rec["passes"][mode] = {
            n: {
                "exec_best": min(ts),
                "exec_all": ts,
                "build_best": min(builds[n]),
                "build_all": builds[n],
            }
            for n, ts in times.items()
        }
        exact_arms = [n for n in names if n != "double_round"]
        rec["passes"][mode]["hash_identical_exact_arms"] = (
            all(hashes[n] == hashes["hybrid"] for n in exact_arms)
            and len(hashes["hybrid"]) == 1
        )
        rec["passes"][mode]["double_round_same_hash"] = (
            hashes["double_round"] == hashes["hybrid"]
        )
        print(f"# {mode} exec: " + json.dumps(
            {n: min(ts) for n, ts in times.items()}), flush=True)
        print(f"# {mode} build: " + json.dumps(
            {n: min(bs) for n, bs in builds.items()}), flush=True)
    out = os.path.join(REPO, "bench_out", "r14_q52_ab.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps({"record": out}))


if __name__ == "__main__":
    main()
