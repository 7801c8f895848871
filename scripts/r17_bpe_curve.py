"""r17 BPE scaling-curve evidence (VERDICT r16 item 6): the r16 JVM
incremental merge loop claims O(V*m) total work vs the old
re-encode-from-scratch loop's O(V*m^2). This probe times BOTH loops
over the SAME localCheckpoint'ed sf1 word table at n_merges = 24 / 48 /
96 (1x / 2x / 4x), asserts the learned merge tables are IDENTICAL, and
commits the curve: the old loop's per-merge cost should grow with m
(each iteration re-applies all previous merges), the new loop's should
stay ~flat.

The old loop body is the pre-r16 implementation verbatim
(git 6fe1c32^, operators/bpe.py::_bpe_merge_loop).

Usage: python scripts/r17_bpe_curve.py [sf_dir]
Writes bench_out/r17_bpe_curve_<sfname>.json
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "testdata_sf1")
N_MERGES = (24, 48, 96)


def old_merge_loop(words, n_merges):
    """Pre-r16 loop, verbatim: every iteration re-encodes every word
    from scratch with ALL merges learned so far (mapInPandas per
    iteration)."""
    import pandas as pd

    from solarpaneldatawrangler_spark.operators.bpe import encode_word

    merges = []
    for _ in range(n_merges):
        frozen = list(merges)

        def pair_counts(batches, _m=frozen):
            memo = {}
            agg = Counter()
            for pdf in batches:
                for w, n in zip(pdf["w"], pdf["n"]):
                    toks = memo.get(w)
                    if toks is None:
                        toks = memo[w] = encode_word(w, _m)
                    for a, b in zip(toks, toks[1:]):
                        agg[(a, b)] += int(n)
            if agg:
                yield pd.DataFrame(
                    {
                        "a": [p[0] for p in agg],
                        "b": [p[1] for p in agg],
                        "c": list(agg.values()),
                    }
                )

        total = Counter()
        for r in words.mapInPandas(
            pair_counts, "a string, b string, c long"
        ).collect():
            total[(r["a"], r["b"])] += r["c"]
        if not total:
            break
        best, cnt = min(
            total.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        merges.append(best)
    return merges


def main() -> None:
    import pandas as pd
    from pyspark.sql import functions as F

    from solarpaneldatawrangler_spark.operators import bpe
    from solarpaneldatawrangler_spark.sources.star import load_table
    from solarpaneldatawrangler_spark.session import get_spark

    spark = get_spark("r17-bpe-curve")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")

    def word_counts(batches):
        agg = Counter()
        for pdf in batches:
            for t in pdf["_t"]:
                agg.update((t or "").lower().split())
        if agg:
            yield pd.DataFrame({"w": list(agg.keys()), "n": list(agg.values())})

    words = (
        docs.select(F.col("text").alias("_t"))
        .mapInPandas(word_counts, "w string, n long")
        .groupBy("w")
        .agg(F.sum("n").alias("n"))
        .localCheckpoint()
    )
    n_vocab = words.count()

    out = {
        "sf_dir": SF_DIR,
        "vocab": n_vocab,
        "n_merges": list(N_MERGES),
        "old_s": {},
        "new_s": {},
        "identical_tables": {},
        "loads": {},
    }
    for m in N_MERGES:
        spark.sparkContext.setJobDescription(f"bpe-curve:new:{m}")
        t0 = time.perf_counter()
        new = bpe._bpe_merge_loop(words, m)
        out["new_s"][m] = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(f"bpe-curve:old:{m}")
        t0 = time.perf_counter()
        old = old_merge_loop(words, m)
        out["old_s"][m] = round(time.perf_counter() - t0, 3)
        out["identical_tables"][m] = bool(old == new)
        out["loads"][m] = [round(x, 2) for x in os.getloadavg()]
        print(
            f"# m={m}: old={out['old_s'][m]}s new={out['new_s'][m]}s "
            f"identical={out['identical_tables'][m]} load={out['loads'][m]}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)
    words.unpersist()

    # Part B — the corpus vocabulary is synthetic and tiny (310 distinct
    # words at sf1), so BOTH loops above are per-iteration job-overhead
    # bound and the O(V*m^2) re-encode term cannot express. Synthesize a
    # LARGE compound-word vocabulary (V words of 8 two-letter atoms, so
    # merges keep finding >= 2-count pairs for many rounds) and re-run
    # the curve where the asymptotic factor actually bites.
    v_big = int(os.environ.get("R17_BPE_SYNTH_V", "2000000"))
    # word_i = first 16 hex chars of md5(i): ~2M distinct words over a
    # 16-symbol alphabet, so char-level pair counts stay >= 2 for many
    # merge rounds and every iteration of the OLD loop re-encodes all V
    # words with all i merges learned so far
    sw = (
        spark.range(v_big)
        .select(
            F.substring(F.md5(F.col("id").cast("string")), 1, 16).alias("w"),
            F.lit(1).cast("long").alias("n"),
        )
        .groupBy("w")
        .agg(F.sum("n").alias("n"))
        .localCheckpoint()
    )
    out["synth_vocab"] = sw.count()
    out["synth_old_s"] = {}
    out["synth_new_s"] = {}
    out["synth_identical"] = {}
    out["synth_loads"] = {}
    for m in (8, 16, 32):
        spark.sparkContext.setJobDescription(f"bpe-curve:synth-new:{m}")
        t0 = time.perf_counter()
        new = bpe._bpe_merge_loop(sw, m)
        out["synth_new_s"][m] = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(f"bpe-curve:synth-old:{m}")
        t0 = time.perf_counter()
        old = old_merge_loop(sw, m)
        out["synth_old_s"][m] = round(time.perf_counter() - t0, 3)
        out["synth_identical"][m] = bool(old == new)
        out["synth_loads"][m] = [round(x, 2) for x in os.getloadavg()]
        print(
            f"# synth m={m}: old={out['synth_old_s'][m]}s "
            f"new={out['synth_new_s'][m]}s "
            f"identical={out['synth_identical'][m]} "
            f"load={out['synth_loads'][m]}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)
    sw.unpersist()

    tag = os.path.basename(SF_DIR.rstrip("/"))
    path = os.path.join(REPO, "bench_out", f"r17_bpe_curve_{tag}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"# wrote {path}")


if __name__ == "__main__":
    main()
