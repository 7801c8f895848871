#!/usr/bin/env python
"""q52 scale-cost attribution (r16 VERDICT item 5).

q52_quality_score is the sweep's pathological query: 789 s Spark-side
at sf1 (healthy re-run) vs <= ~100 s for every other catalog entry. It
merges four column families over documents:

  base   pure-codegen expression battery (quality, repetition
         fractions, clf, PII, markup) — single scan, no shuffle
  rep    gopher_dup_ngram_char_fracs — the documented Arrow-batched
         pandas-UDF exception (CPU-bound Python)
  kw     tfidf_keywords — token explode + tf/df aggs + per-doc top-k
  c4     c4_filter_workload — expression battery, single scan
  dsir   dsir_workload — hashed-feature HOF fold + Gumbel top-k

This script times each family's EXECUTION (noop-sink write of the
pre-built frame — the bench.py queries_exec contract, so count()
pruning cannot fake a cheap arm) in isolation, plus the full query,
at one or more sf dirs. It also times the candidate fix arms so a
change lands with its own measured attribution.

Usage:
    python scripts/q52_attribution.py [sf_dir ...]
Record: bench_out/r{N}_q52_attr.json
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from roundtag import current_round  # noqa: E402

RECORD = os.path.join(
    REPO, "bench_out", f"r{current_round():02d}_q52_attr.json"
)
WARM_DIR = "/root/testdata/sf0.01"


def _arms(spark, sf_dir):
    """name -> DataFrame builder for each isolated family."""
    from pyspark.sql import functions as F

    from solarpaneldatawrangler_spark.functions.text import (
        PII_PATTERNS_RE2,
        duplicate_line_char_fraction,
        duplicate_line_fraction,
        duplicate_paragraph_char_fraction,
        duplicate_paragraph_fraction,
        markup_tag_count,
        pii_count,
        redact_pii,
        strip_markup,
        top_ngram_char_fraction,
    )
    from solarpaneldatawrangler_spark.operators.curation import (
        gopher_dup_ngram_char_fracs,
        hashed_linear_score_r6,
    )
    from solarpaneldatawrangler_spark.operators.ranking import tfidf_keywords
    from solarpaneldatawrangler_spark.plans.catalog import CATALOG
    from solarpaneldatawrangler_spark.functions.text import (
        EN_STOPWORDS,
        quality_score,
    )
    from solarpaneldatawrangler_spark.plans.extension_queries import (
        _DSIR_T,
        c4_filter_workload,
        dsir_workload,
    )
    from solarpaneldatawrangler_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents")
    ptext = F.concat(
        F.col("text"),
        F.lit(" contact u"), F.col("doc_id").cast("string"),
        F.lit("@mail"), (F.col("doc_id") % 4).cast("string"),
        F.lit(".net from 10."), (F.col("doc_id") % 200).cast("string"),
        F.lit(".3."), (F.col("doc_id") % 250).cast("string"),
    )
    mtext = F.concat(
        F.lit('<div class="c"><p>'),
        F.col("text"),
        F.lit("</p><script>var i="),
        F.col("doc_id").cast("string"),
        F.lit(";</script>&amp; <!-- x --></div>"),
    )
    rtext = F.concat_ws(
        " ",
        F.col("text"),
        F.col("text").substr(
            F.lit(1), F.floor(F.length("text") / 2).cast("int")
        ),
    )
    ltext = F.concat(
        F.col("text"), F.lit("\n"), F.col("text"), F.lit("\n\n"),
        F.col("text").substr(F.lit(1), F.lit(25)),
    )

    def base_expr():
        return docs.select(
            "doc_id",
            quality_score(F.col("text")).alias("quality"),
            duplicate_line_fraction(ltext).alias("rep_lf"),
            duplicate_line_char_fraction(ltext).alias("rep_lcf"),
            duplicate_paragraph_fraction(ltext).alias("rep_pf"),
            duplicate_paragraph_char_fraction(ltext).alias("rep_pcf"),
            top_ngram_char_fraction(rtext, 2).alias("rep_top2"),
            top_ngram_char_fraction(rtext, 3).alias("rep_top3"),
            hashed_linear_score_r6(F.col("text")).alias("clf_r"),
            pii_count(ptext, patterns=PII_PATTERNS_RE2)
            .cast("long")
            .alias("pii_n"),
            F.md5(redact_pii(ptext, patterns=PII_PATTERNS_RE2)).alias(
                "red_fp"
            ),
            markup_tag_count(mtext).cast("long").alias("tag_n"),
            F.md5(strip_markup(mtext)).alias("strip_fp"),
        )

    return {
        "full": lambda: CATALOG["q52_quality_score"].fn(spark, sf_dir),
        "base_expr": base_expr,
        "rep_udf": lambda: docs.select(
            "doc_id", gopher_dup_ngram_char_fracs(rtext).alias("_rep")
        ),
        "rep_top23": lambda: docs.select(
            "doc_id",
            top_ngram_char_fraction(rtext, 2).alias("rep_top2"),
            top_ngram_char_fraction(rtext, 3).alias("rep_top3"),
        ),
        "kw": lambda: tfidf_keywords(docs, k=3, stopwords=EN_STOPWORDS),
        "kw_mat": lambda: tfidf_keywords(
            docs, k=3, stopwords=EN_STOPWORDS, materialize_tf=True
        ),
        "c4": lambda: c4_filter_workload(spark, sf_dir),
        "dsir": lambda: dsir_workload(spark, sf_dir).withColumn(
            "dsir_thr_kept",
            F.coalesce(
                F.col("dsir_w_r") >= F.lit(_DSIR_T), F.lit(False)
            ),
        ),
    }


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    from solarpaneldatawrangler_spark.session import get_spark

    spark = get_spark("q52-attribution")
    # merge into an existing record: runs at different sf dirs
    # accumulate under "scales" instead of clobbering each other
    rec: dict = {"scales": {}}
    if os.path.exists(RECORD):
        try:
            with open(RECORD) as fh:
                rec = json.load(fh)
            rec.setdefault("scales", {})
        except (OSError, ValueError):
            pass
    for sf_dir in dirs:
        arms = _arms(spark, sf_dir)
        warm_arms = _arms(spark, WARM_DIR)
        per: dict = {}
        rec["scales"][sf_dir] = per
        for name, build in arms.items():
            # warm: codegen + one-time artifact training at gate scale
            warm_arms[name]().write.format("noop").mode(
                "overwrite"
            ).save()
            df = build()
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            per[name] = {
                "exec_s": round(time.monotonic() - t0, 3),
                "load1": round(os.getloadavg()[0], 2),
            }
            print(f"# {sf_dir} {name}: {per[name]}", flush=True)
    os.makedirs(os.path.dirname(RECORD), exist_ok=True)
    with open(RECORD, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(f"# wrote {RECORD}")


if __name__ == "__main__":
    main()
