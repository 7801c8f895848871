"""r17 measure-first probe (VERDICT r16 item 2): decompose q52's sf1
cost (98.97 s in bench_out/r16_sf1.json) into its merged components so
the optimization effort lands where the time lives — each component is
noop-sink timed (guide §1.4) best-of-N in one session, with loadavg
recorded around every unit.

Usage: python scripts/r17_q52_decomp.py [sf_dir] [repeats]
Writes bench_out/r17_q52_decomp_<sfname>.json
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "testdata_sf1")
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def _q53_flags_probe(spark, docs):
    """The q53 shape verbatim: gopher_flags as a struct column whose
    fields are extracted per rule + AND'd — the SimplifyExtractValueOps
    copy-rewrite suspect."""
    from pyspark.sql import functions as F

    from solarpaneldatawrangler_spark.functions.text import gopher_flags
    from solarpaneldatawrangler_spark.plans.extension_queries import (
        _GOPHER_RULES,
        _and_all,
    )

    d = docs.withColumn("_g", gopher_flags(F.col("text")))
    return d.select(
        "doc_id",
        *[F.col(f"_g.{r}").alias(r) for r in _GOPHER_RULES],
        _and_all([F.col(f"_g.{r}") for r in _GOPHER_RULES]).alias("gopher_ok"),
    )


def _q53_lang_probe(spark, docs):
    """The q53 lang-score shape verbatim: s_en..s_de subtrees referenced
    ~16x across pred/margin — each reference re-tokenizes."""
    from pyspark.sql import functions as F

    from solarpaneldatawrangler_spark.functions.text import lang_marker_score

    t = F.col("text")
    s_en, s_es = lang_marker_score(t, "en"), lang_marker_score(t, "es")
    s_fr, s_de = lang_marker_score(t, "fr"), lang_marker_score(t, "de")
    pred = (
        F.when((s_en >= s_es) & (s_en >= s_fr) & (s_en >= s_de), F.lit("en"))
        .when((s_es >= s_fr) & (s_es >= s_de), F.lit("es"))
        .when(s_fr >= s_de, F.lit("fr"))
        .otherwise(F.lit("de"))
    )
    margin = F.greatest(s_en, s_es, s_fr, s_de) - F.greatest(
        F.least(s_en, s_es), F.least(s_en, s_fr), F.least(s_en, s_de),
        F.least(s_es, s_fr), F.least(s_es, s_de), F.least(s_fr, s_de),
    )
    return docs.select(
        "doc_id", pred.alias("pred_lang"), margin.alias("lang_margin")
    )


def _q57_adj_probe(spark, docs):
    """q57's 'adjacent' half: char-3-gram distinct arrays + consecutive
    self-join + intersect/union jaccard."""
    from pyspark.sql import functions as F

    from solarpaneldatawrangler_spark.functions.rounding import (
        round_ratio_half_away,
    )
    from solarpaneldatawrangler_spark.functions.text import char_ngrams

    sh = docs.select(
        "doc_id", F.array_distinct(char_ngrams(F.col("text"), 3)).alias("grams")
    )
    a, b = sh.alias("a"), sh.alias("b")
    return a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1).select(
        F.col("a.doc_id").alias("id_a"),
        round_ratio_half_away(
            F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams"))).cast("long"),
            F.greatest(
                F.size(F.array_union(F.col("a.grams"), F.col("b.grams"))), F.lit(1)
            ).cast("long"),
            6,
        ).alias("jaccard"),
    )


def main() -> None:
    from pyspark.sql import functions as F

    from solarpaneldatawrangler_spark.functions.text import (
        PII_PATTERNS_RE2,
        duplicate_line_char_fraction,
        duplicate_line_fraction,
        duplicate_paragraph_char_fraction,
        duplicate_paragraph_fraction,
        markup_tag_count,
        pii_count,
        quality_score,
        redact_pii,
        strip_markup,
        top_ngram_char_fraction,
    )
    from solarpaneldatawrangler_spark.operators.curation import (
        gopher_dup_ngram_char_fracs,
        gopher_rep_battery_fracs,
        hashed_linear_score_r6,
    )
    from solarpaneldatawrangler_spark.operators.ranking import tfidf_keywords
    from solarpaneldatawrangler_spark.plans.catalog import CATALOG
    from solarpaneldatawrangler_spark.plans.extension_queries import (
        c4_filter_workload,
        dsir_workload,
    )
    from solarpaneldatawrangler_spark.session import get_spark
    from solarpaneldatawrangler_spark.sources.star import load_table

    spark = get_spark("r17-q52-decomp")
    docs = load_table(spark, SF_DIR, "documents")
    # derived texts, verbatim from the q52 entry
    ltext = F.concat(
        F.col("text"), F.lit("\n"), F.col("text"), F.lit("\n\n"),
        F.col("text").substr(F.lit(1), F.lit(25)),
    )
    rtext = F.concat_ws(
        " ",
        F.col("text"),
        F.col("text").substr(
            F.lit(1), F.floor(F.length("text") / 2).cast("int")
        ),
    )
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

    # pre-fit the DSIR ratio table so the dsir unit times the scan
    from solarpaneldatawrangler_spark.operators.dsir import dsir_ratios_for_dir

    dsir_ratios_for_dir(SF_DIR, n_buckets=512)

    units: dict[str, object] = {
        "quality": lambda: docs.select(
            "doc_id", quality_score(F.col("text")).alias("q")
        ),
        "rep_linepara": lambda: docs.select(
            "doc_id",
            duplicate_line_fraction(ltext).alias("rep_lf"),
            duplicate_line_char_fraction(ltext).alias("rep_lcf"),
            duplicate_paragraph_fraction(ltext).alias("rep_pf"),
            duplicate_paragraph_char_fraction(ltext).alias("rep_pcf"),
        ),
        "rep_topgram": lambda: docs.select(
            "doc_id",
            top_ngram_char_fraction(rtext, 2).alias("rep_top2"),
            top_ngram_char_fraction(rtext, 3).alias("rep_top3"),
        ),
        "rep_dupngram_udf": lambda: docs.select(
            "doc_id", gopher_dup_ngram_char_fracs(rtext).alias("_rep")
        ),
        # r17 fused replacement for rep_topgram + rep_dupngram_udf
        "rep_fused": lambda: docs.select(
            "doc_id", gopher_rep_battery_fracs(rtext).alias("_rep")
        ),
        "clf": lambda: docs.select(
            "doc_id", hashed_linear_score_r6(F.col("text")).alias("clf_r")
        ),
        "pii": lambda: docs.select(
            "doc_id",
            pii_count(ptext, patterns=PII_PATTERNS_RE2).cast("long").alias("pii_n"),
            F.md5(redact_pii(ptext, patterns=PII_PATTERNS_RE2)).alias("red_fp"),
        ),
        "markup": lambda: docs.select(
            "doc_id",
            markup_tag_count(mtext).cast("long").alias("tag_n"),
            F.md5(strip_markup(mtext)).alias("strip_fp"),
        ),
        "kw_tfidf": lambda: tfidf_keywords(docs, k=3),
        "c4": lambda: c4_filter_workload(spark, SF_DIR),
        "dsir": lambda: dsir_workload(spark, SF_DIR),
        "full_q52": lambda: CATALOG["q52_quality_score"].fn(spark, SF_DIR),
        # q53/q57 are the #3/#2 sf1 costs (r16_sf1.json): probe their
        # scan-side suspects too
        "q53_gopher_flags_struct": lambda: _q53_flags_probe(spark, docs),
        "q53_lang_scores": lambda: _q53_lang_probe(spark, docs),
        "full_q53": lambda: CATALOG["q53_lang_id"].fn(spark, SF_DIR),
        "q57_char_ngrams_adj": lambda: _q57_adj_probe(spark, docs),
        "full_q57": lambda: CATALOG["q57_ngram_jaccard"].fn(spark, SF_DIR),
    }

    out: dict[str, object] = {
        "sf_dir": SF_DIR,
        "repeats": REPEATS,
        "times": {},
        "loads": {},
    }
    # footer warmup
    docs.count()
    for name, build in units.items():
        spark.sparkContext.setJobDescription(f"q52-decomp:{name}")
        try:
            build().schema  # analysis warm-up, outside the timing
            best = float("inf")
            for _ in range(REPEATS):
                # REBUILD per repeat (r17): units whose plan lazily
                # localCheckpoints an internal relation (dsir_workload,
                # full_q52) would otherwise reuse the materialized
                # blocks across repeats and best-of-N would time only
                # the post-checkpoint remainder
                df = build()
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            out["times"][name] = round(best, 3)
        except Exception as ex:  # noqa: BLE001
            out["times"][name] = f"ERROR {type(ex).__name__}: {ex}"[:200]
        out["loads"][name] = [round(x, 2) for x in os.getloadavg()]
        print(f"# {name}: {out['times'][name]} load={out['loads'][name]}")
        spark.sparkContext.setJobDescription(None)

    tag = os.path.basename(SF_DIR.rstrip("/"))
    path = os.path.join(REPO, "bench_out", f"r17_q52_decomp_{tag}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"# wrote {path}")


if __name__ == "__main__":
    main()
