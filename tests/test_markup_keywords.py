"""Round-7 curation additions: HTML/markup stripping, tf-idf keyword
extraction, corpus-level boilerplate paragraph removal, and
token-weighted temperature resampling — each checked against a DuckDB
replay of the same semantics (the driver-gate contract) plus hand
cases pinning the edge behavior."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.functions.text import (
    EN_STOPWORDS,
    MARKUP_TAG_RE,
    markup_tag_count,
    strip_markup,
    strip_markup_sql,
)
from solarpaneldatawrangler_spark.operators.dedup import (
    remove_boilerplate_paragraphs,
)
from solarpaneldatawrangler_spark.operators.ranking import tfidf_keywords
from solarpaneldatawrangler_spark.operators.sampling import (
    temperature_rate_table,
    temperature_resample,
)

_SQL_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0)"




# --- strip_markup -----------------------------------------------------------


def test_strip_markup_hand_cases(spark):
    rows = [
        (
            1,
            '<html><head><style>p{color:red}</style></head><body>'
            '<p>Hello <b>world</b></p><!-- hidden -->'
            '<script type="text/javascript">var x="<p>";</script>'
            "Tom &amp; Jerry &amp;lt; &#39;q&#39;&nbsp;end</body></html>",
        ),
        (2, "no markup at all"),
        # tag boundaries become spaces (no welding); bare < > untouched
        (3, "a</p><p>b &lt;tag&gt; 1 < 2 and x > y"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r.doc_id: (r.s, r.n)
        for r in df.select(
            "doc_id",
            strip_markup(F.col("text")).alias("s"),
            markup_tag_count(F.col("text")).alias("n"),
        ).collect()
    }
    # </p> is a paragraph break (block tag), not a space
    assert got[1] == ("Hello world\n\nTom & Jerry &lt; 'q' end", 15)
    assert got[2] == ("no markup at all", 0)
    # "a</p><p>b" -> block break; entity-escaped <tag> decodes ONE level
    assert got[3] == ("a\n\nb <tag> 1 < 2 and x > y", 2)
    assert got[4] == (None, None)


def test_strip_markup_matches_duckdb(spark, sf_dir):
    """Cross-engine on real corpus text wrapped in deterministic markup
    (same derived-text idiom as q52's PII probe)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # \x0b (vertical tab): Java \s matches it, RE2's does not — the
    # explicit MARKUP_HWS_RE class must make both engines collapse it
    mtext = F.concat(
        F.lit('<div class="c"><p>'),
        F.col("text"),
        F.lit("</p>\x0bvt<script>var i="),
        F.col("doc_id").cast("string"),
        F.lit(";</script>&amp; <!-- x --></div>"),
    )
    got = (
        docs.select(
            "doc_id",
            F.md5(strip_markup(mtext)).alias("fp"),
            markup_tag_count(mtext).alias("n"),
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    mexpr = (
        f"""'<div class="c"><p>' || text || '</p>' || chr(11) || """
        f"'vt<script>var i=' "
        f"|| CAST(doc_id AS VARCHAR) || ';</script>&amp; <!-- x --></div>'"
    )
    want = (
        duckdb.connect()
        .execute(
            f"SELECT doc_id, md5({strip_markup_sql(mexpr)}) AS fp, "
            f"len(regexp_extract_all({mexpr}, '{MARKUP_TAG_RE}')) AS n "
            f"FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
        )
        .fetchdf()
    )
    assert got.fp.tolist() == want.fp.tolist()
    assert got.n.tolist() == want.n.astype(int).tolist()


# --- tfidf_keywords ---------------------------------------------------------


def test_tfidf_keywords_matches_duckdb(spark, sf_dir):
    out = (
        tfidf_keywords(
            spark.read.parquet(f"{sf_dir}/documents.parquet"),
            k=3,
            stopwords=EN_STOPWORDS,
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    sw = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"
    want = (
        duckdb.connect()
        .execute(f"""
        WITH toks AS (
          SELECT doc_id, unnest({_SQL_TOKS}) AS term
          FROM read_parquet('{sf_dir}/documents.parquet')
        ),
        ft AS (SELECT doc_id, term FROM toks WHERE NOT list_contains({sw}, term)),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM ft GROUP BY 1, 2),
        dfr AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
        scored AS (
          SELECT tf.doc_id, tf.term,
                 ROUND(tf.tf * ln((n.n + 1.0) / (dfr.df + 1.0)), 6) AS s
          FROM tf JOIN dfr USING (term), n
        ),
        ranked AS (
          SELECT doc_id, term, s,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY s DESC, term ASC) AS rk
          FROM scored
        )
        SELECT doc_id, string_agg(term, '|' ORDER BY rk) AS kw,
               MAX(CASE WHEN rk = 1 THEN s END) AS kw_score_r
        FROM ranked WHERE rk <= 3 GROUP BY doc_id ORDER BY doc_id
        """)
        .fetchdf()
    )
    assert len(out) == len(want)
    assert out.kw.tolist() == want.kw.tolist()
    assert (out.kw_score_r - want.kw_score_r).abs().max() < 1e-9


def test_tfidf_keywords_hand_case(spark):
    # 'rare' appears only in doc 1 -> highest idf beats the frequent
    # 'common'; stopword 'the' never appears; empty doc -> no row
    rows = [
        (1, "the rare common common"),
        (2, "common common the"),
        (3, "the the"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r.doc_id: r.kw
        for r in tfidf_keywords(df, k=2, stopwords=["the"]).collect()
    }
    assert got[1].split("|")[0] == "rare"
    assert got[2] == "common"
    assert 3 not in got and 4 not in got


def test_tfidf_keywords_rejects_bad_k(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    with pytest.raises(ValueError, match="k must be >= 1"):
        tfidf_keywords(df, k=0)


def test_tfidf_window_and_regroup_share_one_exchange(spark, sf_dir):
    """The rank window (partitionBy id) and the final groupBy(id) must
    not shuffle twice: the groupBy reuses the window's hash
    partitioning, so the physical plan has exactly one Exchange
    hashpartitioning(id)."""
    plan = tfidf_keywords(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), k=3
    )._jdf.queryExecution().executedPlan().toString()
    # plan prints top-down: final agg ... partial agg ... Window. No
    # Exchange may appear between them (the regroup consumes the
    # window's partitioning as-is)
    top = plan.index("ObjectHashAggregate")
    win = plan.index("Window [row_number()")
    assert "Exchange" not in plan[top:win], plan[top:win]
    # bonus contract: Spark pushes a partial top-k below that exchange
    # (WindowGroupLimit), so only ~k rows per (partition, id) shuffle
    assert "WindowGroupLimit" in plan


# --- remove_boilerplate_paragraphs ------------------------------------------


def test_boilerplate_removal_matches_duckdb(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    built = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("COOKIE NOTICE accept our cookies\n\n"), F.col("text")
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    got = (
        remove_boilerplate_paragraphs(built, min_df=3)
        .select("doc_id", F.md5("text").alias("fp"), "n_kept", "n_dropped")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        duckdb.connect()
        .execute(f"""
        WITH built AS (
          SELECT doc_id, CASE WHEN doc_id % 3 = 0
             THEN 'COOKIE NOTICE accept our cookies' || chr(10) || chr(10) || text
             ELSE text END AS text
          FROM read_parquet('{sf_dir}/documents.parquet')
        ),
        paras AS (
          SELECT doc_id, u.p - 1 AS pos, parts[CAST(u.p AS INT)] AS para,
                 regexp_replace(trim(lower(parts[CAST(u.p AS INT)])),
                                '\\s+', ' ', 'g') AS norm
          FROM (SELECT doc_id, string_split_regex(text, '\\n\\s*\\n') AS parts
                FROM built),
               LATERAL UNNEST(range(1, len(parts) + 1)) AS u(p)
        ),
        np AS (SELECT doc_id, pos, para, md5(norm) AS fp FROM paras
               WHERE norm <> ''),
        bp AS (SELECT fp FROM (SELECT fp, doc_id FROM np GROUP BY 1, 2)
               GROUP BY fp HAVING COUNT(*) >= 3),
        kept AS (SELECT np.* FROM np LEFT JOIN bp USING (fp)
                 WHERE bp.fp IS NULL),
        rebuilt AS (
          SELECT doc_id, COUNT(*) AS n_kept,
                 string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text
          FROM kept GROUP BY doc_id
        ),
        totals AS (SELECT doc_id, COUNT(*) AS n_paras FROM np GROUP BY doc_id)
        SELECT b.doc_id, md5(COALESCE(r.text, '')) AS fp,
               COALESCE(r.n_kept, 0) AS n_kept,
               COALESCE(t.n_paras, 0) - COALESCE(r.n_kept, 0) AS n_dropped
        FROM built b
        LEFT JOIN totals t USING (doc_id)
        LEFT JOIN rebuilt r USING (doc_id)
        ORDER BY doc_id
        """)
        .fetchdf()
    )
    assert got.fp.tolist() == want.fp.tolist()
    assert got.n_kept.tolist() == want.n_kept.astype(int).tolist()
    assert got.n_dropped.tolist() == want.n_dropped.astype(int).tolist()


def test_boilerplate_removal_hand_case(spark):
    """df >= min_df removes EVERY copy (unlike paragraph_dedup's
    keep-first); below-threshold repeats all survive; within-doc
    repetition counts once toward document frequency."""
    rows = [
        (1, "BOILER\n\nunique one"),
        (2, "BOILER\n\nBOILER\n\nunique two"),  # twice in ONE doc
        (3, "BOILER\n\nunique three"),
        (4, "twice\n\nkeep me"),
        (5, "twice\n\nalso kept"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r.doc_id: (r.text, r.n_kept, r.n_dropped)
        for r in remove_boilerplate_paragraphs(df, min_df=3).collect()
    }
    assert got[1] == ("unique one", 1, 1)
    assert got[2] == ("unique two", 1, 2)  # both copies removed
    assert got[3] == ("unique three", 1, 1)
    # 'twice' is in only 2 docs < min_df=3: all copies survive
    assert got[4] == ("twice\n\nkeep me", 2, 0)
    assert got[5] == ("twice\n\nalso kept", 2, 0)


def test_boilerplate_removal_rejects_min_df_one(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    with pytest.raises(ValueError, match="min_df must be >= 2"):
        remove_boilerplate_paragraphs(df, min_df=1)


def test_boilerplate_removal_no_window_in_plan(spark, sf_dir):
    """Same skew contract as paragraph_dedup: the hot-fingerprint count
    must be a map-side-combinable aggregate, never a Window."""
    plan = (
        remove_boilerplate_paragraphs(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), min_df=2
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


# --- token-weighted temperature resampling ----------------------------------


def test_weighted_temperature_matches_duckdb(spark, sf_dir):
    """Weighted rates = the SAME pure-Python table over token sums; the
    kept set replays in DuckDB from that table as VALUES literals."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "n_tokens", F.size(F.split(F.trim(F.lower("text")), r"\s+"))
    )
    kept = temperature_resample(
        docs, "lang", alpha=0.5, target_frac=0.5, weight_col="n_tokens"
    )
    got = sorted(r.doc_id for r in kept.select("doc_id").collect())

    con = duckdb.connect()
    counts = con.execute(
        "SELECT lang, SUM(len(list_filter(string_split_regex("
        "trim(lower(text)), '\\s+'), t -> len(t) > 0))) FROM "
        f"read_parquet('{sf_dir}/documents.parquet') GROUP BY lang"
    ).fetchall()
    tbl = temperature_rate_table(counts, 0.5, 0.5)
    values = ",".join(f"({s!r}, CAST({r!r} AS DOUBLE))" for s, _, r in tbl)
    want = [
        r[0]
        for r in con.execute(f"""
        WITH rates(lang, rate) AS (VALUES {values})
        SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')
        JOIN rates USING (lang)
        WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               / 4294967296.0) < rate
        ORDER BY doc_id
        """).fetchall()
    ]
    assert got == want
    assert 0 < len(got) < docs.count()
    # note: tokens() counts non-empty tokens; split on trimmed text
    # keeps both engines seeing identical counts for this probe


def test_weighted_temperature_shifts_mass_vs_doc_counts(spark):
    """Token weighting must react to token mass, not doc counts: two
    strata with equal doc counts but 10x token mass difference get
    different weighted rates (the unweighted rates are equal)."""
    rows = [(i, "big", "w " * 100) for i in range(50)] + [
        (i + 50, "small", "w " * 10) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id int, s string, text string")
    df = df.withColumn("n_tokens", F.size(F.split(F.trim("text"), r"\s+")))
    from solarpaneldatawrangler_spark.operators.sampling import (
        temperature_rates,
    )

    unw = {
        r[0]: r["_rate"] for r in temperature_rates(df, "s", 0.5, 0.5).collect()
    }
    wtd = {
        r[0]: r["_rate"]
        for r in temperature_rates(
            df, "s", 0.5, 0.5, weight_col="n_tokens"
        ).collect()
    }
    assert unw["big"] == unw["small"]
    assert wtd["big"] < wtd["small"]  # alpha<1 tilts toward small strata


def test_weighted_temperature_zero_weight_stratum():
    """A stratum whose docs all weigh 0 gets rate 0.0 (not a crash)."""
    tbl = temperature_rate_table([("empty", 0), ("full", 100)], 0.5, 0.5)
    assert dict((s, r) for s, _, r in tbl)["empty"] == 0.0
    assert all(tbl_r >= 0 for _, _, tbl_r in tbl)
    # all-zero corpus: no division by zero either
    assert temperature_rate_table([("a", 0), ("b", 0)], 0.5, 0.5) == [
        ("a", 0, 0.0),
        ("b", 0, 0.0),
    ]


def test_weighted_temperature_null_and_negative_mass():
    """NULL mass (all weights null in a stratum) normalizes to 0 and
    contributes nothing; negative mass (buggy weight column) fails
    loudly instead of as a complex-power TypeError."""
    tbl = temperature_rate_table([("nullish", None), ("full", 100)], 0.5, 0.5)
    assert dict((s, r) for s, _, r in tbl)["nullish"] == 0.0
    assert dict((s, n) for s, n, _ in tbl)["nullish"] == 0
    with pytest.raises(ValueError, match="negative mass"):
        temperature_rate_table([("bad", -5), ("full", 100)], 0.5, 0.5)
