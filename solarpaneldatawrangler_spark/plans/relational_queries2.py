"""Second batch of relational/operator queries: running windows (A9),
pivot, cube/rollup with grouping flags + global ceil-sum (A6/F6),
percentiles, ON-CONFLICT upsert (U3/S13), grid-neighbor self-join (J8),
group-collect (A4), and the Structured Streaming windowed aggregation
(§2.10) — each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from solarpaneldatawrangler_spark.operators.grid import neighbor_edges
from solarpaneldatawrangler_spark.operators.relational import exact_sum, upsert_by_key
from solarpaneldatawrangler_spark.plans.catalog import register
from solarpaneldatawrangler_spark.sources.star import load_table


# --- A9: running mean (run_inference.py:100,126-128) ------------------------

@register(
    "q22_running_avg",
    oracle="""
    SELECT user_id, event_id,
           ROUND(
             SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             9) AS running_avg
    FROM events
    """,
    doc="A9 running mean (the reference's hand-rolled avg_tiles_per_sec, "
    "run_inference.py:126-128) as an ordered window frame, rounded to 9dp "
    "on BOTH sides: DuckDB evaluates windowed sums with segment-tree "
    "aggregation, so the unrounded double differs from Spark's running "
    "accumulation in the last ulp (driver r01 hash catch).",
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w) / F.count(F.lit(1)).over(w), 9).alias("running_avg"),
    )


# --- pivot (wide-table reshaping, SURVEY §2.4 extension) --------------------

@register(
    "q23_pivot",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase
    FROM events GROUP BY user_id
    """,
    doc="Pivot: per-user event-type counts as columns. Spark .pivot() with "
    "explicit values (no discovery pass); oracle via FILTER aggregates.",
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["view", "click", "purchase"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        F.coalesce("view", F.lit(0)).alias("n_view"),
        F.coalesce("click", F.lit(0)).alias("n_click"),
        F.coalesce("purchase", F.lit(0)).alias("n_purchase"),
    )


# --- rollup/cube (hierarchical aggregates) + global ceil sum ----------------

@register(
    "q24_rollup",
    oracle="""
    SELECT 'cube' AS tag, l_returnflag AS k1, l_linestatus AS k2,
           CAST(GROUPING(l_returnflag) AS INT) AS g1,
           CAST(GROUPING(l_linestatus) AS INT) AS g2,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_dec,
           CAST(CEIL(SUM(CAST(l_quantity AS DECIMAL(18,2)))) AS BIGINT) AS sum_int,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'rollup' AS tag, source AS k1, lang AS k2,
           CAST(GROUPING(source) AS INT) AS g1,
           CAST(GROUPING(lang) AS INT) AS g2,
           CAST(NULL AS DOUBLE) AS sum_dec,
           CAST(SUM(n_chars) AS BIGINT) AS sum_int,
           COUNT(*) AS n
    FROM documents
    GROUP BY ROLLUP(source, lang)
    """,
    doc="Cube: all 2^k grouping combinations (superset of rollup's "
    "hierarchical subtotals) in one pass — partial aggregation handles "
    "all levels map-side — with GROUPING() flags disambiguating real "
    "NULLs from subtotal rows. The grand-total row's sum_int is the "
    "A6/F6 global area sum + ceil (process_city_shapes.py:249-253), "
    "exact via decimal. MERGED (r10, absorbing retired q87): "
    "'rollup'-tagged rows carry the hierarchical corpus stats "
    "(df.rollup over documents — per (source, lang), per source, grand "
    "total, with GROUPING markers): the data-card drill-down table. "
    "Both halves are Catalyst's native multi-level agg — ONE Expand "
    "feeding ONE partial-aggregated exchange, no per-level rescan "
    "(plan-asserted in test_physical_plans); at 100 TB each shuffle is "
    "bounded by distinct keys x levels, never the corpus. Hashed "
    "surfaces: 'cube' rows (lineitem CUBE + exact ceil-sum); 'rollup' "
    "rows (documents ROLLUP + GROUPING markers).",
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cube_rows = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g1"),
            F.grouping("l_linestatus").cast("int").alias("g2"),
            exact_sum("l_quantity").alias("sum_dec"),
            F.ceil(F.sum(F.col("l_quantity").cast("decimal(18,2)")))
            .cast("bigint")
            .alias("sum_int"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.lit("cube").alias("tag"),
            F.col("l_returnflag").alias("k1"),
            F.col("l_linestatus").alias("k2"),
            "g1", "g2", "sum_dec", "sum_int", "n",
        )
    )
    docs = load_table(spark, sf_dir, "documents")
    rollup_rows = (
        docs.rollup("source", "lang")
        .agg(
            F.grouping("source").cast("int").alias("g1"),
            F.grouping("lang").cast("int").alias("g2"),
            F.sum("n_chars").alias("sum_int"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.lit("rollup").alias("tag"),
            F.col("source").alias("k1"),
            F.col("lang").alias("k2"),
            "g1", "g2",
            F.lit(None).cast("double").alias("sum_dec"),
            "sum_int", "n",
        )
    )
    return cube_rows.unionByName(rollup_rows)


# --- exact percentiles -------------------------------------------------------

# q80-absorption params (r10): the deterministic hash-sample quantile
# rows that ride q46 as 'sample'-tagged rows — same workload the
# retired q80 gated (rate=0.2 sample vs rate=1.0 exact median)
_Q46_SAMPLE_RID = "l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR"


def _q46_sample_est() -> str:
    from solarpaneldatawrangler_spark.operators.sampling import (
        hash_sample_quantiles_sql,
    )

    return hash_sample_quantiles_sql(
        "l_extendedprice", _Q46_SAMPLE_RID, "lineitem",
        rate=0.2, ps=(0.5, 0.9), group_cols=["l_returnflag"],
    )


def _q46_sample_exact() -> str:
    from solarpaneldatawrangler_spark.operators.sampling import (
        hash_sample_quantiles_sql,
    )

    return hash_sample_quantiles_sql(
        "l_extendedprice", _Q46_SAMPLE_RID, "lineitem",
        rate=1.0, ps=(0.5,), group_cols=["l_returnflag"],
    )


def _q46_oracle() -> str:
    from solarpaneldatawrangler_spark.functions.rounding import (
        round_ratio_half_away_sql,
    )
    from solarpaneldatawrangler_spark.functions.text import quality_score_sql
    from solarpaneldatawrangler_spark.operators.sampling import es_key_sql
    from solarpaneldatawrangler_spark.plans.extension_queries import (
        _SQL_TOKS,
        _SW_LIST,
    )

    eskey = es_key_sql("GREATEST(n_chars, 1)", "doc_id", seed="es")
    # integer-exact 6dp data-card roundings (r13): mean quality is the
    # rational sum(q*1e6)/(1e6*n) — each q is k/1e6 exactly, and
    # ROUND(q*1e6) recovers k losslessly (double round-trip, k < 2^52);
    # the dup fraction is the plain count ratio
    _mean_q6 = round_ratio_half_away_sql(
        "SUM(CAST(ROUND(d.q * 1000000) AS BIGINT))",
        "1000000 * COUNT(*)", 6, assume_nonneg=True,
    )
    _dup_frac6 = round_ratio_half_away_sql(
        "SUM(CASE WHEN c.nc > 1 THEN 1 ELSE 0 END)",
        "COUNT(*)", 6, assume_nonneg=True,
    )
    return f"""
    WITH wsample AS (
        SELECT CAST(doc_id AS VARCHAR) AS key,
               {eskey} AS median_r,
               CAST(GREATEST(n_chars, 1) AS DOUBLE) AS m3
        FROM documents
        ORDER BY median_r ASC, doc_id ASC
        LIMIT 50
    ),
    dq AS (
        SELECT lang,
               len({_SQL_TOKS}) AS nt,
               {quality_score_sql("text", _SQL_TOKS, _SW_LIST)} AS q,
               md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents
    ),
    fpc AS (SELECT fp, COUNT(*) AS nc FROM dq GROUP BY fp),
    card AS (
        SELECT CASE WHEN GROUPING(d.lang) = 1 THEN '<all>' ELSE d.lang END
                   AS key,
               ROUND(quantile_cont(d.nt, 0.5), 4) AS median_r,
               ROUND(quantile_cont(d.nt, 0.9), 4) AS p90_r,
               CAST(COUNT(*) AS DOUBLE) AS m3,
               {_mean_q6} AS m4,
               {_dup_frac6} AS m5
        FROM dq d JOIN fpc c USING (fp)
        GROUP BY ROLLUP(d.lang)
    )
    SELECT 'price' AS tag, l_returnflag AS key,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median_r,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_r,
           MIN(l_extendedprice) AS m3,
           MAX(l_extendedprice) AS m4,
           CAST(NULL AS DOUBLE) AS m5
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT 'card' AS tag, key, median_r, p90_r, m3, m4, m5 FROM card
    UNION ALL
    SELECT 'sample' AS tag, est.l_returnflag AS key,
           est.q50 AS median_r, est.q90 AS p90_r,
           CAST(est.sample_n AS DOUBLE) AS m3,
           exact.q50 AS m4,
           CAST(NULL AS DOUBLE) AS m5
    FROM ({_q46_sample_est()}) est
    JOIN ({_q46_sample_exact()}) exact USING (l_returnflag)
    UNION ALL
    SELECT 'wsample' AS tag, key, median_r,
           CAST(NULL AS DOUBLE) AS p90_r, m3,
           CAST(NULL AS DOUBLE) AS m4, CAST(NULL AS DOUBLE) AS m5
    FROM wsample
    """


@register(
    "q46_percentiles",
    oracle=_q46_oracle(),
    doc="Exact interpolated percentiles (median/p90) per group — both "
    "engines implement the same p*(n-1) linear interpolation; rounded to "
    "4dp to absorb last-ulp interpolation differences. The approximate "
    "twin at scale is percentile_approx (not oracle-comparable). MERGED "
    "(r7): the corpus DATA CARD (operators/curation.corpus_data_card — "
    "Datasheets-for-Datasets per-stratum stats): 'card'-tagged rows "
    "carry per-lang + '<all>' rollup token percentiles, doc counts, "
    "exact-decimal mean quality, and the corpus-wide exact-duplicate "
    "fraction. Hashed surfaces: price percentiles ('price' rows); data "
    "card ('card' rows — pins tokenization, quality formula, "
    "fingerprint dedup counting, rollup, and every rounding contract). "
    "ALSO MERGED (r10, absorbing retired q80): 'sample'-tagged rows "
    "carry the deterministic hash-sample quantiles per return flag "
    "(operators.sampling.hash_sample_quantiles — membership is "
    "md5_bucket(id) < rate, a scan-side filter identical under reruns "
    "and engines, so the sample percentile_disc is hash-checkable; the "
    "corpus-scale quantile shape: only the rate-bounded sample sorts). "
    "m3 = sample size, m4 = the rate=1.0 exact median riding along to "
    "show sampling error. ALSO MERGED (r10b): 'wsample'-tagged rows "
    "carry an Efraimidis-Spirakis (2006) WEIGHTED sample without "
    "replacement over documents (operators.sampling.weighted_sample, "
    "weight = n_chars, k=50): key = -ln(u)/w with u md5-derived from "
    "(seed, id) — deterministic, engine-replayable (shared es_key_sql "
    "builder), mergeable (bottom-k of a union = bottom-k of per-shard "
    "bottom-k's, the KMV argument), and the selection compiles to "
    "TakeOrderedAndProject(k) — bounded state, no full sort, no RNG.",
)
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.operators.curation import (
        corpus_data_card,
    )
    from solarpaneldatawrangler_spark.operators.sampling import (
        hash_sample_quantiles,
        weighted_sample,
    )

    li = load_table(spark, sf_dir, "lineitem")
    price = li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_r"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_r"),
        F.min("l_extendedprice").alias("m3"),
        F.max("l_extendedprice").alias("m4"),
    ).select(
        F.lit("price").alias("tag"),
        F.col("l_returnflag").alias("key"),
        "median_r",
        "p90_r",
        "m3",
        "m4",
        F.lit(None).cast("double").alias("m5"),
    )
    card = corpus_data_card(
        load_table(spark, sf_dir, "documents"), stratum_col="lang"
    ).select(
        F.lit("card").alias("tag"),
        "key",
        F.col("median_tokens_r").alias("median_r"),
        F.col("p90_tokens_r").alias("p90_r"),
        F.col("n_docs").alias("m3"),
        F.col("mean_quality_r").alias("m4"),
        F.col("dup_frac_r").alias("m5"),
    )
    rid = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit("-"),
        F.col("l_linenumber").cast("string"),
    )
    est = hash_sample_quantiles(
        li, "l_extendedprice", rid, rate=0.2, ps=(0.5, 0.9),
        group_cols=["l_returnflag"],
    )
    exact = hash_sample_quantiles(
        li, "l_extendedprice", rid, rate=1.0, ps=(0.5,),
        group_cols=["l_returnflag"],
    ).select("l_returnflag", F.col("q50").alias("exact_q50"))
    sample = est.join(exact, "l_returnflag").select(
        F.lit("sample").alias("tag"),
        F.col("l_returnflag").alias("key"),
        F.col("q50").alias("median_r"),
        F.col("q90").alias("p90_r"),
        F.col("sample_n").cast("double").alias("m3"),
        F.col("exact_q50").alias("m4"),
        F.lit(None).cast("double").alias("m5"),
    )
    docs = load_table(spark, sf_dir, "documents")
    wsample = weighted_sample(
        docs.select(
            "doc_id",
            F.greatest(F.col("n_chars"), F.lit(1)).alias("_w"),
        ),
        F.col("_w"),
        k=50,
        seed="es",
    ).select(
        F.lit("wsample").alias("tag"),
        F.col("doc_id").cast("string").alias("key"),
        F.col("es_key_r").alias("median_r"),
        F.lit(None).cast("double").alias("p90_r"),
        F.col("_w").cast("double").alias("m3"),
        F.lit(None).cast("double").alias("m4"),
        F.lit(None).cast("double").alias("m5"),
    )
    return (
        price.unionByName(card).unionByName(sample).unionByName(wsample)
    )


# --- U3/S13: ON-CONFLICT-IGNORE upsert (solardb.py:83-97) -------------------

@register(
    "q26_upsert",
    oracle="""
    WITH existing AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE o_orderkey % 3 = 0
    ),
    incoming AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice
        FROM orders WHERE o_orderkey % 2 = 0
    ),
    merged AS (
        SELECT * FROM existing
        UNION ALL
        SELECT * FROM incoming i
        WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.o_orderkey = i.o_orderkey)
    )
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM merged GROUP BY o_orderstatus
    """,
    doc="U3/S13 ON-CONFLICT-IGNORE upsert (solardb.py:83-97): existing rows "
    "win on key conflict (the doubled incoming price must NOT appear for "
    "overlapping keys); left_anti + unionByName, then an aggregate over "
    "the merged table proves which version survived.",
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    existing = orders.filter(F.col("o_orderkey") % 3 == 0)
    incoming = orders.filter(F.col("o_orderkey") % 2 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    merged = upsert_by_key(existing, incoming, ["o_orderkey"])
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), exact_sum("o_totalprice").alias("total")
    )


# --- J8: grid-neighbor self-join (imagery.py:196-209) -----------------------

@register(
    "q27_neighbor_edges",
    oracle="""
    WITH cells AS (
        SELECT DISTINCT user_id % 200 AS c, event_id % 200 AS r FROM events
    ),
    nodes AS (SELECT c * 4294967296 + r AS id, c, r FROM cells),
    half AS (
        SELECT a.id AS src, b.id AS dst
        FROM nodes a JOIN nodes b ON b.c = a.c + 1 AND b.r = a.r
        UNION ALL
        SELECT a.id AS src, b.id AS dst
        FROM nodes a JOIN nodes b ON b.c = a.c AND b.r = a.r + 1
    )
    SELECT src, dst FROM half
    UNION ALL
    SELECT dst AS src, src AS dst FROM half
    """,
    doc="J8 grid-neighbor self-join (the 3x3 stitch neighborhood lookup, "
    "imagery.py:196-209; also the CC edge builder): equi-join on shifted "
    "keys, E/S generated then symmetrized to halve join work.",
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cells = ev.select(
        (F.col("user_id") % 200).alias("column"), (F.col("event_id") % 200).alias("row")
    ).distinct()
    return neighbor_edges(cells)


# --- A4: group collect (maproulette.py:39-40) -------------------------------

@register(
    "q28_group_collect",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderkey)), ',') AS orderkeys,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_custkey
    """,
    doc="A4 group-collect (the defaultdict(list) tile grouping, "
    "maproulette.py:39-40): collect_list sorted for deterministic "
    "comparison. At scale prefer streaming aggregates over collecting "
    "payloads — collect only bounded groups (clusters are small).",
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # serialized as a string: array-typed result columns compare
    # ambiguously across engines (numpy vs list renderings)
    keys = F.concat_ws(
        ",",
        F.transform(
            F.sort_array(F.collect_list("o_orderkey")), lambda x: x.cast("string")
        ),
    )
    return orders.groupBy("o_custkey").agg(
        keys.alias("orderkeys"), F.count(F.lit(1)).alias("n")
    )


# --- §2.10: Structured Streaming windowed aggregation -----------------------

@register(
    "q70_streaming_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="A REAL Structured Streaming job (readStream over the events "
    "parquet, watermarked 1-hour tumbling window, complete-mode memory "
    "sink, availableNow semantics via processAllAvailable) whose result "
    "is SQL-oracle-checked — the §2.10 batch/stream unification: same "
    "aggregation, same answer, late-data handling for free.",
)
def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.sources.star import ensure_session_confs

    ensure_session_confs(spark)  # UTC: window starts convert via session TZ
    # readStream needs an explicit schema; sniff it from a batch read of
    # the SAME file so the stream tracks whatever the generator wrote —
    # ts has shipped as both TIMESTAMP(NANOS) (a long under nanosAsLong)
    # and timestamp_ntz across testdata generations. Hardcoding LongType
    # here silently mis-decoded the ntz generation into 1970 windows.
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # shared schema-drift chokepoint: converts the known ts generations
    # (nanos-as-bigint / timestamp_ntz / timestamp) and RAISES on any
    # new one instead of mis-decoding into 1970 windows (the r4 bug)
    from solarpaneldatawrangler_spark.sources.star import normalize_event_ts

    stream = normalize_event_ts(stream)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )
    name = "q70_out"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name).select(
        F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
    )
