"""Physical-plan shape assertions: the optimizations DESIGN.md claims
must actually appear in the executed plans — top-k as
TakeOrderedAndProject, dimension joins as broadcast, parquet pushdown,
and no cartesian products in the LSH self-join."""

from __future__ import annotations

from solarpaneldatawrangler_spark.plans import CATALOG


def _plan(spark, sf_dir, name) -> str:
    df = CATALOG[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_topk_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q01_priority_scan")
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q02_filter_project")
    assert "PushedFilters: [" in plan
    assert "o_orderstatus" in plan.split("PushedFilters")[1][:200]


def test_projection_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q02_filter_project")
    read_schema = plan.split("ReadSchema:")[1][:200]
    assert "o_orderdate" not in read_schema  # unused column pruned from scan


def test_dimension_join_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q06_broadcast_join_agg")
    assert "BroadcastHashJoin" in plan


def test_minhash_join_not_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q55_minhash_neardup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_spatial_join_not_nested_loop(spark, sf_dir):
    # q39 takes the grid-bucketed route: hash equi-join on cell keys,
    # never a broadcast of the growing points side or a nested loop
    plan = _plan(spark, sf_dir, "q39_spatial_anti")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_embedding_neardup_not_nested_loop(spark, sf_dir):
    # q63's LSH-bucketed pair generation is an equi-join on (table, sig)
    plan = _plan(spark, sf_dir, "q63_embedding_neardup")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q10_group_minmax")
    # two HashAggregate nodes (partial + final) around the exchange
    assert plan.count("HashAggregate") >= 2


# queries whose plans INTENTIONALLY contain a BroadcastNestedLoopJoin:
# the size-aware spatial join broadcasts a genuinely small points/polys
# side (the R-tree-probe analog); test_auto_strategy_routes_by_size
# proves the same entry point switches to the bucketed hash equi-join
# when the estimated size crosses the threshold. q51's BNL is the
# 1-row corpus-stats broadcast of bm25_scores (ranking.py) — a
# keyless join of a single aggregate row, i.e. free by construction.
# q53's BNL is the same 1-row idiom: bigram_lm_score's vocab-size
# aggregate (curation.py) crossJoin-broadcasts a single row. q52's BNL
# (r7) is tfidf_keywords' 1-row corpus-size aggregate (ranking.py).
_BNL_ALLOWED = {
    "q38_spatial_contains",
    "q41_multipolygon",
    "q51_token_stats",
    "q52_quality_score",
    "q53_lang_id",
    # q13 (r10 sketch panel, absorbing q79/q83): the KMV estimate,
    # exact-distinct, and jaccard counts/estimates are all single
    # aggregate rows crossJoin-broadcast onto k-bounded sketches —
    # the same keyless 1-row idiom
    "q13_distinct_round",
}


def test_no_catalog_query_plans_a_cross_product(spark, sf_dir):
    """Catalog-wide sweep: no entry may compile to CartesianProduct, and
    only the documented small-side spatial joins may compile to
    BroadcastNestedLoopJoin. Guards every future catalog addition
    against the array-join-key / theta-join demotion traps."""
    from solarpaneldatawrangler_spark.plans import CATALOG

    offenders = {}
    for name, spec in sorted(CATALOG.items()):
        plan = _plan(spark, sf_dir, name)
        flags = [
            m
            for m in ("CartesianProduct", "BroadcastNestedLoopJoin")
            if m in plan
        ]
        if "BroadcastNestedLoopJoin" in flags and name in _BNL_ALLOWED:
            flags.remove("BroadcastNestedLoopJoin")
        if flags:
            offenders[name] = flags
    assert not offenders, offenders


def test_filter_queries_push_predicates_to_scan(spark, sf_dir):
    """Every filter-bearing scan query must land its predicates in the
    parquet scan's PushedFilters (the column the filter names appears
    there), not as a post-scan Filter only."""
    expectations = {
        "q01_priority_scan": "l_quantity",
        "q04_threshold_filter": "event_type",
        "q07_semi_join": "o_totalprice",
        "q65_asof_join": "event_type",
    }
    for name, col in expectations.items():
        plan = _plan(spark, sf_dir, name)
        pushed = "".join(
            seg[:300] for seg in plan.split("PushedFilters: [")[1:]
        )
        assert col in pushed, f"{name}: {col} not pushed; got {pushed[:200]!r}"


def test_bench_headline_names_exist_in_catalog():
    """bench.py's HEADLINE list must reference real catalog entries —
    a rename that orphans one would silently shrink the round-over-round
    comparable total."""
    import bench
    from solarpaneldatawrangler_spark.plans import CATALOG

    missing = [n for n in bench.HEADLINE if n not in CATALOG]
    assert not missing, missing


def test_decontaminate_plan_broadcasts_benchmark(spark, sf_dir):
    """The benchmark fingerprint side must BROADCAST (adds no corpus
    shuffle) and nothing may demote to a cross product; the corpus-side
    aggregation must partial-aggregate before its exchange."""
    from pyspark.sql import functions as F

    from solarpaneldatawrangler_spark.operators.decontaminate import (
        contamination_scores,
    )
    from solarpaneldatawrangler_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("bid"), "text"
    )
    plan = (
        contamination_scores(docs, bench)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pack_sequences_single_exchange_no_text(spark, sf_dir):
    """Packing's one shuffle moves (id, n_tokens, shard) only: exactly
    one Exchange in the plan, and the text column must not survive past
    the scan-side projection into the exchange."""
    from solarpaneldatawrangler_spark.operators.packing import pack_sequences
    from solarpaneldatawrangler_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = (
        pack_sequences(docs, max_tokens=2048, n_shards=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    post_exchange = plan.split("Exchange")[0]  # nodes ABOVE the exchange
    assert "text" not in post_exchange, post_exchange


def test_corpus_diff_hash_joins_fingerprints_no_text_in_exchange(
    spark, sf_dir
):
    """q81's diff must be a fingerprint-keyed HASH join (SMJ or
    shuffled-hash — never a nested-loop/cartesian), with partial
    aggregation below each side's Exchange and no raw text surviving
    past the scan projection into any exchange."""
    from pyspark.sql import functions as F

    from solarpaneldatawrangler_spark.operators.dedup import corpus_diff
    from solarpaneldatawrangler_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents")
    d = corpus_diff(
        docs.filter(F.col("doc_id") % 3 != 0),
        docs.filter(F.col("doc_id") % 4 != 0),
        group_cols=["source"],
    )
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "FullOuter" in plan or "full_outer" in plan.lower(), plan
    # text is hashed in the scan stage; only the 32-char fingerprint
    # crosses any wire
    first_exchange_and_above = plan.split("Exchange")[0]
    assert "text#" not in first_exchange_and_above, plan
    # partial agg per side (min over strings plans as SortAggregate)
    assert "partial_min" in plan, plan


def test_kmv_and_quantile_plans_stay_bounded(spark, sf_dir):
    """q79: TakeOrderedAndProject (bounded k), no global Sort of the
    hash column. q80: the sample filter must sit in the scan stage
    (PushedFilters can't take md5, but the Filter must appear below
    the window sort), and no cartesian anywhere."""
    from solarpaneldatawrangler_spark.plans import CATALOG

    from solarpaneldatawrangler_spark.plans.extension_queries2 import (
        kmv_distinct_workload,
    )

    sk = kmv_distinct_workload(spark, sf_dir)
    plan79 = sk._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan79, plan79
    assert "CartesianProduct" not in plan79, plan79

    from solarpaneldatawrangler_spark.plans.extension_queries2 import (
        sample_quantiles_workload,
    )

    qt = sample_quantiles_workload(spark, sf_dir)
    plan80 = qt._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan80, plan80
    assert "BroadcastNestedLoopJoin" not in plan80, plan80
    # the md5-bucket membership filter evaluates before any Exchange:
    # the plan string prints root-first, so the subtree BELOW the first
    # Exchange is everything after its first occurrence — the sample
    # filter (an md5 conjunct) must sit there, in the scan stage,
    # not above the window sort.
    below_first_exchange = plan80.split("Exchange", 1)[-1]
    assert "Filter" in below_first_exchange, plan80
    assert "md5" in below_first_exchange, plan80


def test_rollup_is_single_pass(spark, sf_dir):
    """q24 (which absorbed q87's documents ROLLUP in r10): each
    grouping-sets half — the lineitem CUBE and the documents ROLLUP —
    computes all its levels from ONE Expand feeding ONE partial-
    aggregated exchange; the only Union is the two-half tag union,
    never a per-level rescan."""
    from solarpaneldatawrangler_spark.plans import CATALOG

    df = CATALOG["q24_rollup"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") == 2, plan
    assert plan.count("Exchange") == 2, plan
    assert plan.count("Union") == 1, plan


def test_r10_scan_side_surfaces_add_no_exchange(spark, sf_dir):
    """The r10 ride-along surfaces claim to be PURE scan-side
    expressions — split_assign (hash-line carve), canonical_url
    (string pipeline) — so adding
    them to a base projection must introduce ZERO new Exchange: at
    100 TB a merge that silently added a shuffle would dominate the
    query it rides. balanced_shards under a precomputed rank_col is
    likewise map-only (pure arithmetic on the rank)."""
    from pyspark.sql import functions as F

    from solarpaneldatawrangler_spark.operators.curation import canonical_url
    from solarpaneldatawrangler_spark.operators.packing import balanced_shards
    from solarpaneldatawrangler_spark.operators.sampling import split_assign
    from solarpaneldatawrangler_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents")

    def n_exchanges(df) -> int:
        return df._jdf.queryExecution().executedPlan().toString().count(
            "Exchange"
        )

    base = docs.select("doc_id", "source")
    assert n_exchanges(base) == 0
    enriched = docs.select(
        "doc_id",
        "source",
        split_assign(
            F.col("doc_id"), {"train": 0.9, "valid": 0.05, "test": 0.05}
        ).alias("split"),
        canonical_url(
            F.concat(F.lit("https://Ex.com/p/"), F.col("doc_id"))
        ).alias("canon"),
    )
    assert n_exchanges(enriched) == 0  # ride-alongs are free

    ranked = docs.select(
        "doc_id", F.col("n_chars").cast("long").alias("w")
    ).withColumn("rnk", F.lit(0) + F.col("doc_id"))
    sharded = balanced_shards(ranked, 8, weight_col="w", rank_col="rnk")
    assert n_exchanges(sharded) == n_exchanges(ranked)  # map-only deal
