"""Mergeable sketches (operators/sketches.py): HLL accuracy against
known cardinalities, lossless mergeability (register-wise max), CMS's
never-underestimate guarantee, and the bounded-shuffle plan shape the
whole family exists for. Cross-engine value parity is covered by the
q76/q77 oracle rows in test_oracle_queries; these tests pin the
sketch-theoretic properties the oracle can't express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.operators.sketches import (
    HLL_M,
    cms_estimate,
    cms_sketch,
    hll_estimate,
    hll_merge,
    hll_sketch,
)


def _ints_as_items(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.concat(F.lit("item-"), F.col("id")).alias("item")
    )


@pytest.mark.parametrize("n", [100, 5_000, 50_000])
def test_hll_estimate_within_standard_error(spark, n):
    """Relative error ~1.04/sqrt(4096) = 1.6%; assert a generous 3x
    band (the md5 stream is fixed, so this is a deterministic check,
    not a flaky probabilistic one)."""
    df = _ints_as_items(spark, 0, n)
    est = hll_estimate(hll_sketch(df, F.col("item"))).collect()[0]
    assert abs(est["hll_est_r"] - n) / n < 0.05, (n, est["hll_est_r"])


def test_hll_duplicates_do_not_move_the_estimate(spark):
    """Cardinality, not count: replicating every item 13x leaves the
    registers (max is idempotent) and the estimate identical."""
    once = _ints_as_items(spark, 0, 2_000)
    many = once.crossJoin(spark.range(13)).select("item")
    e1 = hll_estimate(hll_sketch(once, F.col("item"))).collect()[0]
    e2 = hll_estimate(hll_sketch(many, F.col("item"))).collect()[0]
    assert e1["hll_est_r"] == e2["hll_est_r"]
    assert e1["hll_zeros"] == e2["hll_zeros"]


def test_hll_merge_is_lossless(spark):
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)) REGISTER-FOR-
    REGISTER — the property that lets shards/days roll up without
    re-reading data. Overlapping halves on purpose: idempotence is
    part of the claim."""
    a = _ints_as_items(spark, 0, 6_000)
    b = _ints_as_items(spark, 4_000, 10_000)
    both = _ints_as_items(spark, 0, 10_000)
    merged = hll_merge(
        hll_sketch(a, F.col("item")), hll_sketch(b, F.col("item"))
    )
    direct = hll_sketch(both, F.col("item"))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_hll_grouped_registers_bounded_by_m(spark):
    df = spark.range(0, 30_000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.concat(F.lit("x"), F.col("id")).alias("item"),
    )
    sk = hll_sketch(df, F.col("item"), ["g"])
    per = {r["g"]: r["n"] for r in sk.groupBy("g").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(per) == {"0", "1", "2"}
    assert all(n <= HLL_M for n in per.values())


def test_cms_never_underestimates_and_bounds_error(spark):
    """est >= exact for every token (min over rows can only add
    collisions), and est - exact <= total_occurrences (trivial cap) —
    with d=4, w=1024 over a 20k-occurrence stream the overestimate
    should in fact be tiny; assert a conservative 2% of N."""
    occ = spark.range(0, 20_000).select(
        F.concat(F.lit("t"), (F.col("id") % 500)).alias("tok")
    )
    sketch = cms_sketch(occ, F.col("tok"))
    exact = occ.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n"))
    est = cms_estimate(sketch, exact, "tok").collect()
    assert len(est) == 500
    for r in est:
        assert r["cms_n"] >= r["exact_n"], r
        assert r["cms_n"] - r["exact_n"] <= 0.02 * 20_000, r


def test_cms_unseen_item_estimates_from_collisions_only(spark):
    occ = spark.range(0, 1_000).select(
        F.concat(F.lit("seen"), F.col("id")).alias("tok")
    )
    sketch = cms_sketch(occ, F.col("tok"))
    probe = spark.createDataFrame(
        [("never-in-corpus-xyzzy",)], "tok string"
    )
    got = cms_estimate(sketch, probe, "tok").collect()[0]
    # not a guarantee of zero (collisions), but with 1000 occurrences
    # over 1024 columns the min over 4 rows must be tiny
    assert 0 <= got["cms_n"] <= 10


def test_sketch_shuffles_are_bounded(spark):
    """The family's reason to exist: the ONLY Exchange in a sketch
    build carries the (bounded) sketch key space, not the corpus.
    cms_sketch: exactly one Exchange (hash on i,col <= 4096 keys) with
    the explode fused into the scan-side stage; hll_sketch: one
    Exchange on (bucket); estimates add one more bounded regroup."""
    df = _ints_as_items(spark, 0, 10_000)
    cms_plan = cms_sketch(df, F.col("item"))._jdf.queryExecution(
    ).executedPlan().toString()
    assert cms_plan.count("Exchange") == 1, cms_plan
    hll_plan = hll_estimate(hll_sketch(df, F.col("item")))._jdf.queryExecution(
    ).executedPlan().toString()
    assert hll_plan.count("Exchange") <= 2, hll_plan
    # partial aggregation present: a map-side fold precedes the shuffle
    assert "partial_count" in cms_plan or "HashAggregate" in cms_plan


def test_streaming_registers_equal_batch_registers(spark, tmp_path):
    """streaming_register_sketch over a file stream produces BIT-
    IDENTICAL registers to the batch sketch over the same events (max
    is order-insensitive, so micro-batch boundaries cannot show
    through) — estimate-on-read is then the already-tested batch
    hll_estimate. Complete-mode memory sink so the final open window
    is visible to the assertion."""
    import datetime as dt

    from solarpaneldatawrangler_spark.streaming.incremental import (
        streaming_register_sketch,
    )

    src = tmp_path / "events"
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        (i, base + dt.timedelta(minutes=7 * i), f"user-{i % 800}")
        for i in range(2_000)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, uid string")
    df.write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (
        streaming_register_sketch(
            stream, F.col("uid"), ts_col="ts", window="1 hour"
        )
        .writeStream.format("memory")
        .queryName("t_stream_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM t_stream_regs").collect())
    )

    from solarpaneldatawrangler_spark.operators.sketches import hll_bucket_rho

    bucket, rho = hll_bucket_rho(F.col("uid"))
    want = sorted(
        map(
            tuple,
            spark.read.parquet(str(src))
            .select(F.col("ts"), bucket.alias("bucket"), rho.alias("rho"))
            .groupBy(F.window("ts", "1 hour").alias("w"), "bucket")
            .agg(F.max("rho").alias("rho"))
            .select(F.col("w.start").alias("window_start"), "bucket", "rho")
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_bloom_no_false_negatives_and_low_fpr(spark):
    """Every member answers maybe_seen=true (the absence guarantee the
    admission fast-path rests on); non-members answer true at roughly
    the theoretical FPR ((1-e^(-kn/m))^k ≈ 1.6% at n=5000, m=2^16,
    k=6) — assert a 3x band. Deterministic: the md5 stream is fixed."""
    from solarpaneldatawrangler_spark.operators.sketches import (
        bloom_build,
        bloom_maybe_contains,
    )

    members = _ints_as_items(spark, 0, 5_000)
    others = spark.range(100_000, 110_000).select(
        F.concat(F.lit("item-"), F.col("id")).alias("item")
    )
    bloom = bloom_build(members, F.col("item"))
    m_hit = bloom_maybe_contains(bloom, members, "item")
    assert m_hit.filter(~F.col("maybe_seen")).count() == 0
    o_hit = bloom_maybe_contains(bloom, others, "item")
    fpr = o_hit.filter(F.col("maybe_seen")).count() / 10_000
    assert fpr < 0.05, fpr


def test_bloom_xxhash64_serve_path(spark):
    """The xxhash64 hash family (the codegen serve path, no SQL
    replay): same absence guarantee and FPR band as md5, NULL items
    still get a real verdict, and a family mismatch between build and
    probe is demonstrably unsafe (false negatives appear) — pinning
    WHY the contract says they must match."""
    from solarpaneldatawrangler_spark.operators.sketches import (
        bloom_build,
        bloom_maybe_contains,
    )

    members = _ints_as_items(spark, 0, 5_000).unionByName(
        spark.sql("SELECT CAST(NULL AS STRING) AS item")
    )
    others = spark.range(100_000, 110_000).select(
        F.concat(F.lit("item-"), F.col("id")).alias("item")
    )
    bloom = bloom_build(members, F.col("item"), hash_family="xxhash64")
    m_hit = bloom_maybe_contains(
        bloom, members, "item", hash_family="xxhash64"
    )
    assert m_hit.filter(~F.col("maybe_seen")).count() == 0
    o_hit = bloom_maybe_contains(
        bloom, others, "item", hash_family="xxhash64"
    )
    fpr = o_hit.filter(F.col("maybe_seen")).count() / 10_000
    assert fpr < 0.05, fpr

    mismatched = bloom_maybe_contains(bloom, members, "item")  # md5 probe
    assert mismatched.filter(~F.col("maybe_seen")).count() > 0

    with pytest.raises(ValueError, match="hash_family"):
        bloom_build(members, F.col("item"), hash_family="sha1")


def test_bloom_merge_equals_direct_build(spark):
    from solarpaneldatawrangler_spark.operators.sketches import (
        bloom_build,
        bloom_merge,
    )

    a = _ints_as_items(spark, 0, 3_000)
    b = _ints_as_items(spark, 2_000, 6_000)
    both = _ints_as_items(spark, 0, 6_000)
    merged = bloom_merge(
        bloom_build(a, F.col("item")), bloom_build(b, F.col("item"))
    )
    direct = bloom_build(both, F.col("item"))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_bloom_prescreen_composes_with_store_admission(spark, tmp_path):
    """The admission fast-path: bloom built from the corpus texts
    prescreens a batch — maybe_seen=false rows are DEFINITELY new
    (admitted without touching the store), only maybe_seen=true rows
    pay the fingerprint-store probe. The composed admit set must equal
    plain incremental_new_docs over the whole batch, and the probed
    subset must be smaller than the batch (the saving being bought)."""
    from solarpaneldatawrangler_spark.operators.dedup import (
        incremental_new_docs,
        write_fingerprint_store,
    )
    from solarpaneldatawrangler_spark.operators.sketches import (
        bloom_build,
        bloom_maybe_contains,
    )

    corpus = spark.createDataFrame(
        [(i, f"corpus doc {i}") for i in range(500)],
        "doc_id long, text string",
    )
    store = str(tmp_path / "fp_store")
    write_fingerprint_store(corpus, store)
    bloom = bloom_build(corpus, F.coalesce(F.col("text"), F.lit("")))

    batch = spark.createDataFrame(
        [(1000 + i, f"corpus doc {i}") for i in range(0, 100)]  # dups
        + [(2000 + i, f"fresh doc {i}") for i in range(400)],   # new
        "doc_id long, text string",
    )
    screened = bloom_maybe_contains(
        bloom,
        batch.withColumn("item", F.coalesce(F.col("text"), F.lit(""))),
        "item",
    )
    fast_new = screened.filter(~F.col("maybe_seen")).drop(
        "item", "maybe_seen"
    )
    to_probe = screened.filter(F.col("maybe_seen")).drop(
        "item", "maybe_seen"
    )
    probed_new = incremental_new_docs(to_probe, store)
    composed = sorted(
        r.doc_id
        for r in fast_new.unionByName(probed_new).collect()
    )
    plain = sorted(
        r.doc_id for r in incremental_new_docs(batch, store).collect()
    )
    assert composed == plain == sorted(
        [2000 + i for i in range(400)]
    )
    # the saving: the store probe saw only the maybe-seen sliver
    n_probe = to_probe.count()
    assert 100 <= n_probe < 150, n_probe  # 100 dups + few false positives


def test_bloom_probe_is_scan_side(spark):
    """The probe evaluates a CONSTANT-size filter, so it must cost the
    query side nothing but a scan expression: bitmap collected to a
    plan literal (bounded m/32 longs, the IVF-centroid idiom), k bit
    tests ANDed — zero Exchange, zero Join in the probe plan."""
    from solarpaneldatawrangler_spark.operators.sketches import (
        bloom_build,
        bloom_maybe_contains,
    )

    members = _ints_as_items(spark, 0, 2_000)
    probe = bloom_maybe_contains(
        bloom_build(members, F.col("item")), members, "item"
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_bloom_binary_literal_path_matches_array_path(spark):
    """The large-m probe encoding (one BINARY literal, byte-addressed
    via conv(hex(substring(...)))) must answer bit-identically to the
    small-m ARRAY<BIGINT> encoding on the same filter — including the
    no-false-negative guarantee — and stay scan-side (zero Exchange,
    zero Join). Forced via impl= so the parity check doesn't depend on
    the auto threshold."""
    from solarpaneldatawrangler_spark.operators.sketches import (
        bloom_build,
        bloom_maybe_contains,
    )

    members = _ints_as_items(spark, 0, 3_000)
    mixed = spark.range(0, 8_000, 1, 4).select(
        F.concat(F.lit("item-"), F.col("id")).alias("item")
    )
    bloom = bloom_build(members, F.col("item"))
    got = {}
    for impl in ("array", "binary"):
        df = bloom_maybe_contains(bloom, mixed, "item", impl=impl)
        got[impl] = sorted(map(tuple, df.collect()))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, (impl, plan)
        assert "Join" not in plan, (impl, plan)
    assert got["array"] == got["binary"]
    # members (first 3000 ids) all answer true in both
    seen = dict(got["binary"])
    assert all(seen[f"item-{i}"] for i in range(3_000))


def test_kmv_merge_equals_direct_and_estimate_band(spark):
    """KMV is an order-free set minimum: the merge of two disjoint
    halves must be ROW-IDENTICAL to the direct build, and the
    estimator lands within the published ~2/sqrt(k) relative-error
    band of the true distinct count (deterministic: fixed md5
    stream)."""
    from solarpaneldatawrangler_spark.operators.sketches import (
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )

    a = _ints_as_items(spark, 0, 4_000)
    b = _ints_as_items(spark, 4_000, 10_000)
    both = _ints_as_items(spark, 0, 10_000)
    merged = kmv_merge(
        kmv_sketch(a, F.col("item")), kmv_sketch(b, F.col("item"))
    )
    direct = kmv_sketch(both, F.col("item"))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    est = kmv_estimate(direct).collect()[0]
    assert est["kmv_n"] == 256
    rel = abs(est["kmv_est_r"] - 10_000) / 10_000
    assert rel < 2 / (256 ** 0.5), est  # ~12.5%


def test_kmv_small_set_is_exact_and_duplicate_invariant(spark):
    """Below k distinct items the sketch IS the distinct set: the
    estimate equals the exact count, and duplicating every row
    changes nothing (set semantics)."""
    from solarpaneldatawrangler_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    once = _ints_as_items(spark, 0, 100)
    thrice = once.unionByName(once).unionByName(once)
    sk1 = kmv_sketch(once, F.col("item"))
    sk3 = kmv_sketch(thrice, F.col("item"))
    assert sorted(map(tuple, sk1.collect())) == sorted(
        map(tuple, sk3.collect())
    )
    est = kmv_estimate(sk1).collect()[0]
    assert est["kmv_n"] == 100 and est["kmv_est_r"] == 100.0


def test_kmv_sketch_plan_is_bounded(spark):
    """The sketch must compile to TakeOrderedAndProject (per-partition
    top-k then one bounded reduce) over a partial-aggregated distinct
    — never a global sort of the hash column."""
    from solarpaneldatawrangler_spark.operators.sketches import (
        kmv_sketch,
    )

    sk = kmv_sketch(_ints_as_items(spark, 0, 10_000), F.col("item"))
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_bloom_null_items_get_real_verdicts_both_engines(spark):
    """A NULL item must hash as '' on BOTH sides (build and probe) so
    maybe_seen is always a real boolean: without the normalization,
    md5(NULL) nulls every bit test and the admission composition
    (~maybe_seen fast-admit | maybe_seen store-probe) silently drops
    NULL-text rows from both branches. Cross-engine: the DuckDB
    builders replay the same normalization."""
    import duckdb

    from solarpaneldatawrangler_spark.operators.sketches import (
        bloom_build,
        bloom_maybe_contains,
        bloom_probe_sql,
        bloom_sql,
    )

    members = spark.createDataFrame(
        [("alpha",), (None,), ("beta",)], "item string"
    )
    queries = spark.createDataFrame(
        [("alpha",), (None,), ("",), ("other",)], "item string"
    )
    probed = bloom_maybe_contains(
        bloom_build(members, F.col("item")), queries, "item"
    )
    rows = {r["item"]: r["maybe_seen"] for r in probed.collect()}
    assert all(v is not None for v in rows.values()), rows
    assert rows["alpha"] is True
    assert rows[None] is True     # NULL normalized to '' — a member
    assert rows[""] is True       # same key as the NULL member

    con = duckdb.connect()
    build = bloom_sql("x", "(VALUES ('alpha'), (NULL), ('beta')) t(x)")
    probe = bloom_probe_sql(
        "x", "(VALUES ('alpha'), (NULL), (''), ('other')) q(x)", "bloom"
    )
    got = dict(
        con.execute(f"WITH bloom AS ({build}) {probe}").fetchall()
    )
    # the SQL emits the NORMALIZED item, so NULL and '' collapse to ''
    assert got["alpha"] is True and got[""] is True
    assert got["other"] == rows["other"]


def test_q52_threshold_oracle_excludes_null_text_like_spark_does():
    """dsir_select_threshold drops NULL-text docs (null weight never
    passes >= t); the merged q52 oracle's dsir_thr_kept must carry
    the matching text IS NOT NULL — COALESCE alone would keep them
    at weight 0.0 and diverge on any corpus containing one
    (review-caught; surface moved from retired q73 in r10)."""
    from solarpaneldatawrangler_spark.plans import CATALOG

    oracle = CATALOG["q52_quality_score"].oracle
    if oracle is None:
        import pytest

        pytest.skip("q52 oracle demoted (testdata absent)")
    assert "text IS NOT NULL" in oracle


def test_kmv_jaccard_exact_in_small_set_regime(spark):
    """Union below k: the merged sketch IS the distinct union, so
    overlap_n / union_n is the exact Jaccard and both estimates
    collapse to the exact cardinalities."""
    from solarpaneldatawrangler_spark.operators.sketches import (
        kmv_jaccard,
        kmv_sketch,
    )

    a_items = _ints_as_items(spark, 0, 60)       # {0..59}
    b_items = _ints_as_items(spark, 40, 100)     # {40..99}, overlap 20
    sk = kmv_jaccard(
        kmv_sketch(a_items, F.col("item")),
        kmv_sketch(b_items, F.col("item")),
    ).collect()[0]
    assert sk.union_n == 100 and sk.overlap_n == 20
    assert sk.jaccard_r == 0.2
    assert sk.union_est_r == 100.0 and sk.inter_est_r == 20.0


def test_kmv_jaccard_from_shard_merged_sketches(spark):
    """The deployment shape: each side's sketch is itself a merge of
    per-shard sketches. kmv_merge is lossless, so the jaccard row is
    IDENTICAL to one built from monolithic scans."""
    from solarpaneldatawrangler_spark.operators.sketches import (
        kmv_jaccard,
        kmv_merge,
        kmv_sketch,
    )

    a_all = _ints_as_items(spark, 0, 3_000)
    b_all = _ints_as_items(spark, 1_500, 4_500)
    direct = kmv_jaccard(
        kmv_sketch(a_all, F.col("item")), kmv_sketch(b_all, F.col("item"))
    ).collect()[0]
    a_sharded = kmv_merge(
        kmv_sketch(_ints_as_items(spark, 0, 1_000), F.col("item")),
        kmv_merge(
            kmv_sketch(_ints_as_items(spark, 1_000, 2_000), F.col("item")),
            kmv_sketch(_ints_as_items(spark, 2_000, 3_000), F.col("item")),
        ),
    )
    b_sharded = kmv_merge(
        kmv_sketch(_ints_as_items(spark, 1_500, 2_500), F.col("item")),
        kmv_sketch(_ints_as_items(spark, 2_500, 4_500), F.col("item")),
    )
    sharded = kmv_jaccard(a_sharded, b_sharded).collect()[0]
    assert sharded == direct
    # full-sketch regime sanity: estimates land near the true values
    true_j = 1_500 / 4_500
    assert abs(sharded.jaccard_r - true_j) < 0.12
    assert abs(sharded.union_est_r - 4_500) / 4_500 < 0.2


def test_null_items_hash_as_empty_string_in_every_sketch(spark):
    """NULL-item normalization (r9 ADVICE): HLL/CMS/KMV treat a NULL
    item exactly like '' — the Bloom _bloom_item rule — in BOTH the
    Spark builders and the SQL replays. Before the fix a NULL item
    produced a (bucket=NULL, rho=NULL) HLL register that COUNT saw but
    SUM skipped (estimate inflation), a NULL CMS column, and an
    ambiguous NULL sort key in KMV."""
    import duckdb

    from solarpaneldatawrangler_spark.operators.sketches import (
        cms_sql,
        hll_sql,
        kmv_estimate,
        kmv_sketch,
        kmv_sql,
    )

    with_null = spark.createDataFrame(
        [(f"w{i}",) for i in range(50)] + [(None,)], "item string"
    )
    with_empty = spark.createDataFrame(
        [(f"w{i}",) for i in range(50)] + [("",)], "item string"
    )
    # Spark side: NULL and '' land identically
    for df_pair in [
        (hll_sketch(with_null, F.col("item")),
         hll_sketch(with_empty, F.col("item"))),
        (cms_sketch(with_null, F.col("item")),
         cms_sketch(with_empty, F.col("item"))),
        (kmv_sketch(with_null, F.col("item")),
         kmv_sketch(with_empty, F.col("item"))),
    ]:
        got = sorted(map(tuple, df_pair[0].collect()))
        want = sorted(map(tuple, df_pair[1].collect()))
        assert got == want and got  # non-empty, no NULL-register rows
        assert all(None not in row for row in got)
    # SQL side: the builders coalesce the same way, so DuckDB over the
    # NULL-bearing relation matches Spark exactly
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW items AS SELECT 'w' || CAST(r AS VARCHAR) AS item "
        "FROM range(50) t(r) UNION ALL SELECT NULL"
    )
    hll_spark = hll_estimate(hll_sketch(with_null, F.col("item"))).collect()[0]
    hll_duck = con.execute(hll_sql("item", "items")).fetchone()
    assert (hll_spark["hll_zeros"], hll_spark["hll_est_r"]) == hll_duck
    kmv_spark = sorted(
        (r["rank"], r["h"]) for r in kmv_sketch(with_null, F.col("item")).collect()
    )
    kmv_duck = sorted(con.execute(kmv_sql("item", "items")).fetchall())
    assert kmv_spark == kmv_duck
    cms_spark = sorted(
        map(tuple, cms_sketch(with_null, F.col("item")).collect())
    )
    cms_duck = sorted(con.execute(cms_sql("item", "items")).fetchall())
    assert cms_spark == cms_duck
