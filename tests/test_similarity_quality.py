"""Quality checks for the approximate similarity paths: LSH recall vs
brute force, and near-dup detection of planted duplicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.operators.dedup import minhash_near_dup_pairs
from solarpaneldatawrangler_spark.operators.similarity import (
    brute_force_topk,
    lsh_bucketed_topk,
)
from solarpaneldatawrangler_spark.sources.star import load_table


def test_lsh_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5)
    approx = lsh_bucketed_topk(emb, queries, k=5, dim=64, n_planes=4, n_tables=10)
    exact_set = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    # these embeddings are near-random (top-5 cosine ~0.3-0.5), the worst
    # case for sign-LSH; measured 0.72 with 4 planes x 10 distinct tables
    # — planes are deterministic, so pin a floor under the measurement.
    # (This test caught a real bug: identical per-table seeds -> 0.18.)
    assert recall >= 0.5, f"LSH recall collapsed: {recall}"
    assert {q for q, _ in approx_set} == {q for q, _ in exact_set}


def test_minhash_finds_planted_duplicates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    planted = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text"
    )
    n_planted = planted.count()
    pairs = minhash_near_dup_pairs(
        docs.unionByName(planted), jaccard_threshold=0.9, reproducible=False
    )
    found = {
        (r.id_a, r.id_b) for r in pairs.collect() if r.id_b - r.id_a == 500000
    }
    # every planted exact duplicate has identical signatures in every
    # band -> guaranteed candidate -> jaccard 1.0 -> must be found
    assert len(found) == n_planted


def test_blas_signatures_match_expression_form(spark, sf_dir):
    # the BLAS int64 signature path (operators.similarity._signature_rows)
    # must agree bit-for-bit with the oracle-checkable expression form
    # (functions.vectors.random_hyperplane_signature): bit i of the int
    # signature == character i of the expression's 0/1 string
    from solarpaneldatawrangler_spark.functions.vectors import (
        random_hyperplane_signature,
    )
    from solarpaneldatawrangler_spark.operators.similarity import (
        _default_planes,
        _signature_rows,
    )

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    tables = [_default_planes(64, 8, seed=t) for t in range(3)]

    fast = _signature_rows(emb, "vid", "_v", "vec_id", "embedding", tables)
    got = {(r.vid, r.table): r.sig for r in fast.collect()}

    for t, planes in enumerate(tables):
        expr = emb.select(
            F.col("vec_id").alias("vid"),
            random_hyperplane_signature(F.col("embedding"), planes).alias("bits"),
        )
        for r in expr.collect():
            sig = got[(r.vid, t)]
            expect = "".join("1" if (sig >> i) & 1 else "0" for i in range(len(planes)))
            assert r.bits == expect, f"vec {r.vid} table {t}: {r.bits} != {expect}"


def _py_winnow(text, k=5, w=4):
    """Pure-Python winnowing reference (Schleimer et al. SIGMOD'03):
    rightmost minimum of each w-window over md5 k-gram hashes."""
    import hashlib
    import re

    t = re.sub(r"\s+", " ", text.strip().lower())
    n = len(t) - k + 1
    if n < 1:
        return set()
    hs = [int(hashlib.md5(t[i:i + k].encode()).hexdigest()[:8], 16) for i in range(n)]
    out = set()
    for p in range(w - 1, n):
        lo = p - w + 1
        m = min(hs[lo:p + 1])
        rm = max(i for i in range(lo, p + 1) if hs[i] == m)
        out.add((rm + 1, hs[rm]))  # 1-based position
    return out


def test_winnowing_matches_python_reference(spark):
    from solarpaneldatawrangler_spark.operators.dedup import winnowing_fingerprints

    docs = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "the  quick   brown fox jumps over the lazy dog!"),
        (3, "aaaaaaaaaaaa"),            # all-equal hashes: rightmost-tie rule
        (4, "tiny"),                    # < k chars: no k-grams
        (5, "abcdefgh"),                # exactly k+w-1: single window
        (6, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in winnowing_fingerprints(df, k=5, w=4).collect():
        got.setdefault(r.id, set()).add((r.fp_pos, r.fp_hash))
    for did, text in docs:
        assert got.get(did, set()) == _py_winnow(text), f"doc {did}"


def test_winnowing_shared_substring_guarantee(spark):
    # the paper's guarantee: any common substring of length >= w+k-1
    # produces at least one SHARED (hash, gram) fingerprint; positions
    # differ, so compare hash sets
    from solarpaneldatawrangler_spark.operators.dedup import winnowing_fingerprints

    shared = "solar panel arrays on rooftops are detected by the classifier"
    docs = [
        (1, "PREFIX one two three " + shared),
        (2, shared + " totally different suffix content here"),
        (3, "no overlap with anything else at all in this text"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = {}
    for r in winnowing_fingerprints(df, k=5, w=4).collect():
        fps.setdefault(r.id, set()).add(r.fp_hash)
    assert fps[1] & fps[2], "docs sharing a long substring must share fingerprints"
    # doc3 shares common English 5-grams ('the c'...) at most incidentally;
    # the overlap with doc1/doc2 must be far smaller than the twin overlap
    assert len(fps[1] & fps[2]) > len(fps[1] & fps[3])


def test_ivf_recall_and_training_consistency(spark, sf_dir):
    from solarpaneldatawrangler_spark.operators.similarity import (
        brute_force_topk,
        ivf_centroids_for_dir,
        ivf_topk,
        train_ivf_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)

    # the Spark-collect and pyarrow training paths must produce the SAME
    # centroids (the oracle replays the pyarrow ones as SQL VALUES)
    via_spark = train_ivf_centroids(emb, n_lists=16)
    via_arrow = ivf_centroids_for_dir(sf_dir, n_lists=16)
    assert via_spark == via_arrow

    bf = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, queries, k=10).collect()}
    iv = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, queries, k=10, nprobe=4, centroids=via_arrow).collect()
    }
    # near-random 64-dim embeddings are the hard case; nprobe=4/16 of the
    # corpus still has to recover most of the true top-10
    assert len(iv & bf) / len(bf) >= 0.6
    # probing every list IS brute force: recall must be exactly 1
    full = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, queries, k=10, nprobe=16, centroids=via_arrow).collect()
    }
    assert full == bf


def test_ivf_partitioned_store_prunes_lists(spark, sf_dir, tmp_path):
    """The IVF scale story: corpus written partitioned by list_id, a
    probed-list isin filter must become PARTITION pruning at the scan
    (reading nprobe/n_lists of the files), and top-k over the pruned
    store must equal the in-memory operator."""
    from solarpaneldatawrangler_spark.operators.similarity import (
        ivf_centroids_for_dir,
        ivf_topk,
        write_ivf_store,
    )

    cents = ivf_centroids_for_dir(sf_dir, n_lists=16)
    emb = load_table(spark, sf_dir, "embeddings")
    store = str(tmp_path / "ivf_store")
    write_ivf_store(emb, store, cents)

    back = spark.read.parquet(store)
    probed = [0, 3, 7]
    pruned = back.filter(F.col("list_id").isin(probed))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the list_id filter must land in PartitionFilters (pruning), not in
    # the post-scan data filters
    pf = plan.split("PartitionFilters")[1][:300]
    assert "list_id" in pf
    # and the pruned read really excludes unprobed lists
    assert {r.list_id for r in pruned.select("list_id").distinct().collect()} <= set(probed)

    # end-to-end equivalence: ivf_topk over the pre-indexed store (its
    # list_id column skips re-assignment, so the internal isin filter
    # prunes at the scan) == over the raw table
    queries = emb.filter(F.col("vec_id") < 5)
    # write_ivf_store kept the caller's column names: read back as-is
    a = ivf_topk(back, queries, k=10, nprobe=4, centroids=cents)
    plan_a = a._jdf.queryExecution().executedPlan().toString()
    assert "list_id" in plan_a.split("PartitionFilters")[1][:300]  # pruned scan
    b = ivf_topk(emb, queries, k=10, nprobe=4, centroids=cents)
    key = lambda df: {(r.query_id, r.neighbor_id, round(r.cosine_sim, 9), r.rank) for r in df.collect()}
    assert key(a) == key(b)


def test_ivf_rank_dp_prunes_locally_and_matches_prune_disabled(spark, sf_dir):
    """q67's catalog shape: rank_dp=4 must (a) bound the mapInPandas
    survivors to O(partitions x queries x (k + margin)) — the property
    the old k=1,000,000 entry disabled — and (b) select exactly the
    same rounded top-k as the prune-disabled form."""
    from solarpaneldatawrangler_spark.operators.similarity import (
        ivf_centroids_for_dir,
        ivf_topk,
    )

    cents = ivf_centroids_for_dir(sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    nq, k, margin = 5, 10, 32

    surv = ivf_topk(
        emb, queries, k=k, nprobe=4, centroids=cents, rank_dp=4,
        debug_survivors=True,
    )
    nparts = surv.rdd.getNumPartitions()
    n_surv = surv.count()
    n_probed = emb.count()  # upper bound on probed candidates
    assert n_surv <= nparts * nq * (k + margin)
    assert n_surv < n_probed, "local cut must actually prune"

    pruned = ivf_topk(emb, queries, k=k, nprobe=4, centroids=cents, rank_dp=4)
    full = ivf_topk(emb, queries, k=1_000_000, nprobe=4, centroids=cents)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cosine_sim", 4)), F.asc("neighbor_id")
    )
    full10 = (
        full.withColumn("r2", F.row_number().over(w))
        .filter(F.col("r2") <= k)
    )
    key = lambda df, r: {  # noqa: E731
        (x.query_id, x.neighbor_id, round(x.cosine_sim, 4), x[r]) for x in df.collect()
    }
    assert key(pruned, "rank") == key(full10, "r2")


def test_hot_bucket_guard_bounds_minhash_flood(spark):
    """Degenerate-bucket guard: 5k identical docs share EVERY band
    bucket, so the uncapped self-join would emit ~12.5M candidate pairs
    per band. With max_bucket the flooded buckets are dropped (bounded
    cost) while normal-size buckets — the planted twin pair — survive.
    The contract (documented on minhash_near_dup_pairs and enforced by
    curate_corpus ordering) is that exact dedup runs FIRST, so a bucket
    still oversized afterwards is pathological by construction."""
    flood = [(i, "solar panel on every roof in the city grid today") for i in range(5000)]
    twins = [
        (10001, "an entirely different pair of documents about arrays"),
        (10002, "an entirely different pair of documents about arrays"),
    ]
    df = spark.createDataFrame(flood + twins, "doc_id long, text string")
    pairs = minhash_near_dup_pairs(df, jaccard_threshold=0.5, max_bucket=64)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(10001, 10002)}


def test_hot_bucket_guard_bounds_lsh_flood(spark):
    """Same guard on the embedding LSH path: identical vectors collide
    in every signature table; capped buckets drop the flood, keep the
    planted twin vectors."""
    from solarpaneldatawrangler_spark.operators.similarity import lsh_neardup_pairs

    base = [float((7 * j) % 13) - 6.0 for j in range(16)]
    other = [float((5 * j) % 11) - 3.0 for j in range(16)]
    rows = [(i, base) for i in range(5000)] + [(10001, other), (10002, other)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = lsh_neardup_pairs(df, threshold=0.9, dim=16, max_bucket=64)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(10001, 10002)}


def test_lsh_neardup_gather_paths_agree(spark, sf_dir):
    """The broadcast-gather verify and the join-reattach verify (the
    big-corpus fallback) must produce identical pair sets."""
    from solarpaneldatawrangler_spark.operators.similarity import lsh_neardup_pairs

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    key = lambda df: {(r.id_a, r.id_b, r.cos_r) for r in df.collect()}
    bc = key(lsh_neardup_pairs(emb, threshold=0.4, gather="broadcast"))
    jn = key(lsh_neardup_pairs(emb, threshold=0.4, gather="join"))
    assert bc == jn and bc


def test_empty_inputs_yield_empty_frames(spark, sf_dir):
    """Degenerate inputs compose instead of crashing: an empty corpus
    used to hit np.linalg.norm on a 0-d array (AxisError) in the
    broadcast-gather path, and empty queries raised ValueError where
    the original implementation returned an empty frame."""
    from solarpaneldatawrangler_spark.operators.similarity import (
        lsh_bucketed_topk,
        lsh_neardup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings").limit(20)
    none = emb.filter(F.lit(False))

    for corpus, queries in [(none, emb.limit(3)), (emb, none), (none, none)]:
        out = lsh_bucketed_topk(corpus, queries, k=5, gather="broadcast")
        assert out.count() == 0
        assert out.columns == ["query_id", "neighbor_id", "cosine_sim", "rank"]

    pairs = lsh_neardup_pairs(none, gather="broadcast")
    assert pairs.count() == 0
    assert pairs.columns == ["id_a", "id_b", "cos_r"]


def test_half_up_matches_spark_round_exactly(spark):
    """_half_up drives the IVF local top-k cut while the authoritative
    ranking rounds JVM-side (F.round -> BigDecimal.valueOf HALF_UP on
    the shortest-decimal string). The two must agree on EVERY double,
    boundary cases included, or the local cut could drop a true top-k
    row. Python repr() is the same shortest decimal, so the repr-based
    slow path gives exact parity — pin it against Spark itself."""
    import numpy as np

    from solarpaneldatawrangler_spark.operators.similarity import _half_up

    rng = np.random.default_rng(42)
    vals = list(rng.uniform(-1, 1, 500))
    # adversarial boundaries: decimal looks like x.xxxx5 but the double
    # sits just below the scaled .5 (the fast path's failure mode —
    # e.g. 2.675*100 = 267.49999999999997)
    vals += [0.12345, -0.12345, 0.00005, -0.00005, 2.675, -2.675,
             0.99995, -0.99995, 0.5, -0.5, 0.0, 1.0, -1.0]
    vals += [round(n / 20000, 10) for n in range(-40, 40)]  # n*0.00005
    # dp=8 boundaries on unit-scale cosines: |x|*1e8 has ulp ~1.5e-8,
    # larger than a fixed 1e-9 detection window — the case that forced
    # the magnitude-scaled tolerance in _half_up
    vals += [round(n / 2e8, 16) for n in range(-30, 30)]
    vals += [round(0.1 + n / 2e8, 16) for n in range(-20, 20)]
    vals = [float(v) for v in vals]

    for dp in (2, 4, 6, 8):
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        jvm = [r[0] for r in df.select(F.round("x", dp).alias("r")).collect()]
        ours = _half_up(np.array(vals), dp)
        for v, j, o in zip(vals, jvm, ours):
            assert j == o, f"dp={dp} x={v!r}: spark={j!r} ours={o!r}"


def test_winnowing_rejects_oversized_doc(spark):
    """The 2^21 position cap must fail LOUDLY (pos would bleed into the
    hash bits and corrupt fingerprints silently otherwise)."""
    import pytest

    from solarpaneldatawrangler_spark.operators.dedup import winnowing_fingerprints

    big = spark.createDataFrame(
        [(1, "x" * (1 << 21)), (2, "normal sized document text")],
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="exceeds 2\\^21"):
        winnowing_fingerprints(big).collect()
    ok = spark.createDataFrame([(2, "normal sized document text")], "doc_id long, text string")
    assert winnowing_fingerprints(ok).count() > 0


def test_distributed_kmeans_matches_driver_lloyd(spark, sf_dir):
    """kmeans_fit (distributed partial-sum Lloyd's) must agree with the
    driver-side _lloyd reference on the same data, same init, same
    iteration count — identical assignment rules, so centroids match to
    float-summation noise."""
    import numpy as np
    import pyarrow.parquet as pq_

    from solarpaneldatawrangler_spark.operators.similarity import (
        _lloyd,
        kmeans_fit,
    )
    from solarpaneldatawrangler_spark.sources.star import load_table

    t = pq_.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.asarray(t.column("vec_id").to_numpy())
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    mat = mat[np.argsort(ids, kind="stable")]

    want = np.array(_lloyd(mat, 8, 3, round_dp=6))
    got = np.array(
        kmeans_fit(
            load_table(spark, sf_dir, "embeddings"), k=8, iters=3, round_dp=6
        )
    )
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 1e-5, np.abs(got - want).max()


def test_distributed_kmeans_recovers_planted_blobs(spark):
    """Three well-separated blobs: the fitted centroids land on the
    blob centers and every point's nearest centroid is its blob's."""
    import numpy as np
    from pyspark.sql import functions as F

    centers = np.array([[0.0] * 4, [10.0] * 4, [-10.0, 10.0, -10.0, 10.0]])
    vecs = spark.range(300).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(4)),
            lambda j: (
                F.element_at(
                    F.array(*[F.lit(float(c)) for c in centers.flatten()]),
                    ((F.col("id") % 3) * 4 + j).cast("int"),
                )
                + (F.pmod(F.xxhash64(F.col("id") * 4 + j), 100) - 50) / 500.0
            ),
        ).alias("embedding"),
    )
    from solarpaneldatawrangler_spark.operators.similarity import kmeans_fit

    cents = np.array(kmeans_fit(vecs, k=3, iters=5))
    # each true center has a fitted centroid within the jitter radius
    for c in centers:
        assert np.linalg.norm(cents - c, axis=1).min() < 0.2
