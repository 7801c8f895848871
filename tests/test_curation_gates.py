"""Curation admission gates (operators/curation.py): URL blocklist
filtering, hashed-linear quality classifier, deterministic training
shards — DuckDB oracles on the driver documents table, hand cases,
permutation properties, plan shape."""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.operators.curation import (
    doc_url_flags,
    hashed_linear_score,
    hashed_linear_score_sql,
    shuffle_shards,
    url_blocklist_filter,
    write_training_shards,
)
from solarpaneldatawrangler_spark.sources.star import load_table
from tests.oracle_harness import compare, run_oracle

# The driver documents carry no URLs, so the cross-engine probe runs on
# a DERIVED corpus built identically in both engines: each doc cites a
# synthetic host whose subdomain depth varies with doc_id.
_URL_TEXT_SQL = (
    "text || ' see https://www' || (doc_id % 7) || '.blog' || (doc_id % 5)"
    " || '.example' || (doc_id % 3) || '.com/p and https://ok' || (doc_id % 2)"
    " || '.org/q'"
)
_BLOCKLIST = ["example1.com", "blog2.example0.com", "www3.blog4.example2.com"]


def _url_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://www"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".blog"), (F.col("doc_id") % 5).cast("string"),
            F.lit(".example"), (F.col("doc_id") % 3).cast("string"),
            F.lit(".com/p and https://ok"), (F.col("doc_id") % 2).cast("string"),
            F.lit(".org/q"),
        ).alias("text"),
    )


def test_url_flags_match_duckdb(spark, sf_dir):
    got = doc_url_flags(_url_docs(spark, sf_dir), _BLOCKLIST).select(
        "doc_id",
        F.col("n_urls").cast("long").alias("n_urls"),
        "url_host",
        "url_blocked",
    )
    bl = ", ".join(f"'{b}'" for b in _BLOCKLIST)
    want = run_oracle(
        f"""
        WITH u AS (SELECT doc_id, {_URL_TEXT_SQL} AS text FROM documents),
        h AS (
            SELECT doc_id,
                   regexp_extract_all(lower(text), 'https?://([a-z0-9.-]+)', 1)
                     AS hosts
            FROM u
        ),
        sfx AS (
            SELECT doc_id, unnest(list_transform(
                       generate_series(1, len(string_split(hh.h, '.'))),
                       i -> array_to_string(string_split(hh.h, '.')[i:], '.')))
                     AS s
            FROM (SELECT doc_id, unnest(hosts) AS h FROM h) hh
        ),
        blocked AS (SELECT DISTINCT doc_id FROM sfx WHERE s IN ({bl}))
        SELECT h.doc_id,
               CAST(len(hosts) AS BIGINT) AS n_urls,
               COALESCE(hosts[1], '') AS url_host,
               (b.doc_id IS NOT NULL) AS url_blocked
        FROM h LEFT JOIN blocked b USING (doc_id)
        """,
        sf_dir,
    )
    compare(got, want, "url_flags")


def test_url_blocklist_filter_hand_case(spark):
    docs = spark.createDataFrame(
        [
            (0, "buy at https://shop.spam.example.com/deal"),  # subdomain hit
            (1, "read https://news.org/a and https://spam.example.com/b"),
            (2, "clean doc citing https://ok.org only"),
            (3, "no urls at all"),
            (4, None),  # null text admitted (no citations)
            (5, "https://example.com.evil.io/phish"),  # suffix NOT example.com
        ],
        "doc_id bigint, text string",
    )
    bl = spark.createDataFrame([("spam.example.com",)], "host string")
    kept = url_blocklist_filter(docs, bl)
    assert sorted(r.doc_id for r in kept.collect()) == [2, 3, 4, 5]
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan


def test_url_flags_plan_is_map_only(spark, sf_dir):
    """The literal-blocklist audit runs inside the scan: no Exchange."""
    plan = (
        doc_url_flags(_url_docs(spark, sf_dir), _BLOCKLIST)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_hashed_linear_matches_duckdb(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = docs.select(
        "doc_id", F.round(hashed_linear_score(F.col("text")), 6).alias("clf_r")
    )
    want = run_oracle(
        f"SELECT doc_id, ROUND({hashed_linear_score_sql('text')}, 6) AS clf_r"
        " FROM documents",
        sf_dir,
    )
    compare(got, want, "hashed_linear")


def test_hashed_linear_r6_integer_exact_rounding(spark, sf_dir):
    """r12 (found by the sf1.0 sweep): a pseudo-weight score landing
    near a 6dp tie rounds differently through Spark's BigDecimal
    HALF_UP vs DuckDB's double ROUND. hashed_linear_score_r6 does the
    rounding in pure integer arithmetic in BOTH engines, so the tie
    case is exact by construction.

    Three pins: (a) strict Spark==DuckDB parity on real docs PLUS a
    synthetic near-tie corpus; (b) the integer formula equals
    Decimal-exact round-half-away-from-zero of num/(512*len) across a
    numerator sweep that includes exact ties; (c) r6 agrees with the
    unrounded score to within 5e-7 (it IS a 6dp rounding)."""
    from decimal import ROUND_HALF_UP, Decimal

    from solarpaneldatawrangler_spark.operators.curation import (
        hashed_linear_score_r6,
        hashed_linear_score_r6_sql,
    )

    # (a) engine parity, strict, on real + adversarial docs: many-token
    # docs push num/(512*len) onto fine rationals near 6dp ties
    docs = load_table(spark, sf_dir, "documents").limit(200).select(
        "doc_id", "text"
    )
    adv = spark.createDataFrame(
        [(10_000_000 + i, " ".join(f"w{j}g{i}" for j in range(i + 1)))
         for i in range(60)]
        + [(10_000_100, ""), (10_000_101, None)],
        "doc_id long, text string",
    )
    both = docs.unionByName(adv)
    got = both.select(
        "doc_id", hashed_linear_score_r6(F.col("text")).alias("clf_r")
    )
    import duckdb

    con = duckdb.connect()
    con.register("docs_pd", both.toPandas())
    want = con.execute(
        f"SELECT doc_id, {hashed_linear_score_r6_sql('text')} AS clf_r"
        " FROM docs_pd"
    ).fetchdf()
    compare(got, want, "hashed_linear_r6", strict=True)

    # (b) the integer rounding formula == Decimal half-away-from-zero
    # on the exact rational, including EXACT tie numerators
    for ln in (1, 3, 250, 997):
        for num in (0, 1, -1, 8360, -8360, 504 * ln, -504 * ln,
                    32 * ln, 32 * ln + 1, -(32 * ln), 167 * ln):
            q = (2_000_000 * abs(num) + 512 * ln) // (1024 * ln)
            mine = (-q if num < 0 else q) / 1_000_000.0
            exact = float(
                (Decimal(num) / (Decimal(512) * ln)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )
            assert mine == exact, (num, ln, mine, exact)

    # (c) r6 is a genuine 6dp rounding of the unrounded score
    joined = both.select(
        hashed_linear_score_r6(F.col("text")).alias("r6"),
        hashed_linear_score(F.col("text")).alias("raw"),
    ).collect()
    for r in joined:
        assert abs(r.r6 - r.raw) <= 5.0e-7 + 1e-12, (r.r6, r.raw)


def test_hashed_linear_real_weights_reference(spark):
    """Trained-weights path vs a Python reference on a tiny model."""
    nb = 8
    weights = [0.5, -0.25, 0.125, 0.0, -0.5, 0.25, -0.125, 1.0]
    rows = [(0, "alpha beta gamma beta"), (1, "delta"), (2, ""), (3, None)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: r.s
        for r in docs.select(
            "doc_id",
            hashed_linear_score(
                F.col("text"), weights=weights, n_buckets=nb, bias=0.1,
                sigmoid=True,
            ).alias("s"),
        ).collect()
    }

    import math

    def bucket(t: str) -> int:
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % nb

    for doc_id, text in rows:
        toks = [t for t in (text or "").lower().split() if t]
        raw = sum(weights[bucket(t)] for t in toks) / max(len(toks), 1) + 0.1
        want = 1.0 / (1.0 + math.exp(-raw))
        assert got[doc_id] == pytest.approx(want, rel=1e-12), doc_id

    with pytest.raises(ValueError):
        hashed_linear_score(F.col("text"), weights=[0.0], n_buckets=4)


def test_hashed_linear_plan_is_map_only(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        docs.select(hashed_linear_score(F.col("text")).alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_shuffle_shards_match_duckdb(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = shuffle_shards(docs, n_shards=8, seed="42").select(
        "doc_id",
        F.col("shard").cast("long").alias("shard"),
        F.col("shard_pos").cast("long").alias("shard_pos"),
    )
    want = run_oracle(
        """
        WITH k AS (
            SELECT doc_id,
                   ('0x' || substr(md5('42:' || doc_id), 1, 8))::BIGINT % 8
                     AS shard,
                   md5('42:' || doc_id) AS skey
            FROM documents
        )
        SELECT doc_id, shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY skey, doc_id)
                    AS BIGINT) AS shard_pos
        FROM k
        """,
        sf_dir,
    )
    compare(got, want, "shuffle_shards")


def test_shuffle_shards_permutation_properties(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = shuffle_shards(docs, n_shards=4, seed="s1")
    rows = out.select("doc_id", "shard", "shard_pos").collect()
    n = docs.count()
    assert len(rows) == n and len({r.doc_id for r in rows}) == n
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard

    # layout-independent: same permutation from a different partitioning
    again = {
        (r.doc_id, r.shard, r.shard_pos)
        for r in shuffle_shards(docs.repartition(7), n_shards=4, seed="s1")
        .select("doc_id", "shard", "shard_pos")
        .collect()
    }
    assert again == {(r.doc_id, r.shard, r.shard_pos) for r in rows}

    # a different seed is a different permutation
    other = {
        (r.doc_id, r.shard, r.shard_pos)
        for r in shuffle_shards(docs, n_shards=4, seed="s2")
        .select("doc_id", "shard", "shard_pos")
        .collect()
    }
    assert other != again


def test_write_training_shards_layout(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(200)
    path = os.path.join(str(tmp_path), "shards")
    write_training_shards(docs, path, n_shards=4, seed="7")

    dirs = sorted(d for d in os.listdir(path) if d.startswith("shard="))
    assert len(dirs) == 4
    back = spark.read.parquet(path)
    assert back.count() == 200
    # within each shard the parquet row order IS shard_pos order
    for d in dirs:
        pdf = spark.read.parquet(os.path.join(path, d)).toPandas()
        assert pdf["shard_pos"].tolist() == sorted(pdf["shard_pos"].tolist())
    # partition pruning: reading one shard touches one directory only
    one = back.filter(F.col("shard") == 2)
    scan = one._jdf.queryExecution().executedPlan().toString()
    assert one.count() > 0 and "PartitionFilters: [isnotnull(shard" in scan


def test_hashed_linear_large_model_pandas_path(spark):
    """Trained weights past the literal-array threshold route through
    the Arrow-batched NumPy path and score identically to the Python
    reference (same fold order). The plan must stay map-only."""
    nb = 1 << 12  # > 1024 -> pandas path, small enough to build fast
    import random

    rng = random.Random(7)
    weights = [rng.choice([-0.5, -0.25, 0.0, 0.25, 0.5]) for _ in range(nb)]
    rows = [(0, "alpha beta gamma beta"), (1, "delta"), (2, ""), (3, None)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: r.s
        for r in docs.select(
            "doc_id",
            hashed_linear_score(
                F.col("text"), weights=weights, n_buckets=nb, bias=0.1,
                sigmoid=True,
            ).alias("s"),
        ).collect()
    }
    import math

    def bucket(t: str) -> int:
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % nb

    for doc_id, text in rows:
        toks = [t for t in (text or "").lower().split() if t]
        raw = sum(weights[bucket(t)] for t in toks) / max(len(toks), 1) + 0.1
        want = 1.0 / (1.0 + math.exp(-raw))
        assert got[doc_id] == pytest.approx(want, rel=1e-12), doc_id
    plan = (
        docs.select(
            hashed_linear_score(
                F.col("text"), weights=weights, n_buckets=nb
            ).alias("s")
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_train_hashed_linear_separates_planted_classes(spark):
    """In-engine classifier training: a corpus where quality docs carry
    distinctive vocabulary must train to weights that separate held-out
    docs through the SAME serving path (hashed_linear_score)."""
    from solarpaneldatawrangler_spark.operators.curation import (
        train_hashed_linear,
    )

    nb = 1 << 10
    good_words = ["thoughtful", "analysis", "evidence", "nuanced"]
    bad_words = ["clickbait", "spam", "scam", "viagra"]
    rows = []
    for i in range(40):
        gw = " ".join(good_words[j % 4] for j in range(i, i + 3))
        bw = " ".join(bad_words[j % 4] for j in range(i, i + 3))
        rows.append((2 * i, f"common filler {gw} more filler", 1))
        rows.append((2 * i + 1, f"common filler {bw} more filler", 0))
    docs = spark.createDataFrame(rows, "doc_id long, text string, label int")
    weights, bias = train_hashed_linear(
        docs, n_buckets=nb, iters=60, lr=2.0
    )
    held = spark.createDataFrame(
        [
            (100, "a thoughtful analysis with evidence"),
            (101, "viagra spam clickbait scam offer"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.s
        for r in held.select(
            "doc_id",
            hashed_linear_score(
                F.col("text"), weights=weights, n_buckets=nb, bias=bias,
                sigmoid=True,
            ).alias("s"),
        ).collect()
    }
    assert got[100] > 0.7 > 0.3 > got[101], got


def test_train_hashed_linear_matches_numpy_reference(spark):
    """The distributed trainer equals a single-process NumPy full-batch
    GD on identical data/params (tiny data -> partial-sum order can
    only differ in ulps; compared at 1e-8)."""
    import math

    from solarpaneldatawrangler_spark.operators.curation import (
        train_hashed_linear,
    )

    nb = 64
    rows = [
        (0, "alpha beta", 1),
        (1, "beta gamma", 0),
        (2, "alpha alpha delta", 1),
        (3, "gamma gamma", 0),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w, b = train_hashed_linear(docs, n_buckets=nb, iters=5, lr=0.5)

    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % nb

    import numpy as np

    rw, rb = np.zeros(nb), 0.0
    for _ in range(5):
        gw, gb = np.zeros(nb), 0.0
        for _, text, y in rows:
            bks = [bucket(t) for t in text.split()]
            x = 1.0 / len(bks)
            p = 1.0 / (1.0 + math.exp(-(sum(rw[k] for k in bks) * x + rb)))
            err = p - y
            gb += err
            for k in bks:
                gw[k] += err * x
        rw -= 0.5 * gw / len(rows)
        rb -= 0.5 * gb / len(rows)
    assert abs(b - rb) < 1e-8
    assert float(np.abs(np.asarray(w) - rw).max()) < 1e-8


def test_train_hashed_linear_rejects_poisonous_labels(spark):
    from solarpaneldatawrangler_spark.operators.curation import (
        train_hashed_linear,
    )

    # a string label that CASTS to null must be caught, not NaN-poison
    docs = spark.createDataFrame(
        [(0, "alpha", "1"), (1, "beta", "yes")],
        "doc_id long, text string, label string",
    )
    with pytest.raises(ValueError, match="poison"):
        train_hashed_linear(docs, n_buckets=8, iters=1)
    nan_docs = spark.createDataFrame(
        [(0, "alpha", 1.0), (1, "beta", float("nan"))],
        "doc_id long, text string, label double",
    )
    with pytest.raises(ValueError, match="poison"):
        train_hashed_linear(nan_docs, n_buckets=8, iters=1)


def test_hashed_linear_serve_path_override_parity(spark):
    """ADVICE r7: serve_path='pandas' forces the Python path for a
    small (<=1024-bucket) trained model; it must score BIT-IDENTICAL
    to the expr path (same hash, same left-to-right fold), and
    serve_path='expr' must stay Exchange-free codegen."""
    nb = 256
    import random

    rng = random.Random(11)
    weights = [rng.uniform(-1.0, 1.0) for _ in range(nb)]
    rows = [(0, "alpha beta gamma beta"), (1, "delta eps"), (2, ""), (3, None)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    def scores(path: str) -> dict[int, float]:
        return {
            r.doc_id: r.s
            for r in docs.select(
                "doc_id",
                hashed_linear_score(
                    F.col("text"), weights=weights, n_buckets=nb,
                    bias=0.25, serve_path=path,
                ).alias("s"),
            ).collect()
        }

    expr, pandas_ = scores("expr"), scores("pandas")
    for doc_id in expr:
        assert expr[doc_id] == pandas_[doc_id], doc_id  # exact, not approx

    with pytest.raises(ValueError, match="serve_path"):
        hashed_linear_score(F.col("text"), serve_path="jvm")
