"""Learned BPE (operators/bpe): hand-trained merges, greedy-left
segmentation semantics, concatenation roundtrip, and the DuckDB
recursive-CTE replay of the distributed encode."""

from __future__ import annotations

from solarpaneldatawrangler_spark.operators.bpe import (
    bpe_encode,
    bpe_merges_for_dir,
    bpe_merges_values_sql,
    encode_word,
    train_bpe_merges,
)
from solarpaneldatawrangler_spark.sources.star import load_table
from tests.oracle_harness import compare, run_oracle

_SQL_TOKS = (
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0)"
)


def _bpe_oracle(merges) -> str:
    values = bpe_merges_values_sql(merges)
    n = len(merges)
    return rf"""
WITH RECURSIVE
bm(idx, pat, rep) AS (VALUES {values}),
btoks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
bwords AS (
    SELECT t.doc_id, CAST(u.i AS BIGINT) AS wpos,
           ' ' || array_to_string(
               string_split_regex(t.toks[CAST(u.i AS INT)], ''), ' ')
             || ' ' AS s
    FROM btoks t, LATERAL UNNEST(range(1, len(t.toks) + 1)) AS u(i)
),
enc AS (
    SELECT doc_id, wpos, s, 1 AS i FROM bwords
    UNION ALL
    SELECT e.doc_id, e.wpos,
           CASE WHEN contains(e.s, m.pat)
                THEN replace(e.s, m.pat, m.rep) ELSE e.s END,
           CASE WHEN contains(e.s, m.pat) THEN e.i ELSE e.i + 1 END
    FROM enc e JOIN bm m ON m.idx = e.i
),
fin AS (SELECT doc_id, wpos, trim(s) AS s FROM enc WHERE i = {n} + 1),
agg AS (
    SELECT doc_id,
           string_agg(s, ' | ' ORDER BY wpos) AS bpe_text,
           CAST(SUM(len(string_split(s, ' '))) AS BIGINT) AS n_bpe
    FROM fin GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(a.bpe_text, '') AS bpe_text,
       COALESCE(a.n_bpe, 0) AS n_bpe
FROM btoks t LEFT JOIN agg a USING (doc_id)
"""


def test_train_bpe_hand_case():
    merges = train_bpe_merges(["aa aa ab"], n_merges=8)
    assert merges == [("a", "a")]  # (a,b) occurs once: below min count
    assert encode_word("aaa", merges) == ["aa", "a"]  # greedy-left
    assert encode_word("ab", merges) == ["a", "b"]


def test_encode_fixpoint_recovers_consumed_separators():
    # ' a b a b ' needs the repeat-until-fixpoint rule: one replacement
    # pass would leave the second pair unmerged
    merges = [("a", "b")]
    assert encode_word("abab", merges) == ["ab", "ab"]


def test_roundtrip_and_ordering(sf_dir):
    merges = bpe_merges_for_dir(sf_dir, n_merges=64)
    assert 0 < len(merges) <= 64
    for w in ("the", "solar", "panels", "überstraße", "a", "xyzzy"):
        toks = encode_word(w, merges)
        assert "".join(toks) == w  # no characters created or lost


def test_bpe_encode_duckdb_recursive_replay(spark, sf_dir):
    merges = bpe_merges_for_dir(sf_dir, n_merges=64)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    got = bpe_encode(docs, merges)
    compare(got, run_oracle(_bpe_oracle(merges), sf_dir), "bpe_encode")


def test_distributed_trainer_matches_driver_trainer(spark, sf_dir):
    """Train-path consistency (the IVF idiom): the distributed
    whole-corpus trainer must produce the IDENTICAL merge table to the
    driver-side trainer on the same corpus — same tokenizer, same
    (count DESC, pair lex ASC) tie-break, same early stop."""
    from solarpaneldatawrangler_spark.operators.bpe import (
        train_bpe_merges_distributed,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        "doc_id < 300"
    ).select("doc_id", "text")
    # r11 size-aware routing: the default routes this small vocabulary
    # driver-locally; local_max_words=0 pins the distributed pair-count
    # loop. BOTH must equal the driver trainer — three-way identity.
    got_local = train_bpe_merges_distributed(docs.repartition(7), n_merges=24)
    got_loop = train_bpe_merges_distributed(
        docs.repartition(7), n_merges=24, local_max_words=0
    )
    texts = [r["text"] for r in docs.collect()]
    want = train_bpe_merges(texts, n_merges=24)
    assert got_local == got_loop == want
    assert len(want) == 24  # the corpus has at least 24 learnable merges


def test_distributed_trainer_early_stop_and_repartition_invariance(spark):
    """No pair occurring twice -> empty merge table; and the result is
    invariant to physical partitioning (integer partial sums)."""
    from solarpaneldatawrangler_spark.operators.bpe import (
        train_bpe_merges_distributed,
    )

    uniq = spark.createDataFrame(
        [(1, "ab cd"), (2, "ef gh")], "doc_id int, text string"
    )
    assert train_bpe_merges_distributed(uniq, n_merges=8) == []

    rows = [(i, "banana band bandit " + f"u{i}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    # pin the LOOP for the partition-invariance claim (the local route
    # collapses partitioning by construction)
    one = train_bpe_merges_distributed(
        docs.coalesce(1), n_merges=10, local_max_words=0
    )
    many = train_bpe_merges_distributed(
        docs.repartition(13), n_merges=10, local_max_words=0
    )
    assert one == many == train_bpe_merges(
        [t for _, t in rows], n_merges=10
    )


def test_bpe_routing_boundary_just_over_threshold(spark):
    """Size-aware routing boundary (r12, mirroring
    test_cc_strategies_agree_and_local_routing): a vocabulary exactly
    AT local_max_words takes the driver-local route, one word OVER
    takes the distributed pair-count loop — and both produce the
    identical merge table either side of the cutoff. Also pins the
    collect-site bound guard: the local route can never collect more
    than local_max_words rows."""
    from solarpaneldatawrangler_spark.operators.bpe import (
        train_bpe_merges,
        train_bpe_merges_distributed,
    )

    # corpus with exactly 12 distinct words (vocab == 12): 'pa pb'
    # repeats so at least one merge is learnable
    texts = ["pa pb pa pb", "pa pb w1 w2 w3", "w4 w5 w6 w7 w8 w9 w10"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    want = train_bpe_merges(texts, n_merges=6)
    assert want  # non-vacuous: the corpus has learnable merges

    at = train_bpe_merges_distributed(docs, n_merges=6, local_max_words=12)
    over = train_bpe_merges_distributed(docs, n_merges=6, local_max_words=11)
    assert at == over == want

    # the bound guard itself: a collect that exceeds its declared
    # bound fails loudly (unit-level, no Spark needed)
    from solarpaneldatawrangler_spark.operators.guards import (
        assert_bounded_collect,
    )

    assert assert_bounded_collect([1, 2, 3], 3, "probe") == [1, 2, 3]
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="over its 2 bound"):
        assert_bounded_collect([1, 2, 3], 2, "probe")


def test_distributed_loop_fixpoint_residual_and_unicode(spark):
    """r16-opt: the JVM merge loop applies each merge as a bounded
    chain of literal replace-all passes plus a residual-marker recheck.
    These corpora force multi-pass fixpoints (' a a a a ' / ' a b a b '
    chains re-form the pattern across consumed separators) and
    non-ASCII/astral symbols (state built via split(w, '') must equal
    Python's per-code-point iteration) — the loop must still match the
    driver trainer exactly."""
    from solarpaneldatawrangler_spark.operators.bpe import (
        train_bpe_merges,
        train_bpe_merges_distributed,
    )

    corpora = [
        ["aaaaaa aaaa aa", "aaaaaaa aaa", "aaaaaaaa"],
        ["abababab abab", "ababab ab ab", "ba abab"],
        ["日本語 日本 語日本", "naïve naïve café café", "日日日日 ïïïï"],
        ["😀😀😀😀 😀😀 x😀x", "zzz zz z 😀😀😀"],
    ]
    for texts in corpora:
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
        )
        got = train_bpe_merges_distributed(
            docs.repartition(3), n_merges=12, local_max_words=0
        )
        want = train_bpe_merges(texts, n_merges=12)
        assert got == want, (texts, got, want)
