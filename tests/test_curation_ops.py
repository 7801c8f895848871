"""Round-4 curation extensions: benchmark decontamination (winnowing
overlap), Gopher repetition signals, and greedy sequence packing — each
verified against a cross-engine (DuckDB) or pure-Python reference."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.functions.rounding import (
    round_ratio_half_away_sql as _rrha_sql,
)

BENCH_SENTENCES = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "solar panels convert sunlight into electricity through photovoltaic cells",
]

DOCS = [
    # leaked: contains benchmark sentence 0 verbatim inside other prose
    (1, "intro paragraph here. " + BENCH_SENTENCES[0] + " and a closing thought."),
    # leaked: benchmark sentence 1 with different surrounding whitespace
    (2, "  " + BENCH_SENTENCES[1].upper() + "   extra   trailing words"),
    # clean long doc
    (3, "completely original content about gardening tomatoes in clay soil "
        "with drip irrigation and evening shade covering most of the yard"),
    # clean short doc (too short to fingerprint at k=5, w=4)
    (4, "tiny doc"),
    # clean doc sharing only a single common word
    (5, "electricity pricing varies by region and季节 demand patterns overall"),
]


def _winnow_fps_sql(table: str, idc: str) -> str:
    """DuckDB winnowing fingerprints — same CTE as q66's oracle
    (extension_queries2._WINNOW_ORACLE), parametrized by table."""
    return f"""
    SELECT DISTINCT id, (skey + 2097151) // 2097152 AS fp_hash
    FROM (
        SELECT id, pos,
               MIN(h * 2097152 - pos) OVER (
                   PARTITION BY id ORDER BY pos
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
               ) AS skey
        FROM (
            SELECT n.id, u.pos,
                   ('0x' || substr(md5(substr(n.t, CAST(u.pos AS INT), 5)), 1, 8))::BIGINT AS h
            FROM (
                SELECT {idc} AS id,
                       regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t
                FROM {table}
            ) n,
            LATERAL UNNEST(generate_series(1, length(n.t) - 5 + 1)) AS u(pos)
        )
    )
    WHERE pos >= 4
    """


def test_contamination_scores_match_duckdb(spark):
    import duckdb

    from solarpaneldatawrangler_spark.operators.decontaminate import (
        contamination_scores,
    )

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(i, s) for i, s in enumerate(BENCH_SENTENCES)], "bid long, text string"
    )
    got = {
        r.doc_id: (r.n_fps, r.n_shared, r.shared_frac)
        for r in contamination_scores(docs, bench).collect()
    }

    con = duckdb.connect()
    con.register("docs_t", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    con.register(
        "bench_t",
        pd.DataFrame(list(enumerate(BENCH_SENTENCES)), columns=["bid", "text"]),
    )
    oracle = con.execute(f"""
        WITH dfps AS ({_winnow_fps_sql('docs_t', 'doc_id')}),
        bfps AS (SELECT DISTINCT fp_hash FROM ({_winnow_fps_sql('bench_t', 'bid')})),
        totals AS (
            SELECT d.id, COUNT(DISTINCT d.fp_hash) AS n_fps,
                   COUNT(DISTINCT CASE WHEN b.fp_hash IS NOT NULL
                                       THEN d.fp_hash END) AS n_shared
            FROM dfps d LEFT JOIN bfps b USING (fp_hash)
            GROUP BY d.id
        )
        SELECT doc_id, COALESCE(n_fps, 0), COALESCE(n_shared, 0),
               {_rrha_sql("COALESCE(n_shared, 0)",
                          "GREATEST(COALESCE(n_fps, 0), 1)", 6,
                          assume_nonneg=True)}
        FROM docs_t LEFT JOIN totals ON totals.id = docs_t.doc_id
    """).fetchall()
    expect = {r[0]: (r[1], r[2], r[3]) for r in oracle}
    assert got == expect

    # semantics, not just engine agreement: the leaked docs overlap
    # heavily; the gardening doc not at all; doc 5 only incidentally
    # (the single shared word "electricity" >= w+k-1 chars legitimately
    # fingerprints — thresholds, not zero-tolerance, separate leaks)
    assert got[1][1] >= 20 and got[2][1] >= 20
    assert got[3][1] == 0
    assert 0 < got[5][1] < 5 and got[5][2] < 0.2
    assert got[4] == (1, 0, 0.0)  # len 8 == k+w-1: exactly one window


def test_decontaminate_drops_planted_leaks(spark):
    from solarpaneldatawrangler_spark.operators.decontaminate import decontaminate

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(i, s) for i, s in enumerate(BENCH_SENTENCES)], "bid long, text string"
    )
    kept = {r.doc_id for r in decontaminate(docs, bench, min_shared=5).collect()}
    assert kept == {3, 4, 5}
    # zero-tolerance also drops the incidental single-word overlap
    strict = {r.doc_id for r in decontaminate(docs, bench, min_shared=1).collect()}
    assert strict == {3, 4}
    # the fraction form separates leaks (.56/.76) from shared vocabulary
    # (.125) without knowing document lengths
    frac = {
        r.doc_id
        for r in decontaminate(docs, bench, min_shared_frac=0.4).collect()
    }
    assert frac == {3, 4, 5}
    # precomputed-fingerprint reuse (the score-N-benchmarks-at-scale
    # shape) must give identical results to the inline pass
    from solarpaneldatawrangler_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    fps = winnowing_fingerprints(docs, k=5, w=4).localCheckpoint()
    reused = {
        r.doc_id
        for r in decontaminate(docs, bench, min_shared=5, doc_fps=fps).collect()
    }
    assert reused == kept
    # empty benchmark: nothing to leak, everything survives
    kept_all = {
        r.doc_id
        for r in decontaminate(docs, bench.filter(F.lit(False))).collect()
    }
    assert kept_all == {1, 2, 3, 4, 5}


def _py_dup_line_frac(text: str) -> float:
    lines = [l.strip() for l in text.split("\n") if l.strip()]
    if not lines:
        return 0.0
    return round(1.0 - len(set(lines)) / len(lines), 6)


def _py_rep_ngram_frac(text: str, n: int) -> float:
    toks = [t for t in text.lower().split() if t]
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    if not grams:
        return 0.0
    return round(1.0 - len(set(grams)) / len(grams), 6)


def test_repetition_signals_match_reference(spark):
    from solarpaneldatawrangler_spark.functions.text import (
        duplicate_line_fraction,
        repeated_ngram_fraction,
    )

    docs = [
        (1, "nav menu\nnav menu\nnav menu\nreal content line\nnav menu"),
        (2, "all lines\nare unique\nin this document\n\n\n"),
        (3, "the the the the the the"),
        (4, "normal prose with no repeated bigrams at all here"),
        (5, ""),
        (6, "  \n \n  "),  # whitespace-only lines
        # CRLF + tab-only lines: \r and \t must strip like Python's
        # str.strip() (F.trim would keep them, inflating the fraction)
        (7, "alpha\r\n\r\nbeta\r\n\t\r\ngamma\r\n\r\ndelta"),
        (8, "same line\r\nsame line\r\nother\r\n"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r.doc_id: (r.dlf, r.rnf)
        for r in df.select(
            "doc_id",
            duplicate_line_fraction(F.col("text")).alias("dlf"),
            repeated_ngram_fraction(F.col("text"), 2).alias("rnf"),
        ).collect()
    }
    for did, text in docs:
        assert out[did] == (
            _py_dup_line_frac(text),
            _py_rep_ngram_frac(text, 2),
        ), f"doc {did}"
    assert out[1][0] == 0.6  # 3 of 5 lines are repeats
    assert out[3][1] == 0.8  # "the the" x5 -> 4 of 5 bigrams repeat


def test_redact_pii_matches_python_reference(spark):
    """redact_pii / pii_count vs Python re (same lookaround semantics
    as the JVM regex engine): emails, phone shapes, IPv4 — and
    non-PII near-misses (versions, decimals, bare long numbers) must
    survive untouched."""
    import re

    from solarpaneldatawrangler_spark.functions.text import (
        PII_PATTERNS,
        pii_count,
        redact_pii,
    )

    docs = [
        (1, "contact jane.doe+spam@example.co.uk or call 555-867-5309 now"),
        (2, "server at 192.168.1.254 answered; fallback (303) 555-0144"),
        (3, "version 1.2.3.4.5 and pi 3.14159 and order 123456789 stay"),
        (4, "intl +44 020-7946-0958 vs decimal 10.5 vs ip 8.8.8.8"),
        (5, "no pii at all in this line"),
        (6, ""),
    ]

    def py_redact(t):
        for kind, pat in PII_PATTERNS.items():
            t = re.sub(pat, f"<{kind}>", t)
        return t

    def py_count(t):
        return sum(len(re.findall(p, t)) for p in PII_PATTERNS.values())

    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r.doc_id: (r.red, r.n)
        for r in df.select(
            "doc_id",
            redact_pii(F.col("text")).alias("red"),
            pii_count(F.col("text")).alias("n"),
        ).collect()
    }
    for did, text in docs:
        assert out[did] == (py_redact(text), py_count(text)), f"doc {did}"
    # semantic spot checks, not just engine parity
    assert "<EMAIL>" in out[1][0] and "<PHONE>" in out[1][0]
    assert "<IP>" in out[2][0] and "<PHONE>" in out[2][0]
    assert out[3] == (docs[2][1], 0)  # near-misses untouched
    assert out[6] == ("", 0)


def _py_next_fit(items: list[tuple[int, int]], max_tokens: int):
    """(id, n_tokens) in id order -> {id: (seq, offset)} greedy next-fit."""
    out, seq, acc = {}, 0, 0
    for did, t in sorted(items):
        if acc > 0 and acc + t > max_tokens:
            seq, acc = seq + 1, 0
        out[did] = (seq, acc)
        acc += t
    return out


def test_pack_sequences_matches_greedy_reference(spark):
    from solarpaneldatawrangler_spark.operators.packing import (
        PACK_SHARD_BITS,
        pack_sequences,
    )

    docs = [
        (i, " ".join(["tok"] * n))
        for i, n in [(1, 30), (2, 40), (3, 50), (4, 10), (5, 200), (6, 5), (7, 64)]
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pack_sequences(df, max_tokens=100, n_shards=1).collect()
    got = {r.doc_id: (r.pack_id, r.pack_offset, r.n_tokens) for r in out}

    expect = _py_next_fit([(i, len(t.split())) for i, t in docs], 100)
    assert {d: (p, o) for d, (p, o, _) in got.items()} == expect
    # the oversized doc (200 > 100) gets its own pack, never dropped
    assert got[5][1] == 0 and got[5][2] == 200
    packs: dict[int, int] = {}
    for did, (p, o, n) in got.items():
        packs[p] = packs.get(p, 0) + n
    for p, total in packs.items():
        members = [d for d, (pp, _, _) in got.items() if pp == p]
        assert total <= 100 or len(members) == 1, (p, total)


def test_pack_sequences_sharding(spark):
    from solarpaneldatawrangler_spark.operators.packing import (
        PACK_SHARD_BITS,
        pack_sequences,
    )

    docs = [(i, " ".join(["w"] * (10 + i % 7))) for i in range(50)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pack_sequences(df, max_tokens=32, n_shards=4).collect()
    assert len(out) == 50  # every doc assigned exactly once
    for r in out:
        assert r.shard == r.doc_id % 4
        assert (r.pack_id >> PACK_SHARD_BITS) == r.shard
    # each shard independently equals the single-threaded greedy
    for s in range(4):
        items = [(i, 10 + i % 7) for i in range(50) if i % 4 == s]
        expect = _py_next_fit(items, 32)
        got = {
            r.doc_id: (r.pack_id & ((1 << PACK_SHARD_BITS) - 1), r.pack_offset)
            for r in out
            if r.shard == s
        }
        assert got == expect

    with pytest.raises(ValueError):
        pack_sequences(df, max_tokens=0)
    with pytest.raises(ValueError):
        pack_sequences(df, max_tokens=10, n_shards=0)


def test_pack_sequences_null_text_and_null_id(spark):
    """Raw-scrape robustness: null text packs as 0 tokens (instead of a
    NaN crash inside the UDF); a null id fails LOUDLY with a clear
    message, since pack order derives from ids."""
    from solarpaneldatawrangler_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(1, "five tokens of text here"), (2, None), (3, "short doc")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_tokens for r in pack_sequences(df, max_tokens=10).collect()}
    assert got == {1: 5, 2: 0, 3: 2}

    bad = spark.createDataFrame(
        [(None, "orphan row"), (4, "ok")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="null doc_id"):
        pack_sequences(bad, max_tokens=10).collect()


def test_corpus_data_card_semantics(spark):
    from solarpaneldatawrangler_spark.operators.curation import (
        corpus_data_card,
    )

    rows = [
        (1, "the cat sat on the mat today", "en"),
        (2, "the cat sat on the mat today", "en"),   # exact dup of 1
        (3, "unique english text here now", "en"),
        (4, "el gato esta aqui hoy mismo", "es"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    card = {r["key"]: r for r in corpus_data_card(docs).collect()}
    assert set(card) == {"en", "es", "<all>"}
    assert card["en"]["n_docs"] == 3.0
    assert card["es"]["n_docs"] == 1.0
    assert card["<all>"]["n_docs"] == 4.0
    # docs 1+2 are the duplicated pair: 2/3 of en, 0 of es, 2/4 overall
    assert abs(card["en"]["dup_frac_r"] - round(2 / 3, 6)) < 1e-9
    assert card["es"]["dup_frac_r"] == 0.0
    assert card["<all>"]["dup_frac_r"] == 0.5
    # all docs are 6-7 tokens: median within range, quality in [0, 1]
    assert 5 <= card["<all>"]["median_tokens_r"] <= 8
    assert 0.0 <= card["<all>"]["mean_quality_r"] <= 1.0


def test_corpus_data_card_approx_agrees_with_exact(spark, sf_dir):
    """approx=True (percentile_approx sketch, the 100 TB path) must
    agree with the exact card on small data: identical counts, dup
    fractions, and mean quality (those stay exact in both modes), and
    token percentiles within the sketch's one-value granularity (the
    GK sketch returns an actual data value; exact percentile
    interpolates between neighbors)."""
    from solarpaneldatawrangler_spark.operators.curation import (
        corpus_data_card,
    )
    from solarpaneldatawrangler_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents")
    exact = {r["key"]: r for r in corpus_data_card(docs).collect()}
    approx = {r["key"]: r for r in corpus_data_card(docs, approx=True).collect()}
    assert set(exact) == set(approx)
    for k in exact:
        assert approx[k]["n_docs"] == exact[k]["n_docs"]
        assert approx[k]["dup_frac_r"] == exact[k]["dup_frac_r"]
        assert approx[k]["mean_quality_r"] == exact[k]["mean_quality_r"]
        for col in ("median_tokens_r", "p90_tokens_r"):
            # within 2% or 2 tokens, whichever is looser
            tol = max(2.0, 0.02 * exact[k][col])
            assert abs(approx[k][col] - exact[k][col]) <= tol, (
                k, col, approx[k][col], exact[k][col]
            )


def test_write_corpus_jsonl_roundtrip_and_verify(spark, sf_dir, tmp_path):
    """JSONL release sink: shards + _manifest.json; verify_corpus_jsonl
    passes on the untouched output, catches a tampered shard, and the
    manifest counts reconcile with the input."""
    import json
    import os

    from solarpaneldatawrangler_spark.operators.curation import (
        verify_corpus_jsonl,
        write_corpus_jsonl,
    )
    from solarpaneldatawrangler_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    out = str(tmp_path / "release")
    manifest = write_corpus_jsonl(docs, out, n_shards=4)
    assert manifest["total_docs"] == docs.count()
    assert set(manifest["shards"]) == {"0", "1", "2", "3"}
    # on-disk manifest identical to the returned one
    with open(os.path.join(out, "_manifest.json")) as f:
        assert json.load(f) == manifest
    # read back: all docs present, shard assignment deterministic
    back = spark.read.json(out)
    assert back.count() == manifest["total_docs"]
    assert set(back.columns) >= {"doc_id", "text", "lang", "shard", "shard_pos"}
    assert verify_corpus_jsonl(spark, out) is True

    # tamper with one shard file: verify must name the shard
    import glob

    victim = sorted(glob.glob(os.path.join(out, "shard=2", "part-*")))[0]
    with open(victim, "a") as f:
        f.write('{"doc_id": 999999999, "text": "injected", "lang": "xx", "shard_pos": 1}\n')
    # drop Hadoop's local-FS .crc sidecar so the byte-level checksum
    # doesn't mask the CONTENT check we're testing (on object stores
    # there is no sidecar — the manifest hash is the only guard)
    crc = os.path.join(os.path.dirname(victim), f".{os.path.basename(victim)}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="shard 2 diverges"):
        verify_corpus_jsonl(spark, out)


def test_write_corpus_jsonl_empty_corpus(spark, tmp_path):
    """A fully-gated-out corpus releases zero shards; verify must
    accept the empty release instead of failing schema inference."""
    from solarpaneldatawrangler_spark.operators.curation import (
        verify_corpus_jsonl,
        write_corpus_jsonl,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = str(tmp_path / "empty_release")
    m = write_corpus_jsonl(empty, out, n_shards=4)
    assert m["total_docs"] == 0 and m["shards"] == {}
    assert verify_corpus_jsonl(spark, out) is True


def test_write_corpus_jsonl_rejects_unstable_types(spark, tmp_path):
    """Decimal/timestamp columns don't JSON-round-trip stably (the
    verify hash would flag pristine copies) — reject at write."""
    from solarpaneldatawrangler_spark.operators.curation import (
        write_corpus_jsonl,
    )

    df = spark.createDataFrame(
        [(1, "x")], "doc_id long, text string"
    ).withColumn("price", F.lit("1.50").cast("decimal(10,2)"))
    with pytest.raises(ValueError, match="price"):
        write_corpus_jsonl(df, str(tmp_path / "rel"), n_shards=2)


def test_verify_corpus_jsonl_all_null_column(spark, tmp_path):
    """A column null in every row is dropped by JSON schema inference;
    verify must restore it instead of failing on a missing column."""
    from solarpaneldatawrangler_spark.operators.curation import (
        verify_corpus_jsonl,
        write_corpus_jsonl,
    )

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", None)],
        "doc_id long, text string, note string",
    )
    out = str(tmp_path / "rel_nulls")
    write_corpus_jsonl(df, out, n_shards=2)
    assert verify_corpus_jsonl(spark, out) is True


def test_canonical_url_rules_and_sql_parity(spark):
    """URL canonicalization (operators/curation.canonical_url, r10):
    lowercase, fragment dropped, tracking params stripped (order of
    survivors preserved), trailing path slash normalized, '?' dropped
    when no params survive — and the DuckDB twin emits byte-identical
    keys for every case."""
    import duckdb

    from pyspark.sql import functions as F

    from solarpaneldatawrangler_spark.operators.curation import (
        canonical_url,
        canonical_url_sql,
        url_first_seen,
    )

    cases = [
        ("https://Example.COM/Path/?utm_source=x&id=3&fbclid=z#frag",
         "https://example.com/path?id=3"),
        ("http://a.com/p?utm_medium=email&gclid=123",
         "http://a.com/p"),
        ("https://a.com/p?b=2&a=1", "https://a.com/p?b=2&a=1"),
        ("https://a.com/", "https://a.com"),
        ("https://a.com/p#only-frag", "https://a.com/p"),
        ("  https://a.com/p?x=1  ", "https://a.com/p?x=1"),
        ("https://a.com/p?utm_a=1&&x=2", "https://a.com/p?x=2"),
        # second literal '?' stays inside the query (first-'?' split;
        # a LAST-'?' split dropped a=1 and diverged from the SQL twin)
        ("https://a.com/p?a=1?b=2", "https://a.com/p?a=1?b=2"),
        # valueless tracking params are stripped like valued ones,
        # and near-name params survive
        ("https://a.com/p?fbclid", "https://a.com/p"),
        ("https://a.com/p?utm_x&id=1", "https://a.com/p?id=1"),
        ("https://a.com/p?fbclidx=1", "https://a.com/p?fbclidx=1"),
        # NULL canonicalizes as '' (the repo NULL->'' key contract)
        (None, ""),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                               "i long, url string")
    got = {r.i: r.c for r in df.select(
        "i", canonical_url(F.col("url")).alias("c")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i])
    values = ", ".join(
        f"({i}, " + ("NULL" if u is None else "'" + u.replace("'", "''") + "'") + ")"
        for i, (u, _) in enumerate(cases)
    )
    duck = duckdb.connect().execute(
        f"SELECT i, {canonical_url_sql('url')} FROM (VALUES {values}) "
        "t(i, url)"
    ).fetchall()
    assert {i: c for i, c in duck} == got

    # first-seen verdict: min id per canonical key wins; NULL URLs
    # share the '' key and every row SURVIVES (no NULL-join-key loss)
    dup = spark.createDataFrame(
        [(1, "https://A.com/p?utm_x=1"), (2, "https://a.com/p/"),
         (3, "https://a.com/q"), (4, None), (5, None)],
        "doc_id long, url string",
    )
    first = {r.doc_id: (r.canon_url, r.url_first)
             for r in url_first_seen(dup).collect()}
    assert len(first) == 5
    assert first[1] == ("https://a.com/p", True)
    assert first[2] == ("https://a.com/p", False)
    assert first[3] == ("https://a.com/q", True)
    assert first[4] == ("", True) and first[5] == ("", False)
