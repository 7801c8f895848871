"""Hypothesis property tests (SURVEY §5.4) for the pure algorithmic
kernels that have no SQL oracle: projection inverses, union-ring
invariants, minhash containment."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from solarpaneldatawrangler_spark.operators.geometry import union_ring_of_cells


def _deg2num(lon, lat, zoom):
    lat_rad = math.radians(lat)
    n = 2.0 ** zoom
    return (
        int((lon + 180.0) / 360.0 * n),
        int((1.0 - math.log(math.tan(lat_rad) + 1 / math.cos(lat_rad)) / math.pi) / 2.0 * n),
    )


def _num2deg(c, r, zoom, center=True):
    if center:
        c, r = c + 0.5, r + 0.5
    n = 2.0 ** zoom
    lon = c / n * 360.0 - 180.0
    lat = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * r / n))))
    return lon, lat


@settings(max_examples=200, deadline=None)
@given(
    c=st.integers(min_value=0, max_value=2**15 - 1),
    r=st.integers(min_value=0, max_value=2**15 - 1),
)
def test_projection_roundtrip_zoom15(c, r):
    """num2deg(center) then deg2num returns the SAME tile — the invariant
    the engine's priority-scan and report geometry rely on. (Python-level
    mirror of the Catalyst expressions, which use the identical formulas;
    the Spark-side equivalence is covered by q30/q31 oracle checks.)"""
    lon, lat = _num2deg(c, r, 15)
    assert _deg2num(lon, lat, 15) == (c, r)


@settings(max_examples=100, deadline=None)
@given(
    cells=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=12), st.integers(min_value=0, max_value=12)
        ),
        min_size=1,
        max_size=30,
    )
)
def test_union_ring_invariants(cells):
    """For any 4-connected cell blob: the walked outer ring is closed,
    axis-aligned, non-degenerate, and its shoelace area is >= the blob
    area (equal when there are no holes/disconnections)."""
    # keep only the connected component containing the min cell, so the
    # single-outer-ring contract applies
    cells = set(cells)
    start = min(cells)
    comp, frontier = {start}, [start]
    while frontier:
        c, r = frontier.pop()
        for nb in ((c + 1, r), (c - 1, r), (c, r + 1), (c, r - 1)):
            if nb in cells and nb not in comp:
                comp.add(nb)
                frontier.append(nb)

    ring = union_ring_of_cells(sorted(comp))
    assert ring[0] == ring[-1]
    n = len(ring) - 1
    assert n >= 4
    area = 0.0
    for i in range(n):
        (x1, y1), (x2, y2) = ring[i], ring[i + 1]
        assert (x1 == x2) != (y1 == y2), "edges must be axis-aligned"
        area += x1 * y2 - x2 * y1
    area = abs(area) / 2.0
    assert area >= len(comp)
    # no holes possible with <=30 convex-ish random blobs? holes ARE
    # possible; area only exceeds cell count when a hole is enclosed
    assert area <= len(comp) + 25


_ASCII = st.text(
    # printable ASCII incl. whitespace runs; unicode lower() legitimately
    # differs between Python/Java/DuckDB locale tables, and the engine
    # contract (q66's oracle) is ASCII-ish corpus text
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    max_size=120,
)


@settings(max_examples=6, deadline=None)
@given(texts=st.lists(_ASCII, min_size=1, max_size=10))
def test_winnowing_matches_reference_on_arbitrary_ascii(spark, texts):
    """One Spark batch per example: the DataFrame winnowing must equal
    the pure-Python reference for arbitrary ASCII texts (whitespace
    runs, repeats, empty/short strings, all-tie hash windows)."""
    import hashlib
    import re

    from solarpaneldatawrangler_spark.operators.dedup import winnowing_fingerprints

    k, w = 5, 4

    def ref(text):
        t = re.sub(r"\s+", " ", text.strip().lower())
        n = len(t) - k + 1
        if n < 1:
            return set()
        hs = [
            int(hashlib.md5(t[i:i + k].encode()).hexdigest()[:8], 16)
            for i in range(n)
        ]
        out = set()
        for p in range(w - 1, n):
            lo = p - w + 1
            m = min(hs[lo:p + 1])
            rm = max(i for i in range(lo, p + 1) if hs[i] == m)
            out.add((rm + 1, hs[rm]))
        return out

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {}
    for r in winnowing_fingerprints(df, k=k, w=w).collect():
        got.setdefault(r.id, set()).add((r.fp_pos, r.fp_hash))
    for i, text in enumerate(texts):
        assert got.get(i, set()) == ref(text), (i, text)


@settings(max_examples=200, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab cd"),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=6,
    ),
    n_merges=st.integers(min_value=0, max_value=12),
)
def test_bpe_train_encode_invariants(texts, n_merges):
    """Learned-BPE invariants on arbitrary small corpora: encoding any
    trained-on or unseen word concatenates back to the word (no chars
    created or lost), token count never exceeds char count, and the
    trainer is deterministic."""
    from solarpaneldatawrangler_spark.operators.bpe import (
        encode_word,
        train_bpe_merges,
    )

    merges = train_bpe_merges(texts, n_merges=n_merges)
    assert merges == train_bpe_merges(texts, n_merges=n_merges)
    assert len(merges) <= n_merges
    words = {w for t in texts for w in t.lower().split()} | {"abcd", "dcba"}
    for w in words:
        toks = encode_word(w, merges)
        assert "".join(toks) == w
        assert 1 <= len(toks) <= len(w)


_MARKUPISH = st.lists(
    st.sampled_from(
        list("abc <>/!-&;#\n\t\x0b\r")
        + ["<p>", "</p>", "<div>", "</div>", "<script>", "</script>",
           "<!--", "-->", "&amp;", "&lt;", "&nbsp;", "<br/>"]
    ),
    min_size=0,
    max_size=60,
).map("".join)


@settings(max_examples=8, deadline=None)
@given(texts=st.lists(_MARKUPISH, min_size=1, max_size=12))
def test_strip_markup_invariants_on_arbitrary_soup(spark, texts):
    """Whatever tag soup comes in, the stripped text satisfies the
    output contract: no intact script/style/comment blocks, no
    whitespace beyond single spaces and blank-line separators, no
    horizontal whitespace other than ' ', trimmed edges, and the
    DuckDB replay (shared pattern constants) agrees byte-for-byte."""
    import duckdb

    from pyspark.sql import functions as F

    from solarpaneldatawrangler_spark.functions.text import (
        strip_markup,
        strip_markup_sql,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, text string"
    )
    got = {
        r.i: r.s
        for r in df.select("i", strip_markup(F.col("text")).alias("s")).collect()
    }
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame(
        {"i": range(len(texts)), "text": texts}))
    want = dict(con.execute(
        f"SELECT i, {strip_markup_sql('text')} FROM t").fetchall())
    import re

    from solarpaneldatawrangler_spark.functions.text import MARKUP_BLOCK_RES

    for i, t in enumerate(texts):
        s = got[i]
        assert s == want[i], (t, s, want[i])
        # no surviving substring matches a block pattern (the operator's
        # regex-level contract: complete script/style/comment BLOCKS are
        # removed; a dangling '<!--' with no '-->' is not a block)
        for pat in MARKUP_BLOCK_RES:
            assert re.search(pat, s) is None, (t, s, pat)
        # whitespace contract
        assert "  " not in s
        assert "\n\n\n" not in s
        assert " \n" not in s and "\n " not in s
        for ch in "\t\x0b\r":
            assert ch not in s
        assert s == s.strip()


@settings(max_examples=25, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ffff"]),
            min_size=0,
            max_size=30,
        ),
        min_size=1,
        max_size=6,
    ),
    k=st.integers(min_value=2, max_value=4),
)
def test_span_removal_matches_naive_coverage(spark, docs, k):
    """remove_duplicate_spans (with the r8 interval-merge coverage)
    must equal the naive per-start reference on arbitrary small-token
    corpora: duplicated k-gram occurrence sets, per-token union
    coverage, and the rebuilt text."""
    from collections import Counter

    from pyspark.sql import functions as F

    from solarpaneldatawrangler_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    got = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(
            spark.createDataFrame(rows, "doc_id int, text string"), k=k
        ).collect()
    }

    # naive reference: count gram OCCURRENCES corpus-wide, mark every
    # token covered by any >=2-occurrence gram's span
    gram_counts: Counter[tuple[str, ...]] = Counter()
    per_doc_grams = {}
    for i, toks in enumerate(docs):
        grams = [tuple(toks[j : j + k]) for j in range(len(toks) - k + 1)]
        per_doc_grams[i] = grams
        gram_counts.update(grams)
    for i, toks in enumerate(docs):
        covered = [False] * len(toks)
        n_dup = 0
        for j, g in enumerate(per_doc_grams[i]):
            if gram_counts[g] >= 2:
                n_dup += 1
                for p in range(j, j + k):
                    covered[p] = True
        kept = [t for t, c in zip(toks, covered) if not c]
        assert got[i]["clean_text"] == " ".join(kept), (i, docs, k)
        assert got[i]["n_tokens"] == len(toks)
        assert got[i]["n_removed"] == sum(covered)
        assert got[i]["n_dup_grams"] == n_dup


@given(
    in_size=st.integers(min_value=1, max_value=200),
    out_size=st.integers(min_value=1, max_value=200),
    a=st.sampled_from([2, 3]),
)
@settings(max_examples=200, deadline=None)
def test_lanczos_weights_invariants(in_size, out_size, a):
    """_lanczos_weights for ANY (in, out, a): rows sum to exactly-ish 1
    (DC preservation), every index in range (safe gather), the window
    straddles each output center, and same-size is one-hot at the
    center tap (identity resize). These hold for up AND down scaling
    including the 1-pixel degenerate axes."""
    import numpy as np

    from solarpaneldatawrangler_spark.operators.multimodal import (
        _lanczos_weights,
    )

    idx, w = _lanczos_weights(in_size, out_size, a)
    assert idx.shape == w.shape and idx.shape[0] == out_size
    assert np.allclose(w.sum(axis=1), 1.0, atol=1e-12)
    assert idx.min() >= 0 and idx.max() < in_size
    scale = in_size / out_size
    centers = (np.arange(out_size) + 0.5) * scale - 0.5
    # the nearest in-bounds pixel to each center carries nonzero weight
    near = np.clip(np.rint(centers).astype(int), 0, in_size - 1)
    hit = (idx == near[:, None]) & (np.abs(w) > 1e-15)
    assert hit.any(axis=1).all()
    if in_size == out_size:
        # identity: exactly one tap per row, weight 1, at pixel i
        nz = np.abs(w) > 1e-12
        assert (nz.sum(axis=1) == 1).all()
        picked = idx[nz]
        assert np.array_equal(picked, np.arange(in_size))
        assert np.allclose(w[nz], 1.0)
