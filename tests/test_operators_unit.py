"""Unit tests: upsert/dedup semantics, grid dilation/GC goldens
(FIXTURES.md §2), multimodal plumbing, incremental remainder."""

from __future__ import annotations

from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.operators.grid import dilate, enumerate_grid, gc_retention
from solarpaneldatawrangler_spark.operators.multimodal import (
    classify_tiles,
    decode_image,
    fake_image,
    slice_grid,
    stitch_3x3,
)
from solarpaneldatawrangler_spark.operators.relational import (
    dedup_by_key,
    incremental_remainder,
    upsert_by_key,
)


def test_upsert_ignores_conflicts(spark):
    existing = spark.createDataFrame(
        [(1, 1, 21, "a"), (2, 2, 21, "b")], "row long, column long, zoom int, v string"
    )
    incoming = spark.createDataFrame(
        [(1, 1, 21, "NEW"), (3, 3, 21, "c"), (3, 3, 21, "c-dup")],
        "row long, column long, zoom int, v string",
    )
    out = upsert_by_key(existing, incoming, ["row", "column", "zoom"])
    got = {(r.row, r.column): r.v for r in out.collect()}
    assert got[(1, 1)] == "a"  # conflict ignored, existing wins
    assert got[(2, 2)] == "b"
    assert (3, 3) in got and got[(3, 3)] in ("c", "c-dup")
    assert out.count() == 3


def test_dedup_by_key_deterministic_winner(spark):
    df = spark.createDataFrame(
        [(1, 10, "late"), (1, 5, "early"), (2, 7, "only")], "k long, ord long, v string"
    )
    out = {r.k: (r.ord, r.v) for r in dedup_by_key(df, ["k"], "ord").collect()}
    assert out == {1: (5, "early"), 2: (7, "only")}


def test_incremental_remainder(spark):
    universe = spark.createDataFrame([(i,) for i in range(10)], "id long")
    done = spark.createDataFrame([(i,) for i in range(0, 10, 2)], "id long")
    rest = sorted(r.id for r in incremental_remainder(universe, done, ["id"]).collect())
    assert rest == [1, 3, 5, 7, 9]


def test_dilate_golden(spark):
    df = spark.createDataFrame([(5, 5), (6, 5)], "column long, row long")
    out = {(r.column, r.row) for r in dilate(df).collect()}
    expected = {(c, r) for c in range(4, 8) for r in range(4, 7)}
    assert out == expected  # 4x3 block from two horizontally-adjacent seeds


def test_gc_retention_golden(spark):
    tiles = spark.createDataFrame(
        [(c, r) for c in range(10) for r in range(10)], "column long, row long"
    )
    pos = spark.createDataFrame([(5, 5)], "column long, row long")
    doomed = {(r.column, r.row) for r in gc_retention(tiles, pos).collect()}
    survivors = {(c, r) for c in range(4, 7) for r in range(4, 7)}
    assert doomed == {(c, r) for c in range(10) for r in range(10)} - survivors


def test_enumerate_grid_golden(spark):
    bboxes = spark.createDataFrame(
        [("a", 0, 2, 10, 11)], "name string, xmin long, xmax long, ymin long, ymax long"
    )
    cells = {(r.column, r.row) for r in enumerate_grid(bboxes).collect()}
    assert cells == {(c, r) for c in range(0, 3) for r in range(10, 12)}


def test_fake_image_roundtrip():
    img = fake_image(1280, 1280, b"seed")
    assert decode_image(img) == (1280, 1280)


def test_slice_grid_fanout(spark):
    imgs = spark.createDataFrame(
        [(100, 200, 21, fake_image(1280, 1280, b"x"))],
        "column long, row long, zoom int, content binary",
    )
    out = slice_grid(imgs, grid_size=5)
    rows = out.collect()
    assert len(rows) == 25
    coords = {(r.column, r.row) for r in rows}
    assert coords == {(100 + dc, 200 + dr) for dc in range(5) for dr in range(5)}
    assert all(decode_image(bytes(r.content)) == (256, 256) for r in rows)


def test_stitch_and_classify(spark):
    tiles = spark.createDataFrame(
        [(c, r, 21, fake_image(256, 256, bytes([c, r]))) for c in range(3) for r in range(3)],
        "column long, row long, zoom int, content binary",
    )
    stitched = stitch_3x3(tiles)
    got = {(r.column, r.row): r.n_neighbors for r in stitched.collect()}
    assert len(got) == 9  # every input tile gets a stitched context image
    assert got[(1, 1)] == 8  # center has all 8 neighbors
    assert got[(0, 0)] == 3  # corner has 3
    scored = classify_tiles(stitched)
    rows = scored.collect()
    assert len(rows) == 9
    assert all(0.0 <= r.panel_softmax <= 1.0 for r in rows)


def test_streaming_windowed_counts(spark, sf_dir):
    from solarpaneldatawrangler_spark.sources.star import load_table
    from solarpaneldatawrangler_spark.streaming.incremental import windowed_event_counts

    ev = load_table(spark, sf_dir, "events")
    out = windowed_event_counts(ev)
    assert out.count() > 0
    # batch twin consistency: total events preserved
    assert out.agg(F.sum("n")).collect()[0][0] == ev.count()


def test_codec_pixel_golden_slice_stitch_upsample(spark):
    # the codec-injection seam with REAL pixels: a NumpyCodec-encoded
    # super-image slices into exact pixel windows, stitches into an
    # exact 3x3 canvas, and upsamples by pixel replication — proving a
    # production codec (PIL) drops into the same protocol
    import numpy as np

    from solarpaneldatawrangler_spark.operators.multimodal import (
        NumpyCodec,
        deterministic_pixels,
        slice_grid,
        stitch_3x3,
        upsample_tiles,
    )

    codec = NumpyCodec()
    grid, t = 3, 4  # 12x12 super-image, 4px tiles
    super_arr = deterministic_pixels(grid * t, grid * t, b"golden", 3)
    sup = spark.createDataFrame(
        [(0, 0, 21, bytearray(codec.encode(super_arr)))],
        "column long, row long, zoom int, content binary",
    )
    tiles = slice_grid(sup, grid_size=grid, codec=codec)
    got = {(r.column, r.row): codec.decode(bytes(r.content)) for r in tiles.collect()}
    assert set(got) == {(c, r) for c in range(grid) for r in range(grid)}
    for (c, r), arr in got.items():
        expect = super_arr[r * t : (r + 1) * t, c * t : (c + 1) * t]
        assert np.array_equal(arr, expect), f"tile {(c, r)} pixels differ"

    stitched = stitch_3x3(tiles, codec=codec)
    center = next(
        codec.decode(bytes(r.content))
        for r in stitched.collect()
        if (r.column, r.row) == (1, 1)
    )
    # the (1,1) center has all 9 neighbors: its canvas IS the super-image
    assert np.array_equal(center, super_arr)
    # a corner's canvas is black where neighbors are missing
    corner = next(
        codec.decode(bytes(r.content))
        for r in stitched.collect()
        if (r.column, r.row) == (0, 0)
    )
    assert (corner[: t, : t] == 0).all()          # no (-1,-1) neighbor
    assert np.array_equal(corner[t : 2 * t, t : 2 * t], got[(0, 0)])

    up = upsample_tiles(tiles, factor=2, codec=codec)
    up00 = next(
        codec.decode(bytes(r.content)) for r in up.collect() if (r.column, r.row) == (0, 0)
    )
    assert up00.shape == (2 * t, 2 * t, 3)
    assert np.array_equal(up00[::2, ::2], got[(0, 0)])  # nearest-neighbor
    assert np.array_equal(up00[1::2, 1::2], got[(0, 0)])


def test_q62_pixel_golden(spark, sf_dir):
    # q62 runs real pixels through the NumpyCodec seam; its aggregate is
    # fully deterministic (sha-keystream pixels, ordered doc take) so the
    # output is pinned exactly — the pixel-level golden under the r12
    # VALUES-oracle driver hash (this test pins literal values a mirror
    # bug could never shift)
    from solarpaneldatawrangler_spark.plans import CATALOG

    rows = CATALOG["q62_multimodal_pipeline"].fn(spark, sf_dir).collect()
    # 'pipeline' half: the r1-r9 golden, unchanged under the r10 tag
    # schema (a=zoom, b=n_tiles, v=n_positive)
    pipeline = [(r.a, r.b, r.v) for r in rows if r.method == "pipeline"]
    assert pipeline == [(21, 500, 384)]
    # 'imagedup' half (absorbed q86): the 30 planted even/odd twins and
    # nothing else — recall + zero false pairs at hamming 0
    dup = sorted((r.a, r.b, r.v) for r in rows if r.method == "imagedup")
    assert dup == [(2 * i, 2 * i + 1, 0) for i in range(30)]
    # 'tilefp' half (r12): one 60-bit md5 fingerprint per stitched tile,
    # positive and distinct per coordinate (canvases differ); the exact
    # values are pinned by the q62 VALUES oracle in test_oracle_queries
    fps = [(r.a, r.b, r.v) for r in rows if r.method == "tilefp"]
    assert len(fps) == 500
    assert all(v >= 0 for _, _, v in fps)
    assert len({(a, b) for a, b, _ in fps}) == 500


def test_stratified_hash_sample(spark, sf_dir):
    """Deterministic per-stratum sampling: rates hold approximately,
    reruns select identical rows, and DuckDB replays the exact md5
    membership function."""
    import duckdb

    from solarpaneldatawrangler_spark.operators.sampling import (
        stratified_hash_sample,
    )
    from solarpaneldatawrangler_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents")
    # testdata strata are src0..src19, 25 docs each at sf0.01
    rates = {"src1": 0.3, "src2": 1.0}
    out = stratified_hash_sample(docs, "source", rates, id_col="doc_id")

    per_source = dict(docs.groupBy("source").count().collect())
    kept = dict(out.groupBy("source").count().collect())
    assert per_source.get("src1") and per_source.get("src2"), per_source
    assert kept["src2"] == per_source["src2"]  # rate 1.0 keeps everything
    frac = kept.get("src1", 0) / per_source["src1"]
    assert 0.05 < frac < 0.6, frac  # rate 0.3 on a 25-doc stratum
    # strata without a rate default to dropped
    assert set(kept) <= set(rates)

    ids1 = sorted(r.doc_id for r in out.select("doc_id").collect())
    ids2 = sorted(
        r.doc_id
        for r in stratified_hash_sample(docs, "source", rates, id_col="doc_id")
        .select("doc_id")
        .collect()
    )
    assert ids1 == ids2  # rerun-stable

    # cross-engine replay of the md5 membership function
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    oracle_ids = sorted(
        r[0]
        for r in con.execute(
            """
            SELECT doc_id FROM documents
            WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       AS DOUBLE) / 4294967296.0
                  < CASE source WHEN 'src1' THEN 0.3 WHEN 'src2' THEN 1.0 ELSE 0.0 END
            """
        ).fetchall()
    )
    assert ids1 and ids1 == oracle_ids


def test_frame_sample_exact_frames(spark):
    """Frame sampling: every_n indices, millisecond timestamps, and the
    sampled frames decode to the EXACT source pixels."""
    import numpy as np

    from solarpaneldatawrangler_spark.operators.multimodal import (
        NumpyCodec,
        NumpyVideoCodec,
        frame_sample,
    )

    rng = np.random.default_rng(7)
    vids = []
    frames_by_id = {}
    for vid, n_frames in [(1, 25), (2, 7), (3, 1)]:
        frames = rng.integers(0, 256, size=(n_frames, 4, 6, 3), dtype=np.uint8)
        frames_by_id[vid] = frames
        vids.append((vid, bytearray(NumpyVideoCodec.encode(frames))))
    df = spark.createDataFrame(vids, "video_id long, content binary")

    out = frame_sample(df, every_n=10, fps=30.0).collect()
    got = {(r.video_id, r.frame_idx): r for r in out}
    assert set(got) == {(1, 0), (1, 10), (1, 20), (2, 0), (3, 0)}
    codec = NumpyCodec()
    for (vid, idx), r in got.items():
        assert r.ts_ms == int(idx * 1000.0 / 30.0)
        assert np.array_equal(codec.decode(bytes(r.frame)), frames_by_id[vid][idx])


def test_audio_features_windows(spark):
    """PCM16 DSP: silence -> rms 0; a full-scale square wave -> rms ~1,
    high zero-crossing rate; window count = samples // hop."""
    import numpy as np

    from solarpaneldatawrangler_spark.operators.multimodal import audio_features

    sr, frame_ms = 16_000, 25
    hop = sr * frame_ms // 1000  # 400 samples
    silence = np.zeros(3 * hop, dtype="<i2")
    # square wave alternating every sample at full scale
    sq = (np.where(np.arange(2 * hop) % 2 == 0, 32767, -32767)).astype("<i2")
    df = spark.createDataFrame(
        [(1, bytearray(silence.tobytes())), (2, bytearray(sq.tobytes()))],
        "audio_id long, content binary",
    )
    rows = audio_features(df, frame_ms=frame_ms, sample_rate=sr).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.audio_id, []).append(r)
    assert len(by_id[1]) == 3 and len(by_id[2]) == 2
    assert all(r.rms == 0.0 and r.zcr == 0.0 and r.peak == 0.0 for r in by_id[1])
    for r in by_id[2]:
        assert abs(r.rms - 1.0) < 1e-4
        assert r.zcr > 0.99
        assert abs(r.peak - 1.0) < 1e-4


def test_stratified_sample_rate_monotonicity(spark, sf_dir):
    """Hash-bucket sampling is MONOTONE: raising a stratum's rate only
    ADDS documents, never swaps them -- the property that lets a corpus
    grow from 10% to 30% without invalidating work done on the 10%
    (per-partition RNG sampling has no such guarantee)."""
    from solarpaneldatawrangler_spark.operators.sampling import (
        stratified_hash_sample,
    )
    from solarpaneldatawrangler_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents")
    prev: set[int] = set()
    for rate in (0.1, 0.3, 0.6, 1.0):
        ids = {
            r.doc_id
            for r in stratified_hash_sample(
                docs, "source", {f"src{i}": rate for i in range(20)}
            ).collect()
        }
        assert prev <= ids, f"rate {rate} dropped previously-selected docs"
        prev = ids
    assert len(prev) == docs.count()  # rate 1.0 keeps everything


def test_bilinear_upsample_golden(spark):
    """bilinear_resize: hand-computed 2x2 -> 4x4 golden (half-pixel
    centers), constant-image invariance, and the mode='bilinear' path
    through the upsample_tiles operator."""
    import numpy as np

    from solarpaneldatawrangler_spark.operators.multimodal import (
        NumpyCodec,
        bilinear_resize,
        upsample_tiles,
    )

    src = np.array([[0, 200], [100, 40]], dtype=np.uint8)[:, :, None]
    got = bilinear_resize(src, 4, 4)[:, :, 0]
    expect = np.array(
        [
            [0, 50, 150, 200],
            [25, 59, 126, 160],
            [75, 76, 79, 80],
            [100, 85, 55, 40],
        ],
        dtype=np.uint8,
    )
    assert np.array_equal(got, expect), got

    flat = np.full((5, 7, 3), 123, dtype=np.uint8)
    assert (bilinear_resize(flat, 10, 14) == 123).all()

    codec = NumpyCodec()
    tiles = spark.createDataFrame(
        [(0, 0, 21, bytearray(codec.encode(np.dstack([src[:, :, 0]] * 3))))],
        "column long, row long, zoom int, content binary",
    )
    up = upsample_tiles(tiles, factor=2, codec=codec, mode="bilinear").collect()
    arr = codec.decode(bytes(up[0].content))
    assert arr.shape == (4, 4, 3)
    assert np.array_equal(arr[:, :, 0], expect)

    import pytest

    with pytest.raises(ValueError, match="nearest|bilinear|lanczos"):
        upsample_tiles(tiles, codec=codec, mode="bicubic")


def test_lanczos_resize_properties_and_operator_path(spark):
    """lanczos_resize (r11, closing the carried LANCZOS-fidelity nit):
    the reference's PIL Image.resize(..., LANCZOS) algorithm in pure
    NumPy — windowed-sinc kernel, half-pixel centers, scale-stretched
    support on downsample. Properties that pin the algorithm: exact
    identity at same size (sinc hits integer zeros), exact DC
    preservation (normalized weights), mirror equivariance (symmetric
    kernel), antialiased downsample (1-px checkerboard at 4x down
    averages to mid-gray instead of aliasing to one phase — bilinear's
    2-tap kernel can't do this at stride 4), overshoot clipped to
    uint8, plus the mode='lanczos' path through upsample_tiles."""
    import numpy as np

    from solarpaneldatawrangler_spark.operators.multimodal import (
        NumpyCodec,
        lanczos_resize,
        upsample_tiles,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 12, 3), dtype=np.uint8)
    assert (lanczos_resize(img, 16, 12) == img).all()  # identity exact

    flat = np.full((9, 7, 3), 123, dtype=np.uint8)
    assert (lanczos_resize(flat, 18, 14) == 123).all()
    assert (lanczos_resize(flat, 4, 3) == 123).all()  # DC on downsample

    up = lanczos_resize(img, 32, 24)
    assert np.array_equal(
        lanczos_resize(img[:, ::-1].copy(), 32, 24), up[:, ::-1]
    )

    cb = np.indices((32, 32)).sum(axis=0) % 2 * 255
    cb = np.repeat(cb[:, :, None], 3, axis=2).astype(np.uint8)
    down = lanczos_resize(cb, 8, 8).astype(float)
    assert abs(down.mean() - 127.5) < 8  # antialiased, not phase-locked

    step = np.zeros((8, 16, 1), np.uint8)
    step[:, 8:, :] = 255
    ringy = lanczos_resize(step, 8, 32)
    assert ringy.dtype == np.uint8 and ringy.min() == 0 and ringy.max() == 255

    codec = NumpyCodec()
    tiles = spark.createDataFrame(
        [(0, 0, 21, bytearray(codec.encode(img)))],
        "column long, row long, zoom int, content binary",
    )
    got = upsample_tiles(tiles, factor=2, codec=codec, mode="lanczos").collect()
    arr = codec.decode(bytes(got[0].content))
    assert arr.shape == (32, 24, 3)
    assert np.array_equal(arr, lanczos_resize(img, 32, 24))


def test_pil_codec_drop_in(spark):
    """The production-codec claim, proven the moment the environment has
    PIL: a PIL-backed codec (lossless PNG) implementing the same
    decode/encode protocol must produce pixel-identical results to
    NumpyCodec through slice_grid, stitch_3x3, and upsample_tiles.
    Skips cleanly where PIL is absent (this container)."""
    import pytest

    pytest.importorskip("PIL")
    import io

    import numpy as np
    from PIL import Image

    from solarpaneldatawrangler_spark.operators.multimodal import (
        NumpyCodec,
        deterministic_pixels,
        slice_grid,
        stitch_3x3,
        upsample_tiles,
    )

    class PILCodec:
        def decode(self, content: bytes) -> np.ndarray:
            return np.array(Image.open(io.BytesIO(content)).convert("RGB"))

        def encode(self, arr: np.ndarray) -> bytes:
            buf = io.BytesIO()
            Image.fromarray(np.ascontiguousarray(arr, dtype=np.uint8), "RGB").save(
                buf, format="PNG"
            )
            return buf.getvalue()

    grid, t = 3, 4
    super_arr = deterministic_pixels(grid * t, grid * t, b"pil-golden", 3)

    results = {}
    for name, codec in [("numpy", NumpyCodec()), ("pil", PILCodec())]:
        sup = spark.createDataFrame(
            [(0, 0, 21, bytearray(codec.encode(super_arr)))],
            "column long, row long, zoom int, content binary",
        )
        tiles = slice_grid(sup, grid_size=grid, codec=codec)
        stitched = {
            (r.column, r.row): codec.decode(bytes(r.content))
            for r in stitch_3x3(tiles, codec=codec).collect()
        }
        upped = {
            (r.column, r.row): codec.decode(bytes(r.content))
            for r in upsample_tiles(
                tiles, factor=2, codec=codec, mode="bilinear"
            ).collect()
        }
        results[name] = (stitched, upped)

    for a, b in zip(results["numpy"], results["pil"]):
        assert set(a) == set(b)
        for key in a:
            assert np.array_equal(a[key], b[key]), key


def test_hash_sample_quantiles_deterministic_and_exact_at_rate_one(
    spark, sf_dir
):
    """Rank-select percentile_disc over the md5 hash sample: rate=1
    keeps every row, so q50 must equal the true percentile_disc
    median (numpy 'inverted_cdf' on the sorted values); at rate=0.2
    the estimate is reproducible across repartitionings (membership
    is a pure row function) and lands near the truth."""
    from solarpaneldatawrangler_spark.operators.sampling import (
        hash_sample_quantiles,
    )
    from solarpaneldatawrangler_spark.sources.star import load_table

    li = load_table(spark, sf_dir, "lineitem")
    rid = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit("-"),
        F.col("l_linenumber").cast("string"),
    )
    full = hash_sample_quantiles(
        li, "l_extendedprice", rid, rate=1.0, ps=(0.5,),
        group_cols=["l_returnflag"],
    ).collect()
    import math

    vals = {
        r["l_returnflag"]: sorted(
            x["l_extendedprice"]
            for x in li.select("l_returnflag", "l_extendedprice").collect()
            if x["l_returnflag"] == r["l_returnflag"]
        )
        for r in full
    }
    for r in full:
        v = vals[r["l_returnflag"]]
        assert r["sample_n"] == len(v)
        assert r["q50"] == v[math.ceil(0.5 * len(v)) - 1]

    est1 = hash_sample_quantiles(
        li, "l_extendedprice", rid, rate=0.2, ps=(0.5,),
        group_cols=["l_returnflag"],
    ).collect()
    est2 = hash_sample_quantiles(
        li.repartition(7), "l_extendedprice", rid, rate=0.2, ps=(0.5,),
        group_cols=["l_returnflag"],
    ).collect()
    assert sorted(map(tuple, est1)) == sorted(map(tuple, est2))
    truth = {r["l_returnflag"]: r["q50"] for r in full}
    for r in est1:
        assert r["sample_n"] < len(vals[r["l_returnflag"]])
        rel = abs(r["q50"] - truth[r["l_returnflag"]]) / truth[
            r["l_returnflag"]
        ]
        assert rel < 0.05, (r, truth)


def test_corpus_diff_content_identity_and_statuses(spark):
    """Diff is by CONTENT: a renamed doc_id with identical text is
    'kept', a re-crawled duplicate collapses to one kept fingerprint,
    edits show as add+remove, and NULL text diffs as '' (the store
    fingerprint rule). Group col rides along (new side wins)."""
    from solarpaneldatawrangler_spark.operators.dedup import corpus_diff

    old = spark.createDataFrame(
        [
            (1, "alpha doc", "web"),
            (2, "beta doc", "web"),
            (3, "gamma doc", "wiki"),
            (4, None, "web"),
        ],
        "doc_id long, text string, source string",
    )
    new = spark.createDataFrame(
        [
            (10, "alpha doc", "web"),      # renamed id -> kept
            (11, "alpha doc", "web"),      # re-crawl dup -> same row
            (12, "beta doc EDITED", "web"),  # edit -> added (+removed)
            (3, "gamma doc", "wiki"),
            (13, None, "wiki"),            # NULL == NULL -> kept
        ],
        "doc_id long, text string, source string",
    )
    d = corpus_diff(old, new, group_cols=["source"])
    rows = {(r["status"], r["source"]) for r in d.collect()}
    counts = {
        s: n
        for s, n in d.groupBy("status").count().collect()
    }
    assert counts == {"kept": 3, "added": 1, "removed": 1}, counts
    assert ("added", "web") in rows      # the edited text
    assert ("removed", "web") in rows    # the old beta
    # NULL-text fingerprints matched across snapshots; new side's
    # source (wiki) wins for kept rows
    assert ("kept", "wiki") in rows


def test_corpus_diff_matches_set_algebra_reference(spark):
    """Property-style check against a driver-side reference: for a
    seeded random pair of snapshots (with dups, renames, NULLs, and
    whitespace variants), corpus_diff's statuses must equal plain set
    algebra over the normalized-content keys."""
    import random
    import re

    rng = random.Random(42)
    texts = [f"doc body {i}" for i in range(80)] + [None, "", "  "]
    old_rows = [
        (i, rng.choice(texts), rng.choice(["web", "wiki"]))
        for i in range(200)
    ]
    new_rows = [
        (1000 + i, rng.choice(texts), rng.choice(["web", "wiki"]))
        for i in range(200)
    ]
    old = spark.createDataFrame(
        old_rows, "doc_id long, text string, source string"
    )
    new = spark.createDataFrame(
        new_rows, "doc_id long, text string, source string"
    )

    def norm(t):
        return re.sub(r"\s+", " ", (t or "").strip().lower())

    o_keys = {norm(t) for _, t, _ in old_rows}
    n_keys = {norm(t) for _, t, _ in new_rows}
    want = {
        "added": len(n_keys - o_keys),
        "removed": len(o_keys - n_keys),
        "kept": len(o_keys & n_keys),
    }
    from solarpaneldatawrangler_spark.operators.dedup import corpus_diff

    got = {
        r["status"]: r["count"]
        for r in corpus_diff(old, new).groupBy("status").count().collect()
    }
    assert {k: v for k, v in want.items() if v} == got, (want, got)
