"""Multimodal (image/audio/video) column operators (SURVEY.md §2.9
G4-G8, §2.12).

Design: media are opaque BinaryType columns + typed metadata columns
(schemas.IMAGE_TILES), moved between stages as Arrow batches. The
reference's PIL-based slice/stitch/upsample/preprocess/classify pipeline
(/root/reference/imagery.py:81-209, run_inference.py:95-128) maps to
mapInPandas / applyInPandas operators whose Spark-side plumbing (schema,
grouping, batch shape) is fully real.

Pixel access goes through an INJECTED codec (``codec=`` on every
operator). Two implementations ship:

- ``NumpyCodec`` — a real, dependency-free codec: uncompressed RGB
  arrays with a 12-byte header. Crop/stitch/upsample move actual
  pixels; tests verify pixel-level goldens through it. A PIL/JPEG codec
  drops into the same two-method protocol per executor for production.
- ``codec=None`` — the hash-stub path: payloads are deterministic fake
  blobs (8-byte size header + sha body), pixel ops replaced by seeded
  re-hashing. Keeps catalog queries cheap while exercising identical
  Spark plumbing (schema, shuffle, batch shape).

Scale notes:
- slice (1 fetched 1280^2 image -> 25 tiles of 256^2) is a 1->N
  flatMap: mapInPandas yielding exploded rows, no shuffle.
- stitch (3x3 neighborhood -> 3x tile px) groups by the center-tile
  key: each tile row replicates to the 9 centers it contributes to
  (pure explode) — a single shuffle, no self-join storm.
- upsample (G5, imagery.py:119-146: paste-and-resize when only
  lower-zoom imagery exists) is a narrow per-row transform: no shuffle.
- inference is an iterator pandas UDF: the (mock) model loads once per
  executor python worker, not per batch (reference reloads per process).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRID_SIZE = 5  # 1280 // 256, as in /root/reference/imagery.py:104-110


class NumpyCodec:
    """Real pixel codec with zero native deps: uncompressed uint8 RGB(A)
    arrays, 12-byte header (w, h, channels as big-endian u32). The
    production protocol — ``decode(bytes) -> ndarray``,
    ``encode(ndarray) -> bytes`` — is exactly what a PIL or torchvision
    codec implements; tests prove the seam with pixel-level goldens."""

    def decode(self, content: bytes) -> np.ndarray:
        w = int.from_bytes(content[0:4], "big")
        h = int.from_bytes(content[4:8], "big")
        c = int.from_bytes(content[8:12], "big")
        arr = np.frombuffer(content, dtype=np.uint8, offset=12)
        return arr.reshape(h, w, c)

    def encode(self, arr: np.ndarray) -> bytes:
        h, w, c = arr.shape
        header = (
            w.to_bytes(4, "big") + h.to_bytes(4, "big") + c.to_bytes(4, "big")
        )
        return header + np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def decode_image(content: bytes) -> tuple[int, int]:
    """Stub-path header probe: (width, height) from the 8-byte header of
    a fake payload. Production decoding goes through an injected codec
    (NumpyCodec / PIL), not this."""
    if content is None or len(content) < 8:
        raise NotImplementedError(
            "no imaging library in this environment; deterministic fake "
            "images carry (w,h) in their first 8 bytes"
        )
    w = int.from_bytes(content[0:4], "big")
    h = int.from_bytes(content[4:8], "big")
    return w, h


def fake_image(width: int, height: int, seed: bytes) -> bytes:
    """Deterministic fake image payload for the stub path: 8-byte (w,h)
    header + sha-derived body. Stands in for a JPEG in cheap tests;
    decode_image round-trips the header."""
    body = hashlib.sha256(seed).digest()
    return width.to_bytes(4, "big") + height.to_bytes(4, "big") + body


def deterministic_pixels(width: int, height: int, seed: bytes, channels: int = 3) -> np.ndarray:
    """A real pixel array whose values derive deterministically from the
    seed — sha256 keystream tiled to size. Feeds NumpyCodec tests."""
    n = width * height * channels
    blocks = []
    counter = 0
    while sum(len(b) for b in blocks) < n:
        blocks.append(hashlib.sha256(seed + counter.to_bytes(4, "big")).digest())
        counter += 1
    raw = b"".join(blocks)[:n]
    return np.frombuffer(raw, dtype=np.uint8).reshape(height, width, channels)


def slice_grid(images: DataFrame, grid_size: int = GRID_SIZE, codec=None) -> DataFrame:
    """G4 25-way slice (/root/reference/imagery.py:81-96): one fetched
    super-image at (column,row) -> grid_size^2 tiles with shifted coords.

    The coordinate fan-out is pure Catalyst (explode over a constant
    offset array). With a codec, each tile is the REAL pixel window
    arr[dr*t:(dr+1)*t, dc*t:(dc+1)*t]; without, the stubbed
    deterministic sub-payload.
    """
    offsets = F.array(
        *[
            F.struct(F.lit(dc).alias("dc"), F.lit(dr).alias("dr"))
            for dc in range(grid_size)
            for dr in range(grid_size)
        ]
    )
    fanned = images.withColumn("_o", F.explode(offsets)).select(
        (F.col("column") + F.col("_o.dc")).alias("column"),
        (F.col("row") + F.col("_o.dr")).alias("row"),
        F.col("zoom"),
        F.col("content"),
        F.col("_o.dc").alias("_dc"),
        F.col("_o.dr").alias("_dr"),
    )

    out_schema = "column long, row long, zoom int, content binary"

    def crop(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tile_px = 256
        for pdf in batches:
            if codec is not None:
                cropped = []
                for content, dc, dr in zip(pdf["content"], pdf["_dc"], pdf["_dr"]):
                    arr = codec.decode(bytes(content))
                    t = arr.shape[0] // grid_size
                    win = arr[int(dr) * t : (int(dr) + 1) * t, int(dc) * t : (int(dc) + 1) * t]
                    cropped.append(codec.encode(win))
            else:
                # stub crop: deterministic sub-payload keyed by offset
                cropped = [
                    fake_image(tile_px, tile_px, bytes(content) + bytes([int(dc), int(dr)]))
                    for content, dc, dr in zip(pdf["content"], pdf["_dc"], pdf["_dr"])
                ]
            yield pd.DataFrame(
                {
                    "column": pdf["column"],
                    "row": pdf["row"],
                    "zoom": pdf["zoom"],
                    "content": cropped,
                }
            )

    return fanned.mapInPandas(crop, out_schema)


def stitch_3x3(tiles: DataFrame, codec=None) -> DataFrame:
    """G6 3x3 stitch (/root/reference/imagery.py:196-209): for each tile,
    paste its 8 neighbors around it -> one 3-tile-wide context image.

    Implemented as dilation fan-out + applyInPandas per center tile: each
    tile row is replicated to the 9 centers it contributes to (pure
    explode), grouped by center key — a single shuffle, no self-join
    storm. Missing neighbors are tolerated (reference pastes what
    exists; codec path leaves them black).
    """
    offsets = F.array(
        *[
            F.struct(F.lit(dc).alias("dc"), F.lit(dr).alias("dr"))
            for dc in (-1, 0, 1)
            for dr in (-1, 0, 1)
        ]
    )
    contrib = tiles.withColumn("_o", F.explode(offsets)).select(
        (F.col("column") + F.col("_o.dc")).alias("center_column"),
        (F.col("row") + F.col("_o.dr")).alias("center_row"),
        F.col("zoom"),
        (-F.col("_o.dc")).alias("dc"),
        (-F.col("_o.dr")).alias("dr"),
        F.col("content"),
    )

    out_schema = "column long, row long, zoom int, content binary, n_neighbors int"

    def stitch(key, pdf: pd.DataFrame) -> pd.DataFrame:
        center_column, center_row, zoom = key
        # only emit a stitched image if the center tile itself exists
        has_center = ((pdf["dc"] == 0) & (pdf["dr"] == 0)).any()
        if not has_center:
            return pd.DataFrame(
                columns=["column", "row", "zoom", "content", "n_neighbors"]
            )
        if codec is not None:
            first = codec.decode(bytes(pdf["content"].iloc[0]))
            t, c = first.shape[0], first.shape[2]
            canvas = np.zeros((3 * t, 3 * t, c), dtype=np.uint8)
            for content, dc, dr in zip(pdf["content"], pdf["dc"], pdf["dr"]):
                arr = codec.decode(bytes(content))
                y, x = (int(dr) + 1) * t, (int(dc) + 1) * t
                canvas[y : y + t, x : x + t] = arr
            payload = codec.encode(canvas)
        else:
            ordered = pdf.sort_values(["dr", "dc"])
            seed = b"".join(bytes(c) for c in ordered["content"])
            payload = fake_image(320, 320, seed)
        return pd.DataFrame(
            {
                "column": [center_column],
                "row": [center_row],
                "zoom": [zoom],
                "content": [payload],
                "n_neighbors": [len(pdf) - 1],
            }
        )

    return contrib.groupBy("center_column", "center_row", "zoom").applyInPandas(
        stitch, out_schema
    )


def bilinear_resize(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Separable bilinear resample in pure NumPy (half-pixel sample
    centers, the OpenCV/torchvision align_corners=False convention).
    Closes most of the fidelity gap to the reference's PIL LANCZOS
    (/root/reference/imagery.py:99-100) without an imaging dependency:
    smooth interpolation instead of nearest-neighbor blockiness (LANCZOS
    additionally windows a sinc; visually close at 2x upsample)."""
    h, w, c = arr.shape
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    a = arr.astype(np.float64)
    top = a[y0][:, x0] * (1.0 - wx) + a[y0][:, x1] * wx
    bot = a[y1][:, x0] * (1.0 - wx) + a[y1][:, x1] * wx
    out = top * (1.0 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _lanczos_weights(in_size: int, out_size: int, a: int = 3):
    """Per-output-pixel source indices and normalized Lanczos-a
    (windowed-sinc) weights for one axis — PIL's resample algorithm
    (half-pixel centers; when downsampling the kernel is stretched by
    the scale factor so it averages, not aliases; weights normalized to
    sum 1 so DC is preserved exactly; at borders out-of-range taps are
    DROPPED and the surviving in-bounds window renormalized — PIL's
    edge rule, review-caught: clip-replicating instead hands negative
    sinc lobes to the border pixel and diverges from PIL by several
    uint8 steps on high-contrast borders).
    Returns (idx[out_size, k], w[out_size, k])."""
    scale = in_size / out_size
    fscale = max(scale, 1.0)
    support = a * fscale
    centers = (np.arange(out_size) + 0.5) * scale - 0.5
    left = np.floor(centers - support).astype(np.int64) + 1
    k = int(np.ceil(support)) * 2 + 1
    idx = left[:, None] + np.arange(k)[None, :]
    x = (idx - centers[:, None]) / fscale
    w = np.sinc(x) * np.sinc(x / a) * (np.abs(x) < a)
    w = w * ((idx >= 0) & (idx < in_size))
    # every window contains its center tap, so the sum is never zero
    w = w / w.sum(axis=1, keepdims=True)
    return np.clip(idx, 0, in_size - 1), w


def lanczos_resize(arr: np.ndarray, out_h: int, out_w: int, a: int = 3) -> np.ndarray:
    """Separable Lanczos-a resample in pure NumPy — the reference's
    Image.resize(..., LANCZOS) (/root/reference/imagery.py:99-100)
    re-expressed without an imaging dependency: windowed-sinc kernel,
    half-pixel sample centers, scale-stretched support on downsample,
    PIL's border rule (out-of-range taps dropped, surviving window
    renormalized), per-pixel weight normalization. The convolution
    runs in float64 where PIL uses int32 fixed-point coefficients, so
    values may differ from PIL by the fixed-point quantum (~±1 uint8
    step). Identity-size resize is exact (sinc hits integer zeros)."""
    h, w, _c = arr.shape
    iy, wy = _lanczos_weights(h, out_h, a)
    ix, wx = _lanczos_weights(w, out_w, a)
    f = arr.astype(np.float64)
    # rows: (out_h, k, w, c) x (out_h, k, 1, 1) -> (out_h, w, c)
    tmp = (f[iy] * wy[:, :, None, None]).sum(axis=1)
    # cols: (out_h, out_w, k, c) x (1, out_w, k, 1) -> (out_h, out_w, c)
    out = (tmp[:, ix] * wx[None, :, :, None]).sum(axis=2)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def upsample_tiles(
    tiles: DataFrame, factor: int = 2, codec=None, mode: str = "nearest"
) -> DataFrame:
    """G5 image upsample (/root/reference/imagery.py:119-146: when only
    lower-zoom imagery exists, the quadrant of the parent tile is
    resized up to tile size). A narrow per-row transform through the
    injected codec — no shuffle; swap the codec (PIL) without touching
    the plan.

    ``mode``: "nearest" (np.repeat pixel replication — exact-golden
    friendly), "bilinear" (bilinear_resize — smooth, cheap), or
    "lanczos" (lanczos_resize — the reference's PIL LANCZOS algorithm,
    windowed-sinc; the fidelity path).
    """
    if codec is None:
        raise NotImplementedError(
            "upsample needs real pixels: inject a codec (NumpyCodec or PIL)"
        )
    if mode not in ("nearest", "bilinear", "lanczos"):
        raise ValueError(f"mode must be nearest|bilinear|lanczos, got {mode!r}")
    out_schema = "column long, row long, zoom int, content binary"

    def up(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for content in pdf["content"]:
                arr = codec.decode(bytes(content))
                if mode == "bilinear":
                    big = bilinear_resize(
                        arr, arr.shape[0] * factor, arr.shape[1] * factor
                    )
                elif mode == "lanczos":
                    big = lanczos_resize(
                        arr, arr.shape[0] * factor, arr.shape[1] * factor
                    )
                else:
                    big = np.repeat(np.repeat(arr, factor, axis=0), factor, axis=1)
                out.append(codec.encode(big))
            yield pd.DataFrame(
                {
                    "column": pdf["column"],
                    "row": pdf["row"],
                    "zoom": pdf["zoom"],
                    "content": out,
                }
            )

    return tiles.mapInPandas(up, out_schema)


def classify_tiles(tiles: DataFrame, batch_size: int = 64, model=None) -> DataFrame:
    """G7+G8 preprocess + CNN inference (/root/reference/run_inference.py:95-128)
    as an iterator-of-batches mapInPandas: the model is constructed once
    per python worker; batches stream through Arrow.

    ``model``: picklable callable(list[bytes]) -> list[float]; default
    mock scores softmax = (first body byte) / 255 — deterministic,
    replace with a per-worker DeepSolar/torch load.
    """
    out_schema = "column long, row long, zoom int, panel_softmax double"

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = model if model is not None else (
            lambda payloads: [
                (p[8] / 255.0) if p is not None and len(p) > 8 else 0.0
                for p in payloads
            ]
        )
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                yield pd.DataFrame(
                    {
                        "column": chunk["column"],
                        "row": chunk["row"],
                        "zoom": chunk["zoom"],
                        "panel_softmax": scorer(list(chunk["content"])),
                    }
                )

    return tiles.mapInPandas(infer, out_schema)


# --- video frame sampling / audio feature extraction (§2.12) ----------------


class NumpyVideoCodec:
    """Dependency-free video container matching NumpyCodec's philosophy:
    a 16-byte header (n_frames, w, h, channels as big-endian u32)
    followed by concatenated uncompressed uint8 frames. ``frame(content,
    i)`` slices ONE frame without materializing the rest — the property
    a real container codec (pyav/ffmpeg seek) shares; it drops into the
    same method shape."""

    @staticmethod
    def encode(frames: np.ndarray) -> bytes:
        n, h, w, c = frames.shape
        head = (
            n.to_bytes(4, "big") + w.to_bytes(4, "big")
            + h.to_bytes(4, "big") + c.to_bytes(4, "big")
        )
        return head + frames.astype(np.uint8).tobytes()

    @staticmethod
    def meta(content: bytes) -> tuple[int, int, int, int]:
        return tuple(
            int.from_bytes(content[i : i + 4], "big") for i in (0, 4, 8, 12)
        )

    @classmethod
    def frame(cls, content: bytes, idx: int) -> np.ndarray:
        n, w, h, c = cls.meta(content)
        size = w * h * c
        off = 16 + idx * size
        arr = np.frombuffer(content, dtype=np.uint8, offset=off, count=size)
        return arr.reshape(h, w, c)


def frame_sample(
    videos: DataFrame,
    every_n: int = 10,
    id_col: str = "video_id",
    content_col: str = "content",
    fps: float = 30.0,
    codec=NumpyVideoCodec,
    image_codec=None,
) -> DataFrame:
    """Uniform frame sampling: one row per kept frame —
    (id, frame_idx, ts_ms, frame) — the video analog of slice_grid's
    1->N flatMap. No shuffle: each video row explodes in place inside
    one mapInPandas stage; at 100 TB the scan parallelizes by file and
    frame decode stays columnar in Arrow batches. Frames re-encode
    through ``image_codec`` (default NumpyCodec) so downstream image
    operators (classify_tiles et al.) consume them unchanged."""
    enc = (image_codec or NumpyCodec()).encode

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for vid, content in zip(pdf[id_col], pdf[content_col]):
                if content is None:
                    continue
                n_frames = codec.meta(content)[0]
                for i in range(0, n_frames, max(every_n, 1)):
                    ids.append(vid)
                    idxs.append(i)
                    tss.append(int(i * 1000.0 / fps))
                    frames.append(enc(codec.frame(content, i)))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    return videos.mapInPandas(
        sample, f"{id_col} long, frame_idx int, ts_ms long, frame binary"
    )


def audio_features(
    audio: DataFrame,
    frame_ms: int = 25,
    sample_rate: int = 16_000,
    id_col: str = "audio_id",
    content_col: str = "content",
) -> DataFrame:
    """Per-window audio features over raw PCM16 mono bytes: RMS energy,
    zero-crossing rate, and peak per ``frame_ms`` window — real numpy
    DSP (no external audio lib needed for PCM), the standard
    VAD/quality-gate front end for speech-corpus curation. 1->N
    flatMap in one narrow mapInPandas stage, no shuffle; rounding to
    6dp keeps outputs engine-stable."""
    hop = int(sample_rate * frame_ms / 1000)

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, rms, zcr, peak = [], [], [], [], []
            for aid, content in zip(pdf[id_col], pdf[content_col]):
                if content is None or len(content) < 2:
                    continue
                pcm = np.frombuffer(content, dtype="<i2").astype(np.float64)
                pcm = pcm[: (len(pcm) // hop) * hop]
                if not len(pcm):
                    continue
                wins = pcm.reshape(-1, hop) / 32768.0
                ids.extend([aid] * len(wins))
                idxs.extend(range(len(wins)))
                rms.extend(np.round(np.sqrt((wins**2).mean(axis=1)), 6))
                zcr.extend(
                    np.round(
                        (np.diff(np.signbit(wins), axis=1) != 0).mean(axis=1), 6
                    )
                )
                peak.extend(np.round(np.abs(wins).max(axis=1), 6))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "win_idx": idxs,
                    "rms": rms,
                    "zcr": zcr,
                    "peak": peak,
                }
            )

    return audio.mapInPandas(
        feats, f"{id_col} long, win_idx int, rms double, zcr double, peak double"
    )


# --- image near-duplicate dedup (perceptual hash, §2.12) ---------------------

def image_dhash(
    images: DataFrame,
    codec=None,
    id_col: str = "image_id",
    content_col: str = "content",
    hash_size: int = 8,
) -> DataFrame:
    """Perceptual difference hash (dHash): decode -> channel-mean
    grayscale -> bilinear resize to (hash_size, hash_size+1) -> each bit
    is the horizontal brightness gradient sign (px[r,c+1] > px[r,c]) —
    hash_size^2 bits packed into one BIGINT. Near-identical images
    (re-encodes, small edits, mild resizes) land within a few Hamming
    bits; unrelated images differ by ~half the bits.

    Plan: one mapInPandas Arrow stage through the injected codec (the
    slice_grid seam — swap NumpyCodec for PIL without touching the
    plan), no shuffle; the corpus-wide output is (id, 64-bit long), so
    everything downstream is sketch-sized relational work.
    """
    if hash_size * hash_size > 64:
        raise ValueError("hash_size^2 must fit 64 bits")
    codec = codec or NumpyCodec()
    weights = (1 << np.arange(hash_size * hash_size, dtype=np.uint64))

    def hash_batch(batches):
        for pdf in batches:
            out = []
            for content in pdf[content_col]:
                arr = codec.decode(content)
                gray = arr.astype(np.float64).mean(axis=2, keepdims=True)
                small = bilinear_resize(
                    np.rint(gray).astype(np.uint8), hash_size, hash_size + 1
                ).astype(np.int16)[:, :, 0]
                bits = (small[:, 1:] > small[:, :-1]).flatten()
                out.append(int((bits * weights).sum().astype(np.uint64)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    # numpy uint64 -> signed 64-bit two's complement
                    "dhash": np.array(out, dtype=np.uint64).astype(np.int64),
                }
            )

    return images.mapInPandas(hash_batch, f"{id_col} long, dhash long")


def image_neardup_pairs(
    images: DataFrame,
    codec=None,
    id_col: str = "image_id",
    content_col: str = "content",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Image near-duplicate pairs (the LAION-style image-dedup step):
    dHash each image, band the 64-bit hash into ``bands`` contiguous
    slices (dedup.simhash_bands — two hashes within max_hamming Hamming
    distance agree on at least one band whenever max_hamming < bands,
    pigeonhole), candidate pairs from the per-band EQUI-join, verified
    with an exact popcount on the XOR. Returns (id_a, id_b, hamming),
    id_a < id_b.

    Recall is COMPLETE only while max_hamming < bands (the pigeonhole
    precondition); a looser threshold silently misses pairs whose
    differing bits spread across every band, so the combination is
    validated — raise bands (8 x 8-bit bands covers max_hamming <= 7)
    instead of loosening the check.

    Plan: hashing is the map-only Arrow stage above; banding explodes
    to ``bands`` rows of (band, key, id, dhash); candidates come from a
    hash-partitioned self-equi-join on the scalar (band, key) — never
    an all-pairs theta-join — and the verify (bit_count(a^b)) is a
    codegen expression on the already-joined 16-byte rows. The same
    shape as text SimHash dedup (q56) and LSH near-dup (q63): corpus
    pixels are read ONCE, everything that shuffles is hash-sized.
    """
    from solarpaneldatawrangler_spark.operators.dedup import simhash_bands

    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming={max_hamming} >= bands={bands} loses the "
            "pigeonhole recall guarantee — raise bands (64 bits allow "
            "up to 64) instead"
        )
    if 64 % bands != 0:
        raise ValueError(f"bands must divide 64, got {bands}")
    hashes = image_dhash(
        images, codec=codec, id_col=id_col, content_col=content_col
    )
    banded = hashes.select(
        F.col(id_col),
        "dhash",
        F.explode(simhash_bands(F.col("dhash"), bands)).alias("b"),
    ).select(
        id_col, "dhash", F.col("b.band").alias("band"),
        F.col("b.key").alias("key"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.dhash").alias("ha"),
            F.col("b.dhash").alias("hb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(
            F.col("ha").bitwiseXOR(F.col("hb"))
        ).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
