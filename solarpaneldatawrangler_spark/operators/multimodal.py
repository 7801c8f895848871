"""Multimodal (image/audio/video) column operators (SURVEY.md §2.9
G4-G8, §2.12).

Design: media are opaque BinaryType columns + typed metadata columns
(schemas.IMAGE_TILES), moved between stages as Arrow batches. The
reference's PIL-based slice/stitch/preprocess/classify pipeline
(/root/reference/imagery.py:81-209, run_inference.py:95-128) maps to
mapInPandas / applyInPandas operators whose Spark-side plumbing (schema,
grouping, batch shape) is fully real; the pixel codec itself is stubbed
behind ``decode_image`` because no imaging library ships in this
container — swap in PIL/torchvision per-executor for production.

Scale notes:
- slice (1 fetched 1280^2 image -> 25 tiles of 256^2) is a 1->N
  flatMap: mapInPandas yielding exploded rows, no shuffle.
- stitch (3x3 neighborhood -> 320^2) groups by the center-tile key:
  one shuffle on (zoom, snap(column), snap(row)) super-cell keys; the
  9 neighbors of a tile live in <=4 super-cells, so the group join is
  bounded.
- inference is an iterator pandas UDF: the (mock) model loads once per
  executor python worker, not per batch (reference reloads per process).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRID_SIZE = 5  # 1280 // 256, as in /root/reference/imagery.py:104-110


def decode_image(content: bytes) -> tuple[int, int]:
    """STUB codec: returns (width, height) parsed from a deterministic
    fake header (first 8 bytes, big-endian u32 pairs) when present, else
    raises. Production: PIL.Image.open(io.BytesIO(content)).size.
    """
    if content is None or len(content) < 8:
        raise NotImplementedError(
            "no imaging library in this environment; deterministic fake "
            "images carry (w,h) in their first 8 bytes"
        )
    w = int.from_bytes(content[0:4], "big")
    h = int.from_bytes(content[4:8], "big")
    return w, h


def fake_image(width: int, height: int, seed: bytes) -> bytes:
    """Deterministic fake image payload: 8-byte (w,h) header + sha-derived
    body. Stands in for a JPEG in tests; decode_image round-trips it."""
    body = hashlib.sha256(seed).digest()
    return width.to_bytes(4, "big") + height.to_bytes(4, "big") + body


def slice_grid(images: DataFrame, grid_size: int = GRID_SIZE) -> DataFrame:
    """G4 25-way slice (/root/reference/imagery.py:81-96): one fetched
    super-image at (column,row) -> grid_size^2 tiles with shifted coords.

    The coordinate fan-out is pure Catalyst (explode over a constant
    offset array); the pixel crop is the stubbed per-tile payload
    transform inside mapInPandas.
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


def stitch_3x3(tiles: DataFrame) -> DataFrame:
    """G6 3x3 stitch (/root/reference/imagery.py:196-209): for each tile,
    paste its 8 neighbors around it -> one 320^2 context image.

    Implemented as dilation fan-out + applyInPandas per center tile: each
    tile row is replicated to the 9 centers it contributes to (pure
    explode), grouped by center key — a single shuffle, no self-join
    storm. Missing neighbors are tolerated (reference pastes what exists).
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
        ordered = pdf.sort_values(["dr", "dc"])
        seed = b"".join(bytes(c) for c in ordered["content"])
        return pd.DataFrame(
            {
                "column": [center_column],
                "row": [center_row],
                "zoom": [zoom],
                "content": [fake_image(320, 320, seed)],
                "n_neighbors": [len(pdf) - 1],
            }
        )

    return contrib.groupBy("center_column", "center_row", "zoom").applyInPandas(
        stitch, out_schema
    )


def classify_tiles(tiles: DataFrame, batch_size: int = 64) -> DataFrame:
    """G7+G8 preprocess + CNN inference (/root/reference/run_inference.py:95-128)
    as an iterator-of-batches mapInPandas: the (mock) model is constructed
    once per python worker; batches stream through Arrow.

    Mock model: softmax = (first body byte of the image) / 255 —
    deterministic, replace with DeepSolar/torch per-executor load.
    """
    out_schema = "column long, row long, zoom int, panel_softmax double"

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = lambda payloads: [  # noqa: E731 — stands in for predictor
            (p[8] / 255.0) if p is not None and len(p) > 8 else 0.0 for p in payloads
        ]
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                yield pd.DataFrame(
                    {
                        "column": chunk["column"],
                        "row": chunk["row"],
                        "zoom": chunk["zoom"],
                        "panel_softmax": model(list(chunk["content"])),
                    }
                )

    return tiles.mapInPandas(infer, out_schema)
