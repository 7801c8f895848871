"""Property tests for the tile projection expression layer (SURVEY.md §5.4):
F1/F2 are inverses up to tile quantization; known golden coordinates."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.functions.tiles import (
    deg2num_column,
    deg2num_row,
    grid_snap,
    num2deg_lat,
    num2deg_lon,
    tile_bbox_ring,
    tile_distance,
)


def _ref_deg2num(lon, lat, zoom):
    # independent reimplementation of the published slippy formula
    lat_rad = math.radians(lat)
    n = 2.0 ** zoom
    col = int((lon + 180.0) / 360.0 * n)
    row = int((1.0 - math.log(math.tan(lat_rad) + 1 / math.cos(lat_rad)) / math.pi) / 2.0 * n)
    return col, row


def test_deg2num_golden(spark):
    cases = [
        (-122.4194, 37.7749, 21),   # San Francisco
        (0.0, 0.0, 21),             # null island
        (-0.1278, 51.5074, 12),     # London at coarse zoom
        (151.2093, -33.8688, 21),   # Sydney (southern hemisphere)
    ]
    df = spark.createDataFrame(cases, "lon double, lat double, zoom int")
    out = df.select(
        deg2num_column(F.col("lon"), F.col("zoom")).alias("c"),
        deg2num_row(F.col("lat"), F.col("zoom")).alias("r"),
    ).collect()
    for (lon, lat, zoom), row in zip(cases, out):
        assert (row.c, row.r) == _ref_deg2num(lon, lat, zoom)


def test_roundtrip_center_lands_in_same_tile(spark):
    tiles = [(c, r, 15) for c in range(1000, 1020) for r in range(12000, 12005)]
    df = spark.createDataFrame(tiles, "c long, r long, zoom int")
    back = df.select(
        "c",
        "r",
        deg2num_column(num2deg_lon(F.col("c"), F.col("zoom"), center=True), F.col("zoom")).alias("c2"),
        deg2num_row(num2deg_lat(F.col("r"), F.col("zoom"), center=True), F.col("zoom")).alias("r2"),
    )
    bad = back.filter((F.col("c") != F.col("c2")) | (F.col("r") != F.col("r2"))).count()
    assert bad == 0


def test_bbox_ring_closed_and_ordered(spark):
    df = spark.createDataFrame([(10, 20, 8)], "c long, r long, zoom int")
    ring = df.select(
        tile_bbox_ring(F.col("c"), F.col("r"), F.col("zoom")).alias("ring")
    ).collect()[0].ring
    assert len(ring) == 5
    assert ring[0] == ring[4]
    lons = [p[0] for p in ring]
    lats = [p[1] for p in ring]
    assert lons[1] > lons[0] and lats[2] < lats[1]  # east then south (lat down)


def test_distance_and_snap(spark):
    df = spark.createDataFrame([(3, 4, 47)], "r long, c long, x long")
    row = df.select(
        tile_distance(F.col("r"), F.col("c"), F.lit(0.0), F.lit(0.0)).alias("d"),
        grid_snap(F.col("x"), 20).alias("s"),
    ).collect()[0]
    assert row.d == 5.0
    assert row.s == 40


def test_zorder_key_matches_reference_and_clusters(spark):
    """zorder_key equals the pure-Python bit interleave, and sorting by
    it keeps 2-D neighbors closer in file order than a (column,row)
    sort does for the row axis."""
    from pyspark.sql import functions as F

    from solarpaneldatawrangler_spark.functions.tiles import zorder_key

    def py_z(c, r):
        z = 0
        for i in range(32):
            z |= ((c >> i) & 1) << (2 * i)
            z |= ((r >> i) & 1) << (2 * i + 1)
        return z

    cells = [(c, r) for c in range(0, 40, 3) for r in range(0, 40, 7)]
    cells += [(2**20 + 17, 2**19 + 3), (0, 0), (2**31 - 1, 2**31 - 1)]
    df = spark.createDataFrame(cells, "column long, row long")
    got = {
        (x["column"], x["row"]): x.z
        for x in df.select("column", "row", zorder_key(F.col("column"), F.col("row")).alias("z")).collect()
    }
    for c, r in cells:
        assert got[(c, r)] == py_z(c, r), (c, r)

    # locality: the z-distance between vertical neighbors is bounded by
    # the interleave (<= ~4x grid dimension), while a row-major linear
    # key makes it the full grid width
    n = 64
    zs = {(c, r): py_z(c, r) for c in range(n) for r in range(n)}
    z_gap = max(abs(zs[(c, r + 1)] - zs[(c, r)]) for c in range(n) for r in range(n - 1))
    linear_gap = n * n - n  # row-major: vertical neighbor is a full row away
    assert z_gap < linear_gap
