"""End-to-end pipeline test (SURVEY.md §3 E1): a synthetic city polygon
through simplify -> grid -> classify(mock) -> cluster -> report JSONL."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.pipeline import (
    cluster_positive_tiles,
    cluster_report,
    enumerate_polygon_tiles,
    polygons_to_tile_space,
    run_pipeline,
    simplify_polygons,
)


def _square_city(spark, name="Testville, TS", lon0=-100.0, lat0=40.0, d=0.05):
    ring = [
        [lon0, lat0], [lon0 + d, lat0], [lon0 + d, lat0 + d], [lon0, lat0 + d], [lon0, lat0],
    ]
    return spark.createDataFrame(
        [(name, ring)], "name string, ring array<array<double>>"
    )


def test_enumerate_polygon_tiles_counts(spark):
    city = _square_city(spark)
    tile_polys = polygons_to_tile_space(simplify_polygons(city), zoom=15)
    tiles = enumerate_polygon_tiles(tile_polys)
    n = tiles.count()
    # 0.05 deg at zoom 15 is a few tiles in each axis (plus buffer);
    # the exact count is stable because everything is deterministic
    assert n > 0
    assert tiles.select("polygon_name").distinct().count() == 1


def test_full_pipeline_to_jsonl(spark):
    city = _square_city(spark)
    osm = spark.createDataFrame(
        [(-99.99, 40.01)], "longitude double, latitude double"
    )

    def mock_classify(tiles):
        # deterministic softmax: positive iff (column+row) even
        return tiles.withColumn(
            "panel_softmax",
            F.when((F.col("column") + F.col("row")) % 2 == 0, 0.9).otherwise(0.1),
        )

    out = run_pipeline(city, osm, mock_classify, zoom=15)
    lines = [r.line for r in out.collect()]
    assert lines, "pipeline produced no features"
    for line in lines:
        obj = json.loads(line)
        assert obj["type"] == "FeatureCollection"
        feat = obj["features"][0]
        assert feat["geometry"]["type"] == "Polygon"
        ring = feat["geometry"]["coordinates"][0]
        assert ring[0] == ring[-1]
        assert feat["properties"]["prediction_confidence"] >= 0.25


def _two_part_city(spark, name="Archipelago, AR", lon0=-100.0, lat0=40.0, d=0.05):
    # mainland + island, disjoint (island offset 4d east)
    def sq(x0, y0):
        return [[x0, y0], [x0 + d, y0], [x0 + d, y0 + d], [x0, y0 + d], [x0, y0]]

    rings = [sq(lon0, lat0), sq(lon0 + 4 * d, lat0)]
    return spark.createDataFrame(
        [(name, rings)], "name string, rings array<array<array<double>>>"
    )


def test_multipolygon_tiles_cover_both_parts(spark):
    # the 2-part city must enumerate tiles in BOTH disjoint parts —
    # the reference accepts MultiPolygon boundaries
    # (gather_city_shapes.py:50-52) and iterates the parts
    city = _two_part_city(spark)
    tile_polys = polygons_to_tile_space(simplify_polygons(city), zoom=15)
    tiles = enumerate_polygon_tiles(tile_polys)
    cols = [r["column"] for r in tiles.collect()]
    assert len(cols) > 0
    # disjoint parts 4d apart leave a gap in tile columns
    span = sorted(set(cols))
    gaps = [b - a for a, b in zip(span, span[1:])]
    assert max(gaps) > 1, f"expected a column gap between parts, got {span}"
    # and the single-part city still works through the same (multi) path
    single = _square_city(spark)
    t1 = enumerate_polygon_tiles(polygons_to_tile_space(simplify_polygons(single), 15))
    assert t1.count() > 0


def test_full_pipeline_multipolygon(spark):
    city = _two_part_city(spark)
    osm = spark.createDataFrame(
        [(-99.99, 40.01)], "longitude double, latitude double"
    )

    def mock_classify(tiles):
        return tiles.withColumn("panel_softmax", F.lit(0.9))

    out = run_pipeline(city, osm, mock_classify, zoom=15)
    lines = [r.line for r in out.collect()]
    assert lines, "multipolygon pipeline produced no features"
    for line in lines:
        obj = json.loads(line)
        assert obj["type"] == "FeatureCollection"


def test_cluster_positive_threshold(spark):
    scored = spark.createDataFrame(
        [(0, 0, 0.9), (0, 1, 0.3), (5, 5, 0.1), (9, 9, 0.26)],
        "column long, row long, panel_softmax double",
    )
    clustered = cluster_positive_tiles(scored)
    got = {(r.column, r.row) for r in clustered.collect()}
    assert got == {(0, 0), (0, 1), (9, 9)}  # 0.1 dropped; threshold 0.25
    n_clusters = clustered.select("cluster_id").distinct().count()
    assert n_clusters == 2  # (0,0)+(0,1) merge; (9,9) alone
