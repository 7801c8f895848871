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
