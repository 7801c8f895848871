"""End-to-end solar-panel pipeline (SURVEY.md §3 E1): the Spark-native
equivalent of /root/reference/run_entire_process.py:38-80, composed
entirely from the operator library. Every stage is a pure
DataFrame -> DataFrame transform; restartability comes from idempotent
anti-join/upsert patterns instead of persisted flags.

    polygons (name, ring lon/lat)
      -> simplify (G2)                       geometry.simplify via applyInPandas
      -> tile-space projection (F1/F12)     functions.tiles expressions
      -> grid enumeration (G3)              operators.grid.enumerate_grid
      -> point-in-polygon filter (P8)       operators.spatial.point_in_ring
      -> centroid distance (J1+F3)          broadcast join + expression
      -> imagery fetch+slice (S8/G4)        sources.imagery_source (mockable)
      -> stitch 3x3 (G6/J8)                 operators.multimodal.stitch_3x3
      -> classify (G7/G8)                   operators.multimodal.classify_tiles
      -> threshold + cluster (P6/G1)        operators.clustering
      -> cluster outlines (A7/F11/F2)       operators.geometry.cluster_union_rings
      -> spatial anti-join vs OSM (J6)      operators.spatial
      -> MapRoulette JSONL (S12)            sources.geojson
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.functions.tiles import (
    deg2num_column,
    deg2num_row,
    num2deg_lat,
    num2deg_lon,
    tile_distance,
)
from solarpaneldatawrangler_spark.operators.clustering import connected_components
from solarpaneldatawrangler_spark.operators.geometry import (
    cluster_union_rings,
    simplify_polygon_points,
)
from solarpaneldatawrangler_spark.operators.grid import enumerate_grid
from solarpaneldatawrangler_spark.operators.spatial import (
    point_in_ring,
    ring_bbox,
    spatial_join_contains,
)
from solarpaneldatawrangler_spark.sources.geojson import feature_collection_lines

POSITIVE_THRESHOLD = 0.25  # reference default, /root/reference/solardb.py:231


def normalize_polygons(polygons: DataFrame) -> DataFrame:
    """Accept Polygon OR MultiPolygon boundaries (the reference keeps
    whichever Nominatim returns, gather_city_shapes.py:50-52): a single
    `ring` column is wrapped into a one-part `rings`
    array<array<array<double>>>; a `rings` column passes through. Every
    downstream stage works on parts."""
    if "rings" in polygons.columns:
        return polygons
    return polygons.withColumn("rings", F.array(F.col("ring"))).drop("ring")


def simplify_polygons(polygons: DataFrame) -> DataFrame:
    """G2: convex-hull + buffer simplification of each city boundary,
    part by part (the reference simplifies each polygon of the
    GeometryCollection, process_city_shapes.py:77-90).
    Input/output: (name, rings array<array<array<double>>>)."""
    parts = normalize_polygons(polygons).select(
        "name", F.posexplode("rings").alias("part_idx", "ring")
    )

    def one(key, pdf: pd.DataFrame) -> pd.DataFrame:
        # Arrow delivers array<array<double>> as an object array of arrays
        ring = np.vstack([np.asarray(p, dtype=float) for p in pdf["ring"].iloc[0]])
        out = simplify_polygon_points(ring)
        return pd.DataFrame(
            {"name": [key[0]], "part_idx": [key[1]], "ring": [out.tolist()]}
        )

    simplified = parts.groupBy("name", "part_idx").applyInPandas(
        one, "name string, part_idx int, ring array<array<double>>"
    )
    collected = (
        simplified.groupBy("name")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("part_idx", "ring"))
            ).alias("_parts")
        )
        .select("name", F.transform("_parts", lambda p: p["ring"]).alias("rings"))
    )
    return collected


def polygons_to_tile_space(polygons: DataFrame, zoom: int) -> DataFrame:
    """F12: project every lon/lat vertex of every part into continuous
    slippy tile coordinates as a nested higher-order transform (no UDF).

    Continuous (double) tile coords preserve geometry for the
    point-in-polygon test; cells come from flooring afterwards.
    """
    n = F.pow(F.lit(2.0), F.lit(zoom))
    pi = float(np.pi)

    def project(pt):
        lon, lat = F.element_at(pt, 1), F.element_at(pt, 2)
        x = (lon + F.lit(180.0)) / F.lit(360.0) * n
        lat_r = F.radians(lat)
        y = (
            (F.lit(1.0) - F.log(F.tan(lat_r) + F.lit(1.0) / F.cos(lat_r)) / F.lit(pi))
            / F.lit(2.0)
            * n
        )
        return F.array(x, y)

    multi = normalize_polygons(polygons)
    return multi.withColumn(
        "rings", F.transform(F.col("rings"), lambda ring: F.transform(ring, project))
    )


def enumerate_polygon_tiles(tile_polygons: DataFrame) -> DataFrame:
    """G3+P8: all integer tiles whose center lies inside each polygon
    (tile-space parts). Parts explode to (name, ring) rows; each part's
    bbox drives a distributed grid enumeration, tile centers pass the
    exact point-in-ring filter, and a distinct merges tiles covered by
    overlapping parts (a tile counts once per polygon).
    Output: (polygon_name, column, row)."""
    parts = normalize_polygons(tile_polygons).select(
        F.col("name").alias("polygon_name"), F.explode("rings").alias("ring")
    )
    with_bbox = parts.select(
        "polygon_name",
        "ring",
        ring_bbox(F.col("ring")).alias("b"),
    ).select(
        "polygon_name",
        "ring",
        F.floor(F.col("b.xmin")).cast("long").alias("xmin"),
        F.floor(F.col("b.xmax")).cast("long").alias("xmax"),
        F.floor(F.col("b.ymin")).cast("long").alias("ymin"),
        F.floor(F.col("b.ymax")).cast("long").alias("ymax"),
    )
    cells = enumerate_grid(with_bbox)
    cx = F.col("column").cast("double") + 0.5
    cy = F.col("row").cast("double") + 0.5
    return (
        cells.filter(point_in_ring(cx, cy, F.col("ring")))
        .select("polygon_name", "column", "row")
        .distinct()
    )


def with_centroid_distance(tiles: DataFrame, polygons_centroids: DataFrame) -> DataFrame:
    """J1+F3 (solardb.py:121-134): broadcast the (small) polygon
    dimension, compute per-tile Euclidean distance to its polygon
    centroid — the inference priority key."""
    joined = tiles.join(F.broadcast(polygons_centroids), "polygon_name")
    return joined.withColumn(
        "centroid_distance",
        tile_distance(
            F.col("row"), F.col("column"), F.col("centroid_row"), F.col("centroid_column")
        ),
    ).drop("centroid_row", "centroid_column")


def cluster_positive_tiles(scored: DataFrame, threshold: float = POSITIVE_THRESHOLD) -> DataFrame:
    """P6+G1 (run_inference.py:21-60): threshold then 4-adjacency
    connected components; deterministic cluster ids."""
    pos = scored.filter(
        F.col("panel_softmax").isNotNull() & (F.col("panel_softmax") >= threshold)
    )
    labeled = connected_components(pos.select("column", "row"))
    return pos.join(labeled, ["column", "row"])


def simple_tile_report(scored: DataFrame, zoom: int, threshold: float = POSITIVE_THRESHOLD) -> DataFrame:
    """Per-tile (non-clustered) MapRoulette report
    (/root/reference/maproulette.py:17-33): every tile over threshold
    becomes one single-feature FeatureCollection line with its bbox ring
    and its own softmax as confidence."""
    from solarpaneldatawrangler_spark.functions.tiles import tile_bbox_ring

    pos = scored.filter(
        F.col("panel_softmax").isNotNull() & (F.col("panel_softmax") >= threshold)
    )
    ringed = pos.select(
        tile_bbox_ring(F.col("column"), F.col("row"), zoom).alias("ring"),
        F.col("panel_softmax").alias("confidence"),
    )
    return feature_collection_lines(ringed)


def cluster_report(
    clustered: DataFrame, osm_nodes: DataFrame, zoom: int
) -> DataFrame:
    """A7+A3 -> F2 -> J6 -> S12 (maproulette.py:36-98): per-cluster
    outline ring, projected to lon/lat, minus clusters containing a
    known OSM node, as JSONL feature lines."""
    rings = cluster_union_rings(clustered)  # tile-space outline + confidence
    lonlat = rings.withColumn(
        "ring",
        F.transform(
            F.col("ring"),
            lambda pt: F.array(
                num2deg_lon(F.element_at(pt, 1), zoom, center=False),
                num2deg_lat(F.element_at(pt, 2), zoom, center=False),
            ),
        ),
    )
    survivors = spatial_join_contains(lonlat, osm_nodes, how="left_anti")
    return feature_collection_lines(survivors)


def run_pipeline(
    polygons: DataFrame,
    osm_nodes: DataFrame,
    classify,
    zoom: int = 21,
) -> DataFrame:
    """Full E1 composition with a pluggable classifier
    (DataFrame of tiles -> DataFrame with panel_softmax), e.g.
    operators.multimodal.classify_tiles chained after imagery fetch."""
    simplified = simplify_polygons(polygons)
    tile_polys = polygons_to_tile_space(simplified, zoom)
    tiles = enumerate_polygon_tiles(tile_polys)
    scored = classify(tiles)
    clustered = cluster_positive_tiles(scored)
    return cluster_report(clustered, osm_nodes, zoom)
