"""Spark StructTypes for the reference data model (SURVEY.md §1.2).

Mirrors the reference ORM schema (/root/reference/solardb.py:16-64) with
the type corrections SURVEY.md calls out: slippy row/column widened to
LongType (zoom-21 coordinates reach 2^21), cluster_id as LongType (the
reference declares a String FK to an Integer PK — a bug we do not
replicate), inference_timestamp as a real TimestampType (the reference
stores float epoch seconds in an Integer column).
"""

from __future__ import annotations

from pyspark.sql import types as T

SEARCH_POLYGONS = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("centroid_row", T.DoubleType(), False),
        T.StructField("centroid_column", T.DoubleType(), False),
        T.StructField("centroid_zoom", T.IntegerType(), False),
        T.StructField("inner_coords_calculated", T.BooleanType(), False),
    ]
)

SLIPPY_TILES = T.StructType(
    [
        T.StructField("row", T.LongType(), False),
        T.StructField("column", T.LongType(), False),
        T.StructField("zoom", T.IntegerType(), False),
        T.StructField("centroid_distance", T.DoubleType(), True),
        T.StructField("polygon_name", T.StringType(), True),
        T.StructField("cluster_id", T.LongType(), True),
        T.StructField("has_image", T.BooleanType(), False),
        T.StructField("inference_ran", T.BooleanType(), False),
        T.StructField("inference_timestamp", T.TimestampType(), True),
        T.StructField("panel_softmax", T.DoubleType(), True),
        T.StructField("panel_seen_by_human", T.BooleanType(), True),
        T.StructField("panel_verified", T.BooleanType(), True),
    ]
)

# Composite logical key for slippy_tiles — the reference enforces it with
# a PK + ON CONFLICT IGNORE (/root/reference/solardb.py:50-51); here it
# drives key-dedup upsert writes (operators.relational.upsert_by_key).
SLIPPY_TILE_KEY = ["row", "column", "zoom"]

OSM_SOLAR_NODES = T.StructType(
    [
        T.StructField("longitude", T.DoubleType(), False),
        T.StructField("latitude", T.DoubleType(), False),
    ]
)
OSM_SOLAR_NODE_KEY = ["longitude", "latitude"]

# Cities CSV (headerless city,state — /root/reference/gather_city_shapes.py:13-19)
CITIES_CSV = "city STRING, state STRING"

# GeoJSON polygon ring: array of [lon, lat] points; Polygon = array of
# rings; MultiPolygon = array of polygons.
LONLAT = T.ArrayType(T.DoubleType())
RING = T.ArrayType(LONLAT)
POLYGON = T.ArrayType(RING)
MULTIPOLYGON = T.ArrayType(POLYGON)

CITY_POLYGONS = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("coordinates", POLYGON, True),
    ]
)

# Multimodal: binary payload + typed metadata (SURVEY.md §2.12; the
# reference's ImageTile record, /root/reference/imagery.py:13-19).
IMAGE_TILES = T.StructType(
    [
        T.StructField("column", T.LongType(), False),
        T.StructField("row", T.LongType(), False),
        T.StructField("zoom", T.IntegerType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)
