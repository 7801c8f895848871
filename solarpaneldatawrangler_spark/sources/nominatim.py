"""Nominatim geocoder response parsing (SURVEY.md §2.1 S3).

The reference queries Nominatim with polygon_geojson=1 and keeps the
FIRST result whose geojson is a Polygon or MultiPolygon
(/root/reference/gather_city_shapes.py:46-55) — everything else
(points, linestrings, lower-ranked matches) is skipped.

Spark-first shape: responses land as (key, body-json) rows; the body is
parsed ONCE into a VARIANT (Spark 4 semi-structured type — binary
encoded, no per-access re-parse), the result array explodes, geometry
types filter, and a per-key min-position window picks the first match.
All codegen expressions; no UDF, no driver-side JSON handling, so a
100 TB backfill of stored responses parses at scan speed.

Geometry lands in the engine's multi-ring model
(array<array<array<double>>> of closed outer rings, one per polygon
part — holes dropped, same documented limitation as
operators.geometry.union_rings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_POLY = "array<array<array<double>>>"
_MPOLY = "array<array<array<array<double>>>>"


def parse_nominatim_response(
    responses: DataFrame,
    body_col: str = "body",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """First-Polygon/MultiPolygon selection over raw Nominatim response
    bodies. Input: one row per geocode request with the raw JSON array
    body; output: one row per request that HAS a polygonal result —
    (key_cols..., result_pos, display_name, geom_type, rings).

    Requests whose results hold no Polygon/MultiPolygon produce no row
    (the reference prints 'no:' and skips, gather_city_shapes.py:53-55);
    recover them with a left_anti join on key_cols.
    """
    key_cols = list(key_cols or ["req_id"])
    arr = F.try_variant_get(F.parse_json(F.col(body_col)), "$", "array<variant>")
    exploded = responses.select(
        *key_cols, F.posexplode(arr).alias("result_pos", "_item")
    )
    gtype = F.try_variant_get(F.col("_item"), "$.geojson.type", "string")
    candidates = exploded.withColumn("geom_type", gtype).filter(
        F.col("geom_type").isin("Polygon", "MultiPolygon")
    )
    w = Window.partitionBy(*key_cols).orderBy("result_pos")
    first = candidates.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    poly = F.try_variant_get(F.col("_item"), "$.geojson.coordinates", _POLY)
    mpoly = F.try_variant_get(F.col("_item"), "$.geojson.coordinates", _MPOLY)
    rings = F.when(
        F.col("geom_type") == "Polygon", F.slice(poly, 1, 1)  # outer ring only
    ).otherwise(F.transform(mpoly, lambda part: F.element_at(part, 1)))
    return first.select(
        *key_cols,
        "result_pos",
        F.try_variant_get(F.col("_item"), "$.display_name", "string").alias(
            "display_name"
        ),
        "geom_type",
        rings.alias("rings"),
    )
