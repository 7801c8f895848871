"""GeoJSON / JSONL sources and sinks (SURVEY.md §2.1 S5/S6/S12).

The reference writes line-delimited single-feature FeatureCollections
via string templating (/root/reference/maproulette.py:12-14,95-98);
here the same contract is to_json(struct(...)) over a DataFrame — real
JSON, one line per feature, written distributed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def feature_collection_lines(
    df: DataFrame, ring_col: str = "ring", confidence_col: str = "confidence"
) -> DataFrame:
    """One single-feature FeatureCollection JSON string per row, matching
    the reference's MapRoulette JSONL contract: a Polygon geometry with
    one ring and a prediction_confidence property."""
    feature = F.struct(
        F.lit("FeatureCollection").alias("type"),
        F.array(
            F.struct(
                F.lit("Feature").alias("type"),
                F.struct(
                    F.col(confidence_col).alias("prediction_confidence")
                ).alias("properties"),
                F.struct(
                    F.lit("Polygon").alias("type"),
                    F.array(F.col(ring_col)).alias("coordinates"),
                ).alias("geometry"),
            )
        ).alias("features"),
    )
    return df.select(F.to_json(feature).alias("line"))


def write_jsonl(df: DataFrame, path: str, single_file: bool = False) -> None:
    """Write a one-string-column DataFrame as line-delimited text.
    single_file=True coalesces to one partition (reference parity for
    small report outputs); leave False at scale."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").text(path)


def read_geojson_features(spark, paths, schema=None) -> DataFrame:
    """S5 multi-file GeoJSON scan: schema-on-read JSON (one object per
    file or per line), geometry kept as nested arrays."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.option("multiLine", "true").json(paths)
