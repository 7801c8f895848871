"""Vector math over array<float|double> embedding columns as pure
Catalyst higher-order-function expressions (SURVEY.md §2.12 similarity
search). No UDFs: dot product / norms via F.aggregate + F.zip_with run
JVM-side inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double-precision dot product — matches a
    C/row-engine oracle that folds in array order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def random_hyperplane_signature(a: Column, planes: list[list[float]]) -> Column:
    """LSH bit-signature: sign of dot(a, plane) per hyperplane, packed as
    a string of 0/1. ``planes`` is a small driver-side list (broadcast as
    literals into the plan)."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    a,
                    F.array(*[F.lit(float(x)) for x in plane]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)
