"""Golden tests for the ray-cast point-in-ring expression and the
two-phase contains-join (SURVEY.md J6/P8), including non-convex rings."""

from __future__ import annotations

from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.operators.spatial import (
    point_in_ring,
    polygon_area,
    spatial_join_contains,
)

# L-shaped (non-convex) ring: 2x2 square missing its top-right 1x1 corner
L_RING = [[0.0, 0.0], [2.0, 0.0], [2.0, 1.0], [1.0, 1.0], [1.0, 2.0], [0.0, 2.0], [0.0, 0.0]]


def test_point_in_l_ring(spark):
    cases = [
        (0.5, 0.5, True),    # inside lower block
        (1.5, 0.5, True),    # inside right arm
        (1.5, 1.5, False),   # in the notch
        (0.5, 1.5, True),    # inside upper-left arm
        (2.5, 0.5, False),   # outside
        (-0.5, 0.5, False),  # outside left
    ]
    df = spark.createDataFrame(
        [(px, py) for px, py, _ in cases], "px double, py double"
    ).withColumn("ring", F.lit(None))
    ring_expr = F.array(*[F.array(F.lit(x), F.lit(y)) for x, y in L_RING])
    out = df.select(point_in_ring(F.col("px"), F.col("py"), ring_expr).alias("inside")).collect()
    assert [r.inside for r in out] == [c[2] for c in cases]


def test_polygon_area_l_shape(spark):
    df = spark.createDataFrame([(1,)], "x int")
    ring_expr = F.array(*[F.array(F.lit(x), F.lit(y)) for x, y in L_RING])
    area = df.select(polygon_area(ring_expr).alias("a")).collect()[0].a
    assert area == 3.0


def test_spatial_anti_join(spark):
    polys = spark.createDataFrame(
        [(1,), (2,)], "poly_id int"
    ).withColumn(
        "ring",
        F.when(
            F.col("poly_id") == 1,
            F.array(*[F.array(F.lit(x), F.lit(y)) for x, y in L_RING]),
        ).otherwise(
            F.array(
                *[
                    F.array(F.lit(x + 10.0), F.lit(y))
                    for x, y in [[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]
                ]
            )
        ),
    )
    pts = spark.createDataFrame([(0.5, 0.5)], "longitude double, latitude double")
    kept = spatial_join_contains(polys, pts, how="left_anti").select("poly_id").collect()
    assert [r.poly_id for r in kept] == [2]


def test_auto_strategy_routes_by_size(spark, sf_dir):
    # size-aware selection: a parquet-derived points side with a tiny
    # Catalyst estimate broadcasts (nested-loop with SMALL broadcast side
    # is the intended R-tree-probe analog); forcing a 1-byte threshold
    # must route the same inputs to the bucketed hash-join path
    from solarpaneldatawrangler_spark.operators.spatial import (
        estimated_plan_size_bytes,
        spatial_join_contains,
    )
    from solarpaneldatawrangler_spark.plans.domain_queries import _spatial_frames

    polys, pts = _spatial_frames(spark, sf_dir)
    est = estimated_plan_size_bytes(pts)
    assert est is not None and est > 0  # parquet scans always estimate

    small = spatial_join_contains(polys, pts, how="inner")
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan_small

    big = spatial_join_contains(
        polys, pts, how="inner", strategy="auto", broadcast_threshold=1,
        cell_size=10.0,
    )
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan_big
    assert "CartesianProduct" not in plan_big

    # both strategies agree on the answer
    key = lambda df: {(r.n_nationkey, r.c_custkey) for r in df.collect()}
    assert key(small.select("n_nationkey", "c_custkey")) == key(
        big.select("n_nationkey", "c_custkey")
    )
