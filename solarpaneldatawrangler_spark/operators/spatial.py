"""Spatial operators without a geo library (SURVEY.md §2.2 P8, §2.3 J6,
§2.9 G2/G9).

Catalyst has no spatial awareness and this environment has no
Shapely/Sedona, so geometry is done two ways, mirroring the reference's
own two-phase design (R-tree bbox probe then exact contains,
/root/reference/maproulette.py:69-83):

1. bbox prefilter — ordinary range predicates Catalyst can push/plan
   (the distributed stand-in for the reference's R-tree);
2. exact point-in-ring — ray-casting crossing count expressed as a pure
   higher-order-function Catalyst expression over the ring array. No
   UDF: comparisons/multiply/divide on doubles are IEEE-deterministic,
   so the same formula is oracle-checkable in any engine.

Rings are GeoJSON-shaped: array<array<double>> of [lon, lat] points,
closed (first == last).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ring_x(ring: Column) -> Column:
    return F.transform(ring, lambda p: F.element_at(p, 1))


def ring_y(ring: Column) -> Column:
    return F.transform(ring, lambda p: F.element_at(p, 2))


def ring_bbox(ring: Column) -> Column:
    """struct(xmin, xmax, ymin, ymax) of a ring."""
    return F.struct(
        F.array_min(ring_x(ring)).alias("xmin"),
        F.array_max(ring_x(ring)).alias("xmax"),
        F.array_min(ring_y(ring)).alias("ymin"),
        F.array_max(ring_y(ring)).alias("ymax"),
    )


def point_in_ring(px: Column, py: Column, ring: Column) -> Column:
    """Ray-casting point-in-polygon (crossing number, odd = inside).

    For each edge (ring[i], ring[i+1]): count it when the edge straddles
    the horizontal line y=py and the intersection is right of px.
    Boundary points follow the standard crossing-number convention
    (same as the reference's shapely.contains for interior points).
    """

    def crosses(i: Column) -> Column:
        p1, p2 = F.element_at(ring, i), F.element_at(ring, i + F.lit(1))
        x1, y1 = F.element_at(p1, 1), F.element_at(p1, 2)
        x2, y2 = F.element_at(p2, 1), F.element_at(p2, 2)
        straddles = (y1 > py) != (y2 > py)
        x_at_y = (x2 - x1) * (py - y1) / (y2 - y1) + x1
        return straddles & (px < x_at_y)

    n_cross = F.size(F.filter(F.sequence(F.lit(1), F.size(ring) - 1), crosses))
    return n_cross % 2 == F.lit(1)


def point_in_any_ring(px: Column, py: Column, rings: Column) -> Column:
    """MultiPolygon containment: true when the point lies inside ANY of
    the parts (rings = array<array<array<double>>>, one closed outer
    ring per part — the reference accepts Polygon OR MultiPolygon city
    boundaries, gather_city_shapes.py:50-52, and iterates the parts,
    process_city_shapes.py:77-90). Pure expression; short-circuits via
    F.exists."""
    return F.exists(rings, lambda r: point_in_ring(px, py, r))


def rings_bbox(rings: Column) -> Column:
    """struct(xmin, xmax, ymin, ymax) covering every part of a
    MultiPolygon — the per-ring bbox union."""
    xs = F.flatten(F.transform(rings, ring_x))
    ys = F.flatten(F.transform(rings, ring_y))
    return F.struct(
        F.array_min(xs).alias("xmin"),
        F.array_max(xs).alias("xmax"),
        F.array_min(ys).alias("ymin"),
        F.array_max(ys).alias("ymax"),
    )


def multi_ring_contains_join(
    polygons: DataFrame,
    points: DataFrame,
    poly_key: list[str],
    rings_col: str = "rings",
    px_col: str = "longitude",
    py_col: str = "latitude",
    how: str = "inner",
    point_key: list[str] | None = None,
    strategy: str = "auto",
    cell_size: float = 10.0,
) -> DataFrame:
    """Contains-join against MultiPolygon geometries: posexplode the
    parts so each (polygon, part) row carries ONE ring, run the
    size-aware two-phase contains-join per part, then dedupe — a point
    inside two overlapping parts of the same polygon counts once.

    how="inner" returns distinct (poly_key ++ point columns) hit rows;
    semi/anti reduce to distinct polygon keys and replay against the
    original polygons frame (same idiom as grid_bucketed_contains_join).
    Narrow explode (parts are few per polygon), so the join cost stays
    proportional to parts x points-in-bbox, not polygons x points.
    """
    parts = polygons.select(
        *poly_key, F.posexplode(F.col(rings_col)).alias("_part_idx", "ring")
    )
    hits = spatial_join_contains(
        parts,
        points,
        ring_col="ring",
        px_col=px_col,
        py_col=py_col,
        how="inner",
        strategy=strategy,
        cell_size=cell_size,
        poly_key=[*poly_key, "_part_idx"],
    ).drop("_part_idx", "ring")
    if how == "inner":
        keep = [*poly_key, *(point_key or [c for c in points.columns])]
        return hits.select(*keep).distinct()
    if how not in ("left_semi", "left_anti"):
        raise ValueError(f"unsupported how: {how}")
    matched = hits.select(*poly_key).distinct()
    return polygons.join(matched, poly_key, how)


def polygon_area(ring: Column) -> Column:
    """Shoelace area of a closed ring (SURVEY.md G9) as a pure
    expression: |sum_i (x_i * y_{i+1} - x_{i+1} * y_i)| / 2."""
    def term(i: Column) -> Column:
        p1, p2 = F.element_at(ring, i), F.element_at(ring, i + F.lit(1))
        return F.element_at(p1, 1) * F.element_at(p2, 2) - F.element_at(
            p2, 1
        ) * F.element_at(p1, 2)

    twice = F.aggregate(
        F.sequence(F.lit(1), F.size(ring) - 1), F.lit(0.0), lambda acc, i: acc + term(i)
    )
    return F.abs(twice) / F.lit(2.0)


_UNKNOWN_SIZE = (1 << 63) - 1  # Catalyst's Long.MaxValue "no estimate" sentinel


def estimated_plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's own size estimate for a DataFrame's optimized plan
    (the statistic the planner itself uses for broadcast decisions).
    None when the py4j internals are unavailable (e.g. Connect) or when
    Catalyst has no estimate (LogicalRDD/python-created frames report
    Long.MaxValue)."""
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None
    return None if est >= _UNKNOWN_SIZE else est


def spatial_join_contains(
    polygons: DataFrame,
    points: DataFrame,
    ring_col: str = "ring",
    px_col: str = "longitude",
    py_col: str = "latitude",
    how: str = "inner",
    strategy: str = "auto",
    broadcast_threshold: int = 64 << 20,
    cell_size: float = 10.0,
    poly_key: list[str] | None = None,
) -> DataFrame:
    """Two-phase contains-join: bbox prefilter, then exact ray-cast
    check. ``how`` in {"inner", "left_semi", "left_anti"} (left_anti =
    the reference's MapRoulette spatial anti-join J6: keep polygons
    containing NO known OSM panel node).

    Strategy selection (the 100x-scale guard): a bbox theta-join is a
    broadcast-nested-loop only when the points side is genuinely small
    (OSM nodes per city: thousands). ``strategy="auto"`` asks Catalyst
    for its own size estimate of the points plan and broadcasts only
    under ``broadcast_threshold`` bytes; anything bigger — or
    unestimatable — routes to grid_bucketed_contains_join, whose
    equi-join on coarse grid cells hash-partitions both sides instead
    of broadcasting the growing one. ``poly_key`` (unique polygon key
    columns) is required for semi/anti under the bucketed route.
    """
    if strategy == "auto":
        est = estimated_plan_size_bytes(points)
        if est is not None:
            strategy = "broadcast" if est <= broadcast_threshold else "bucketed"
        else:
            # no estimate (python-created frames, Connect): stay
            # scale-safe when the bucketed route is usable, else
            # broadcast — at real scale inputs come from parquet scans,
            # which always carry estimates
            usable = how == "inner" or bool(poly_key)
            strategy = "bucketed" if usable else "broadcast"
    if strategy == "bucketed":
        return grid_bucketed_contains_join(
            polygons, points, cell_size, ring_col, px_col, py_col,
            how=how, poly_key=poly_key,
        )
    bbox = ring_bbox(F.col(ring_col))
    polys = polygons.withColumn("_bbox", bbox)
    px, py = F.col(px_col), F.col(py_col)
    cond = (
        (px >= F.col("_bbox.xmin"))
        & (px <= F.col("_bbox.xmax"))
        & (py >= F.col("_bbox.ymin"))
        & (py <= F.col("_bbox.ymax"))
        & point_in_ring(px, py, F.col(ring_col))
    )
    joined = polys.join(F.broadcast(points), cond, how)
    return joined.drop("_bbox")


def grid_bucketed_contains_join(
    polygons: DataFrame,
    points: DataFrame,
    cell_size: float,
    ring_col: str = "ring",
    px_col: str = "longitude",
    py_col: str = "latitude",
    how: str = "inner",
    poly_key: list[str] | None = None,
) -> DataFrame:
    """Hash-joinable contains-join for two LARGE sides: explode each
    polygon's bbox into the coarse grid cells it overlaps, bucket points
    by cell, equi-join on cell, then exact ray-cast. Turns the O(N*M)
    theta-join into a shuffle hash join on cell keys — the 100 TB path.

    No pair duplication: a point lives in exactly one cell, and a
    polygon overlaps that cell at most once (the bbox cells are a
    distinct sequence), so each (polygon, point) pair joins once.

    ``how="left_semi"`` / ``"left_anti"`` reduce the inner hits to
    distinct ``poly_key`` values (tiny — one row per matched polygon,
    broadcastable by AQE) and semi/anti-join the original polygons
    against them, preserving the exact left-side rows.
    """
    bbox = ring_bbox(F.col(ring_col))
    polys = (
        polygons.withColumn("_bbox", bbox)
        .withColumn(
            "_cx",
            F.explode(
                F.sequence(
                    F.floor(F.col("_bbox.xmin") / cell_size),
                    F.floor(F.col("_bbox.xmax") / cell_size),
                )
            ),
        )
        .withColumn(
            "_cy",
            F.explode(
                F.sequence(
                    F.floor(F.col("_bbox.ymin") / cell_size),
                    F.floor(F.col("_bbox.ymax") / cell_size),
                )
            ),
        )
    )
    pts = points.withColumn("_cx", F.floor(F.col(px_col) / cell_size)).withColumn(
        "_cy", F.floor(F.col(py_col) / cell_size)
    )
    inner = polys.join(pts, ["_cx", "_cy"], "inner").filter(
        point_in_ring(F.col(px_col), F.col(py_col), F.col(ring_col))
    )
    if how == "inner":
        return inner.drop("_cx", "_cy", "_bbox")
    if how not in ("left_semi", "left_anti"):
        raise ValueError(f"unsupported how: {how}")
    if not poly_key:
        raise ValueError("poly_key is required for semi/anti bucketed joins")
    hits = inner.select(*poly_key).distinct()
    return polygons.join(hits, poly_key, how)
