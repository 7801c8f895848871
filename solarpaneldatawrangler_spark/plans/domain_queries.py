"""Reference-domain operator queries (SURVEY.md §2.8 F1-F4/F11, §2.9
G1/G3/G10, §2.3 J5/J6) — tile projection math, grid enumeration,
dilation/GC, connected components, and the two-phase spatial
contains-join — exercised over deterministic tile/polygon/point data
derived in-query from the star tables (FIXTURES.md §3 mapping), so the
DuckDB oracle can reproduce the exact inputs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
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
from solarpaneldatawrangler_spark.operators.clustering import connected_components
from solarpaneldatawrangler_spark.operators.grid import enumerate_grid, gc_retention
from solarpaneldatawrangler_spark.operators.spatial import spatial_join_contains
from solarpaneldatawrangler_spark.plans.catalog import register
from solarpaneldatawrangler_spark.sources.star import load_table


# --- F1: deg2num projection (process_city_shapes.py:18-35) ------------------

@register(
    "q30_deg2num",
    oracle="""
    WITH pts AS (
        SELECT c_custkey,
               (c_custkey % 3600) / 10.0 - 180.0 + 0.05 AS lon,
               (c_custkey % 1600) / 10.0 - 80.0 + 0.05 AS lat
        FROM customer
    )
    SELECT c_custkey,
           CAST(FLOOR((lon + 180.0) / 360.0 * 1024.0) AS BIGINT) AS tile_column,
           CAST(FLOOR((1.0 - LN(TAN(RADIANS(lat)) + 1.0 / COS(RADIANS(lat))) / PI()) / 2.0 * 1024.0) AS BIGINT) AS tile_row
    FROM pts
    """,
    doc="F1 deg2num Web-Mercator projection as pure Catalyst expressions "
    "(process_city_shapes.py:18-35; int truncation == floor for valid lat).",
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        ((F.col("c_custkey") % 3600) / 10.0 - 180.0 + 0.05).alias("lon"),
        ((F.col("c_custkey") % 1600) / 10.0 - 80.0 + 0.05).alias("lat"),
    )
    return pts.select(
        "c_custkey",
        deg2num_column(F.col("lon"), 10).alias("tile_column"),
        deg2num_row(F.col("lat"), 10).alias("tile_row"),
    )


# --- F2: num2deg inverse projection (process_city_shapes.py:38-59) ----------

def _q31_oracle() -> str:
    from solarpaneldatawrangler_spark.functions.tiles import zorder_sql

    return f"""
    WITH tiles AS (
        SELECT p_partkey,
               p_partkey % 1024 AS c,
               (p_partkey * 7) % 1024 AS r
        FROM part
    ),
    corners AS (
        SELECT p_partkey, c, r, i,
               CASE i WHEN 0 THEN c WHEN 1 THEN c + 1 WHEN 2 THEN c + 1
                      WHEN 3 THEN c ELSE c END AS cx,
               CASE i WHEN 0 THEN r WHEN 1 THEN r WHEN 2 THEN r + 1
                      WHEN 3 THEN r + 1 ELSE r END AS cy
        FROM tiles CROSS JOIN generate_series(0, 4) g(i)
    )
    SELECT p_partkey, i AS point_idx,
           ROUND((c + 0.5) / 1024.0 * 360.0 - 180.0, 9) AS lon,
           ROUND(DEGREES(ATAN((EXP({math.pi} * (1.0 - 2.0 * (r + 0.5) / 1024.0))
                 - EXP(-({math.pi} * (1.0 - 2.0 * (r + 0.5) / 1024.0)))) / 2.0)), 9) AS lat,
           ROUND(cx / 1024.0 * 360.0 - 180.0, 9) AS ring_lon,
           ROUND(DEGREES(ATAN((EXP({math.pi} * (1.0 - 2.0 * cy / 1024.0))
                 - EXP(-({math.pi} * (1.0 - 2.0 * cy / 1024.0)))) / 2.0)), 9) AS ring_lat,
           {zorder_sql('c', 'r')} AS z
    FROM corners
    """


@register(
    "q31_num2deg",
    oracle=_q31_oracle(),
    doc="F2 num2deg center-of-tile inverse projection "
    "(process_city_shapes.py:38-59) + F11 closed 5-point tile bbox ring "
    "in lon/lat (maproulette.py:21-27): the ring is built as a Catalyst "
    "array expression then posexploded alongside the tile-center "
    "coordinates. sinh spelled as (e^x-e^-x)/2 so any IEEE engine "
    "reproduces it bit-for-bit; rounded to 9 decimals. MERGED (r10, "
    "absorbing retired q74): each tile row also carries its Morton / "
    "Z-order key z (functions.tiles.zorder_key — the write-time "
    "clustering key that lets parquet row-group min/max stats prune "
    "BOTH axes of a bbox query; sources.layout.write_zordered, measured "
    "probed-vs-total proof in bench zorder_io). Pure codegen magic-"
    "number bit spread — 10 integer ops per coordinate, no UDF; the "
    "oracle replays the identical spread via the shared zorder_sql "
    "builder, so the interleave cannot drift between engines. Hashed "
    "surfaces: tile-center + ring lon/lat (num2deg/tile_bbox_ring); "
    "z (zorder_key over the SAME c,r derivation retired q74 used).",
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.functions.tiles import zorder_key

    part = load_table(spark, sf_dir, "part")
    tiles = part.select(
        "p_partkey",
        (F.col("p_partkey") % 1024).alias("c"),
        ((F.col("p_partkey") * 7) % 1024).alias("r"),
    )
    ring = tile_bbox_ring(F.col("c"), F.col("r"), 10)
    return (
        tiles.select(
            "p_partkey",
            F.round(num2deg_lon(F.col("c"), 10, center=True), 9).alias("lon"),
            F.round(num2deg_lat(F.col("r"), 10, center=True), 9).alias("lat"),
            zorder_key(F.col("c"), F.col("r")).alias("z"),
            F.posexplode(ring).alias("point_idx", "pt"),
        )
        .select(
            "p_partkey",
            "point_idx",
            "lon",
            "lat",
            F.round(F.element_at("pt", 1), 9).alias("ring_lon"),
            F.round(F.element_at("pt", 2), 9).alias("ring_lat"),
            "z",
        )
    )


# --- F3: centroid distance (solardb.py:121-134) -----------------------------

@register(
    "q32_tile_distance",
    oracle="""
    WITH tiles AS (
        SELECT event_id, user_id, user_id % 100 AS r, event_id % 100 AS c
        FROM events
    )
    SELECT event_id,
           SQRT((r - 50.5) * (r - 50.5) + (c - 50.5) * (c - 50.5)) AS centroid_distance,
           (user_id % 1000) - (user_id % 1000) % 20 AS snap_x,
           (event_id % 1000) - (event_id % 1000) % 20 AS snap_y
    FROM tiles
    WHERE SQRT((r - 50.5) * (r - 50.5) + (c - 50.5) * (c - 50.5)) <= 30.0
    """,
    doc="F3/J1 centroid-distance compute + threshold (solardb.py:121-134): "
    "sqrt/multiply only — IEEE-deterministic, no rounding needed. Plus "
    "the F4 imagery-request grid snap x - x%g (imagery.py:149) — the "
    "400-tiles-per-API-call amortization key — on the surviving rows.",
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tiles = ev.select(
        "event_id",
        "user_id",
        (F.col("user_id") % 100).alias("r"),
        (F.col("event_id") % 100).alias("c"),
    )
    dist = tile_distance(F.col("r"), F.col("c"), F.lit(50.5), F.lit(50.5))
    return (
        tiles.select(
            "event_id",
            dist.alias("centroid_distance"),
            grid_snap(F.col("user_id") % 1000, 20).alias("snap_x"),
            grid_snap(F.col("event_id") % 1000, 20).alias("snap_y"),
        )
        .filter(F.col("centroid_distance") <= 30.0)
    )


# --- J5: imagery GC retention anti-join (run_inference.py:63-92) ------------

@register(
    "q35_gc_retention",
    oracle="""
    WITH tiles AS (
        SELECT DISTINCT user_id % 50 AS "column", event_id % 50 AS "row" FROM events
    ),
    pos AS (
        SELECT DISTINCT user_id % 50 AS c, event_id % 50 AS r
        FROM events WHERE event_type = 'purchase' AND value > 15
    ),
    dilated AS (
        SELECT DISTINCT c + dx.dx AS c, r + dy.dy AS r
        FROM pos
        CROSS JOIN (VALUES (-1), (0), (1)) dx(dx)
        CROSS JOIN (VALUES (-1), (0), (1)) dy(dy)
    )
    SELECT t."column", t."row"
    FROM tiles t
    WHERE NOT EXISTS (
        SELECT 1 FROM dilated d WHERE d.c = t."column" AND d.r = t."row"
    )
    """,
    doc="J5 imagery GC: delete set = all tiles anti-join 3x3-dilated "
    "positives (run_inference.py:63-92) — batch loops replaced by one "
    "anti-join plan.",
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tiles = ev.select(
        (F.col("user_id") % 50).alias("column"), (F.col("event_id") % 50).alias("row")
    ).distinct()
    pos = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 15))
        .select(
            (F.col("user_id") % 50).alias("column"),
            (F.col("event_id") % 50).alias("row"),
        )
        .distinct()
    )
    return gc_retention(tiles, pos)


# --- G3: grid enumeration (process_city_shapes.py:146-171) ------------------

@register(
    "q36_grid_enum",
    oracle="""
    WITH bboxes AS (
        SELECT r_name,
               r_regionkey * 10 AS xmin, r_regionkey * 10 + 3 + r_regionkey AS xmax,
               r_regionkey * 5 AS ymin,  r_regionkey * 5 + 2 + r_regionkey AS ymax
        FROM region
    )
    SELECT r_name, gx.x AS "column", gy.y AS "row"
    FROM bboxes
    CROSS JOIN generate_series(0, 100) gx(x)
    CROSS JOIN generate_series(0, 100) gy(y)
    WHERE gx.x BETWEEN xmin AND xmax AND gy.y BETWEEN ymin AND ymax
    """,
    doc="G3 bbox grid enumeration (process_city_shapes.py:146-171): the "
    "reference's single-core meshgrid bottleneck as sequence+explode — "
    "embarrassingly parallel, chunk-split so one huge bbox can't pin a task.",
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    bboxes = region.select(
        "r_name",
        (F.col("r_regionkey") * 10).cast("long").alias("xmin"),
        (F.col("r_regionkey") * 10 + 3 + F.col("r_regionkey")).cast("long").alias("xmax"),
        (F.col("r_regionkey") * 5).cast("long").alias("ymin"),
        (F.col("r_regionkey") * 5 + 2 + F.col("r_regionkey")).cast("long").alias("ymax"),
    )
    return enumerate_grid(bboxes).select("r_name", "column", "row")


# --- J6: two-phase spatial contains-join (maproulette.py:69-83) -------------

_SPATIAL_ORACLE_INPUTS = """
    polys AS (
        SELECT n_nationkey, n_name,
               CAST((n_nationkey % 5) * 10 AS DOUBLE) AS x0,
               CAST((n_nationkey // 5) * 10 AS DOUBLE) AS y0,
               CAST(3 + n_nationkey % 4 AS DOUBLE) AS w,
               n_nationkey % 2 = 1 AS is_triangle
        FROM nation
    ),
    pts AS (
        SELECT c_custkey,
               (c_custkey % 500) / 10.0 + 0.05 AS px,
               ((c_custkey // 7) % 500) / 10.0 + 0.03 AS py
        FROM customer
    ),
    hits AS (
        SELECT p.n_nationkey, q.c_custkey
        FROM polys p JOIN pts q
          ON q.px > p.x0 AND q.py > p.y0
         AND CASE WHEN p.is_triangle
                  THEN (q.px - p.x0) + (q.py - p.y0) < p.w
                  ELSE q.px < p.x0 + p.w AND q.py < p.y0 + p.w
             END
    )
"""


def _spatial_frames(spark: SparkSession, sf_dir: str):
    """Deterministic polygons (squares; triangles for odd keys) from
    nation, points from customer. Rings are closed GeoJSON-shaped
    array<array<double>>; points offset by 0.05 so none lies on an edge
    (crossing-number boundary semantics stay unambiguous)."""
    nation = load_table(spark, sf_dir, "nation")
    x0 = ((F.col("n_nationkey") % 5) * 10).cast("double")
    y0 = (F.floor(F.col("n_nationkey") / 5) * 10).cast("double")
    w = (3 + F.col("n_nationkey") % 4).cast("double")
    square = F.array(
        F.array(x0, y0), F.array(x0 + w, y0), F.array(x0 + w, y0 + w),
        F.array(x0, y0 + w), F.array(x0, y0),
    )
    triangle = F.array(
        F.array(x0, y0), F.array(x0 + w, y0), F.array(x0, y0 + w), F.array(x0, y0)
    )
    polys = nation.select(
        "n_nationkey",
        "n_name",
        F.when(F.col("n_nationkey") % 2 == 1, triangle).otherwise(square).alias("ring"),
    )
    cust = load_table(spark, sf_dir, "customer")
    # py offset (0.03) deliberately differs from px (0.05): with integer
    # ring coords, px+py then never lands exactly on a diagonal edge in
    # decimal, so float rounding can't flip containment at the boundary.
    pts = cust.select(
        "c_custkey",
        ((F.col("c_custkey") % 500) / 10.0 + 0.05).alias("longitude"),
        ((F.floor(F.col("c_custkey") / 7) % 500) / 10.0 + 0.03).alias("latitude"),
    )
    return polys, pts


@register(
    "q38_spatial_contains",
    oracle=f"""
    WITH {_SPATIAL_ORACLE_INPUTS}
    SELECT n_nationkey, COUNT(*) AS n_points
    FROM hits GROUP BY n_nationkey
    """,
    doc="J6 phase-1+2 contains-join (maproulette.py:69-83): bbox range "
    "prefilter (Catalyst-pushable) + exact ray-cast point-in-ring as a "
    "higher-order-function expression; oracle reproduces containment "
    "geometrically for the square/triangle fixtures.",
)
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    polys, pts = _spatial_frames(spark, sf_dir)
    joined = spatial_join_contains(polys, pts, how="inner")
    return joined.groupBy("n_nationkey").agg(F.count(F.lit(1)).alias("n_points"))


@register(
    "q39_spatial_anti",
    oracle=f"""
    WITH {_SPATIAL_ORACLE_INPUTS}
    SELECT p.n_nationkey, p.n_name
    FROM polys p
    WHERE NOT EXISTS (SELECT 1 FROM hits h WHERE h.n_nationkey = p.n_nationkey)
    """,
    doc="J6 spatial ANTI-join proper: predicted polygons containing no "
    "known OSM node survive (maproulette.py:69-83 delete-on-hit). Runs "
    "the grid-bucketed route (strategy='bucketed'): bbox cells explode "
    "into a coarse grid, points bucket to their cell, hits come from a "
    "hash equi-join on cell keys, and the anti-join replays against the "
    "distinct hit polygon keys — no broadcast of the growing points "
    "side, no nested-loop join (plan-asserted in test_physical_plans).",
)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    polys, pts = _spatial_frames(spark, sf_dir)
    return spatial_join_contains(
        polys, pts, how="left_anti", strategy="bucketed",
        cell_size=10.0, poly_key=["n_nationkey"],
    ).select("n_nationkey", "n_name")


# --- P8/J6 over MultiPolygon: multi-part containment ------------------------

@register(
    "q41_multipolygon",
    oracle="""
    WITH polys AS (
        SELECT n_nationkey,
               CAST((n_nationkey % 5) * 10 AS DOUBLE) AS x0,
               CAST((n_nationkey // 5) * 10 AS DOUBLE) AS y0,
               CAST(3 + n_nationkey % 4 AS DOUBLE) AS w
        FROM nation
    ),
    pts AS (
        SELECT c_custkey,
               (c_custkey % 500) / 10.0 + 0.05 AS px,
               ((c_custkey // 7) % 500) / 10.0 + 0.03 AS py
        FROM customer
    ),
    hits AS (
        SELECT DISTINCT p.n_nationkey, q.c_custkey
        FROM polys p JOIN pts q
          ON (q.px > p.x0 AND q.px < p.x0 + p.w
              AND q.py > p.y0 AND q.py < p.y0 + p.w)
          OR (q.px > p.x0 + 25 AND q.px < p.x0 + 25 + p.w
              AND q.py > p.y0 + 25 AND q.py < p.y0 + 25 + p.w)
    )
    SELECT n_nationkey, COUNT(*) AS n_points
    FROM hits GROUP BY n_nationkey
    """,
    doc="MultiPolygon containment (the reference accepts Polygon OR "
    "MultiPolygon city boundaries, gather_city_shapes.py:50-52, and "
    "iterates the parts, process_city_shapes.py:77-90): each nation is "
    "a TWO-part multipolygon (mainland + island squares, offset so an "
    "island never overlaps its mainland); points count once per nation "
    "when inside ANY part. Spark: posexplode the parts, size-aware "
    "two-phase contains-join per part, distinct (nation, point) pairs "
    "(operators.spatial.multi_ring_contains_join). Points are offset "
    "0.05/0.03 off the integer square edges so boundary semantics stay "
    "unambiguous.",
)
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.operators.spatial import multi_ring_contains_join

    nation = load_table(spark, sf_dir, "nation")
    x0 = ((F.col("n_nationkey") % 5) * 10).cast("double")
    y0 = (F.floor(F.col("n_nationkey") / 5) * 10).cast("double")
    w = (3 + F.col("n_nationkey") % 4).cast("double")

    def square(ox: float, oy: float):
        ax, ay = x0 + ox, y0 + oy
        return F.array(
            F.array(ax, ay), F.array(ax + w, ay), F.array(ax + w, ay + w),
            F.array(ax, ay + w), F.array(ax, ay),
        )

    polys = nation.select(
        "n_nationkey", F.array(square(0.0, 0.0), square(25.0, 25.0)).alias("rings")
    )
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        ((F.col("c_custkey") % 500) / 10.0 + 0.05).alias("longitude"),
        ((F.floor(F.col("c_custkey") / 7) % 500) / 10.0 + 0.03).alias("latitude"),
    )
    hits = multi_ring_contains_join(
        polys, pts, poly_key=["n_nationkey"], point_key=["c_custkey"]
    )
    return hits.groupBy("n_nationkey").agg(F.count(F.lit(1)).alias("n_points"))


# --- G1: connected components (run_inference.py:21-60) ----------------------

@register(
    "q40_connected_components",
    oracle="""
    WITH RECURSIVE pos AS (
        SELECT DISTINCT user_id % 1000 AS c, event_id % 1000 AS r
        FROM events WHERE event_type = 'purchase'
    ),
    nodes AS (SELECT c * 4294967296 + r AS id, c, r FROM pos),
    edges AS (
        SELECT a.id AS src, b.id AS dst
        FROM nodes a JOIN nodes b
          ON (b.c = a.c + 1 AND b.r = a.r) OR (b.c = a.c AND b.r = a.r + 1)
           OR (b.c = a.c - 1 AND b.r = a.r) OR (b.c = a.c AND b.r = a.r - 1)
    ),
    reach(id, label) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.dst, r.label FROM reach r JOIN edges e ON r.id = e.src
    )
    SELECT n.c AS "column", n.r AS "row", MIN(r.label) AS cluster_id
    FROM nodes n JOIN reach r ON n.id = r.id
    GROUP BY n.c, n.r
    """,
    doc="G1 4-adjacency connected components (run_inference.py:21-60): "
    "iterative min-label propagation (join+agg per round, localCheckpoint "
    "to cut lineage) replacing the reference's recursive flood fill; "
    "labels are deterministic (min packed cell id). Oracle: recursive-CTE "
    "label reachability.",
)
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pos = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            (F.col("user_id") % 1000).alias("column"),
            (F.col("event_id") % 1000).alias("row"),
        )
        .distinct()
    )
    return connected_components(pos)
