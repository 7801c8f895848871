"""Polygon geometry operators (SURVEY.md §2.9 G2/G7, §2.4 A7) without a
geo library: pure NumPy inside Arrow-batched pandas UDFs.

The reference leans on Shapely (convex_hull/simplify/buffer,
/root/reference/process_city_shapes.py:93-104; cascaded_union,
/root/reference/maproulette.py:54). Neither Shapely nor Sedona ships in
this environment, so:

- convex hull: Andrew's monotone chain (exact);
- buffer: Minkowski sum of the hull with a 16-gon disk approximation,
  then re-hull (deterministic; matches the reference's intent — grow the
  search polygon slightly — not Shapely's exact arc geometry);
- cluster union ring: the unioned outline of a set of unit grid squares
  via shared-edge cancellation + boundary walk (exact for tile clusters,
  which is the only shape the reference ever unions).

All are applied per-group with applyInPandas: polygons are small (100s
of points), groups are independent — the scale axis is the NUMBER of
polygons/clusters, which Spark distributes.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns hull vertices CCW, not closed."""
    pts = np.unique(points, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(iterable):
        out: list[np.ndarray] = []
        for p in iterable:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def buffer_convex(hull: np.ndarray, radius: float, arc_points: int = 16) -> np.ndarray:
    """Approximate Minkowski sum of a convex ring with a disk: offset
    every vertex along a 16-gon of directions, re-hull. CCW, not closed."""
    if radius <= 0 or len(hull) == 0:
        return hull
    angles = [2 * math.pi * i / arc_points for i in range(arc_points)]
    disk = np.array([[radius * math.cos(a), radius * math.sin(a)] for a in angles])
    fat = (hull[:, None, :] + disk[None, :, :]).reshape(-1, 2)
    return convex_hull(fat)


def simplify_polygon_points(points: np.ndarray, buffer_radius: float = 0.004) -> np.ndarray:
    """G2 polygon simplify (reference: shape().convex_hull.simplify(.001)
    .buffer(.004)): hull + small outward buffer. The hull already drops
    collinear detail, subsuming the .simplify(0.001) step. Returns a
    CLOSED ring (first point repeated)."""
    ring = buffer_convex(convex_hull(points), buffer_radius)
    if len(ring) and not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    return ring


def union_ring_of_cells(cells: list[tuple[int, int]]) -> list[list[float]]:
    """Exterior ring of the union of unit squares [c,c+1]x[r,r+1]
    (SURVEY.md A7 — the reference's cascaded_union of tile bboxes +
    .exterior, /root/reference/maproulette.py:45-56).

    Shared-edge cancellation: an edge belongs to the boundary iff it is
    used by exactly one cell. Walk the boundary from the lexicographically
    smallest corner keeping the interior on the left; returns the CLOSED
    outer ring (holes, which the reference's .exterior also drops, are
    ignored).
    """
    cellset = set(cells)
    # directed boundary edges, CCW around each cell, cancelled when the
    # neighbor sharing that edge exists
    edges: dict[tuple[int, int], list[tuple[int, int]]] = defaultdict(list)
    for c, r in cellset:
        if (c, r - 1) not in cellset:  # bottom edge, left-to-right
            edges[(c, r)].append((c + 1, r))
        if (c + 1, r) not in cellset:  # right edge, up
            edges[(c + 1, r)].append((c + 1, r + 1))
        if (c, r + 1) not in cellset:  # top edge, right-to-left
            edges[(c + 1, r + 1)].append((c, r + 1))
        if (c - 1, r) not in cellset:  # left edge, down
            edges[(c, r + 1)].append((c, r))
    if not edges:
        return []
    start = min(edges.keys())
    ring = [start]
    prev = None
    cur = start
    while True:
        nxts = edges[cur]
        if len(nxts) == 1:
            nxt = nxts[0]
        else:
            # pinch corner (two diagonal cells): keep turning left
            # relative to the incoming direction for a simple outer ring
            dx, dy = cur[0] - prev[0], cur[1] - prev[1]
            left = (cur[0] - dy, cur[1] + dx)
            nxt = left if left in nxts else next(n for n in nxts if n != prev)
        ring.append(nxt)
        prev, cur = cur, nxt
        if cur == start:
            break
        if len(ring) > 4 * len(cellset) + 8:
            raise AssertionError("boundary walk failed to close")
    # merge collinear runs of unit edges so only true corners remain
    # (matches a geometry library's unioned exterior ring)
    corners: list[tuple[int, int]] = []
    n = len(ring) - 1  # last == first
    for i in range(n):
        a, b, c = ring[i - 1], ring[i], ring[(i + 1) % n]
        if (b[0] - a[0], b[1] - a[1]) != (c[0] - b[0], c[1] - b[1]):
            corners.append(b)
    # rotate so the ring starts at the lexicographically smallest corner
    k = corners.index(min(corners))
    corners = corners[k:] + corners[:k]
    corners.append(corners[0])
    return [[float(x), float(y)] for x, y in corners]


def cluster_union_rings(
    tiles: DataFrame,
    cluster_col: str = "cluster_id",
    col_name: str = "column",
    row_name: str = "row",
) -> DataFrame:
    """Per-cluster unioned outline + max confidence (SURVEY.md A7+A3):
    groupBy(cluster_id).applyInPandas — one shuffle on cluster_id; each
    group is one solar farm (tiny), so the python-side walk is O(group).

    Input columns: cluster_col, col_name, row_name[, panel_softmax].
    Output: cluster_id, ring (array<array<double>> in tile coords),
    confidence (max softmax, null if absent).
    """
    has_conf = "panel_softmax" in tiles.columns

    def one_cluster(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cells = list(zip(pdf[col_name].astype(int), pdf[row_name].astype(int)))
        ring = union_ring_of_cells(cells)
        conf = float(pdf["panel_softmax"].max()) if has_conf else None
        return pd.DataFrame(
            {"cluster_id": [key[0]], "ring": [ring], "confidence": [conf]}
        )

    out_schema = (
        "cluster_id long, ring array<array<double>>, confidence double"
    )
    return tiles.groupBy(cluster_col).applyInPandas(one_cluster, out_schema)
