"""Unit tests for the NumPy geometry layer (G2 simplify, A7 union ring)."""

from __future__ import annotations

import numpy as np

from solarpaneldatawrangler_spark.operators.geometry import (
    buffer_convex,
    cluster_union_rings,
    convex_hull,
    simplify_polygon_points,
    union_ring_of_cells,
)


def test_convex_hull_square_with_interior():
    pts = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [1, 1], [0.5, 0.5]])
    hull = convex_hull(pts)
    assert sorted(map(tuple, hull)) == [(0, 0), (0, 2), (2, 0), (2, 2)]


def test_buffer_grows_extent():
    hull = convex_hull(np.array([[0, 0], [1, 0], [1, 1], [0, 1]]))
    fat = buffer_convex(hull, 0.5)
    assert fat[:, 0].min() <= -0.49 and fat[:, 0].max() >= 1.49


def test_simplify_returns_closed_ring():
    ring = simplify_polygon_points(np.array([[0, 0], [4, 0], [4, 3], [0, 3], [2, 1]]))
    assert np.array_equal(ring[0], ring[-1])
    assert len(ring) >= 5


def test_union_ring_single_cell():
    ring = union_ring_of_cells([(2, 3)])
    assert ring[0] == ring[-1]
    assert set(map(tuple, ring)) == {(2, 3), (3, 3), (3, 4), (2, 4)}
    assert len(ring) == 5


def test_union_ring_l_shape():
    # cells (0,0),(1,0),(1,1): outline is an L-hexagon, area 3
    ring = union_ring_of_cells([(0, 0), (1, 0), (1, 1)])
    assert ring[0] == ring[-1]
    assert len(ring) == 7  # 6 corners + closing point
    xs = [p[0] for p in ring[:-1]]
    ys = [p[1] for p in ring[:-1]]
    # shoelace area == 3 (CCW positive)
    area = 0.5 * sum(
        xs[i] * ys[(i + 1) % 6] - xs[(i + 1) % 6] * ys[i] for i in range(6)
    )
    assert area == 3.0


def test_union_ring_with_hole_keeps_outer():
    # 3x3 ring of cells with center missing: outer ring is the 3x3 square
    cells = [(c, r) for c in range(3) for r in range(3) if (c, r) != (1, 1)]
    ring = union_ring_of_cells(cells)
    xs = [p[0] for p in ring]
    ys = [p[1] for p in ring]
    assert min(xs) == 0 and max(xs) == 3 and min(ys) == 0 and max(ys) == 3
    n = len(ring) - 1
    area = 0.5 * abs(
        sum(xs[i] * ys[i + 1] - xs[i + 1] * ys[i] for i in range(n))
    )
    assert area == 9.0  # outer boundary only; hole dropped like .exterior


def test_cluster_union_rings_spark(spark):
    tiles = spark.createDataFrame(
        [(1, 0, 0, 0.9), (1, 1, 0, 0.3), (1, 1, 1, 0.7), (2, 10, 10, 0.5)],
        "cluster_id long, column long, row long, panel_softmax double",
    )
    out = {r.cluster_id: r for r in cluster_union_rings(tiles).collect()}
    assert out[1].confidence == 0.9
    assert out[2].confidence == 0.5
    assert len(out[2].ring) == 5
    assert len(out[1].ring) == 7
