"""Golden fixtures for connected components (FIXTURES.md §2): isolated
tile, 2x2 block, L-shape, diagonal pair (must be SEPARATE under
4-adjacency — /root/reference/run_inference.py:48-52)."""

from __future__ import annotations

from solarpaneldatawrangler_spark.operators.clustering import connected_components


def _cluster_sets(df):
    rows = df.collect()
    by_label: dict[int, set] = {}
    for r in rows:
        by_label.setdefault(r.cluster_id, set()).add((r.column, r.row))
    return sorted(by_label.values(), key=lambda s: sorted(s))


def test_cc_golden(spark):
    cells = [
        (100, 100),                              # isolated
        (0, 0), (0, 1), (1, 0), (1, 1),          # 2x2 block
        (10, 10), (10, 11), (10, 12), (11, 12),  # L-shape
        (50, 50), (51, 51),                      # diagonal: two components
    ]
    df = spark.createDataFrame(cells, "column long, row long")
    comps = _cluster_sets(connected_components(df))
    assert comps == sorted(
        [
            {(100, 100)},
            {(0, 0), (0, 1), (1, 0), (1, 1)},
            {(10, 10), (10, 11), (10, 12), (11, 12)},
            {(50, 50)},
            {(51, 51)},
        ],
        key=lambda s: sorted(s),
    )


def test_cc_labels_deterministic(spark):
    cells = [(5, 5), (5, 6), (6, 5)]
    df = spark.createDataFrame(cells, "column long, row long")
    out = {(r.column, r.row): r.cluster_id for r in connected_components(df).collect()}
    # label = min packed id = 5 * 2^32 + 5
    expected = 5 * 4294967296 + 5
    assert set(out.values()) == {expected}
