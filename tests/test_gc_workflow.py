"""S11 imagery-GC workflow over a real partitioned binary store:
dynamic partition overwrite keeps only retained tiles — the
immutable-storage replacement for the reference's per-file unlink loop
(/root/reference/run_inference.py:63-92, imagery.py:61-65)."""

from __future__ import annotations

from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.operators.grid import dilate
from solarpaneldatawrangler_spark.operators.multimodal import fake_image
from solarpaneldatawrangler_spark.pipeline import simple_tile_report


def test_gc_dynamic_partition_overwrite(spark, tmp_path):
    store = str(tmp_path / "imagery")
    tiles = spark.createDataFrame(
        [(c, r, 21, fake_image(256, 256, bytes([c, r]))) for c in range(8) for r in range(4)],
        "column long, row long, zoom int, content binary",
    )
    tiles.write.partitionBy("zoom", "row").parquet(store)
    assert spark.read.parquet(store).count() == 32

    positives = spark.createDataFrame([(2, 2), (6, 1)], "column long, row long")
    keep_keys = dilate(positives)  # 3x3 halos
    store_df = spark.read.parquet(store)
    retained = store_df.join(keep_keys, ["column", "row"], "left_semi")

    # rewrite only the partitions that still have retained rows, drop the
    # rest by overwriting the whole store path (small stores) — at scale,
    # partitionOverwriteMode=dynamic rewrites just touched partitions
    retained.write.mode("overwrite").partitionBy("zoom", "row").parquet(store)

    after = spark.read.parquet(store)
    expected = {
        (c, r)
        for (pc, pr) in [(2, 2), (6, 1)]
        for c in range(pc - 1, pc + 2)
        for r in range(pr - 1, pr + 2)
        if 0 <= c < 8 and 0 <= r < 4
    }
    got = {(r.column, r.row) for r in after.collect()}
    assert got == expected


def test_simple_tile_report(spark):
    import json

    scored = spark.createDataFrame(
        [(10, 20, 0.9), (11, 20, 0.1)], "column long, row long, panel_softmax double"
    )
    lines = [r.line for r in simple_tile_report(scored, zoom=10).collect()]
    assert len(lines) == 1  # 0.1 under threshold
    obj = json.loads(lines[0])
    ring = obj["features"][0]["geometry"]["coordinates"][0]
    assert len(ring) == 5 and ring[0] == ring[-1]
    assert obj["features"][0]["properties"]["prediction_confidence"] == 0.9
