"""Z-ordered parquet layout (sources/layout.py): the MEASURED
data-skipping claim — a bbox query over z-order-clustered files must
touch strictly fewer row groups than over the row-major layout of the
same data — plus the zorder_sql shared-builder parity that q74's
DuckDB oracle rests on."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.functions.tiles import zorder_key, zorder_sql
from solarpaneldatawrangler_spark.sources.layout import (
    bbox_rowgroup_stats,
    write_rowmajor,
    write_zordered,
)


def test_zorder_sql_matches_spark_column(spark):
    """ONE bit-spread definition feeds both engines: the Spark column
    and the DuckDB replay agree on every (c, r) in a 2^31-wide grid
    sample, including the axis extremes."""
    rows = [(0, 0), (1, 0), (0, 1), (255, 255), (12345, 54321),
            (2**31 - 1, 0), (0, 2**31 - 1), (2**31 - 1, 2**31 - 1)]
    df = spark.createDataFrame(rows, "c long, r long")
    got = {
        (x["c"], x["r"]): x["z"]
        for x in df.select(
            "c", "r", zorder_key(F.col("c"), F.col("r")).alias("z")
        ).collect()
    }
    con = duckdb.connect()
    sql = zorder_sql("c", "r")
    want = {
        (c, r): con.execute(
            f"SELECT {sql} FROM (SELECT {c} AS c, {r} AS r)"
        ).fetchone()[0]
        for c, r in rows
    }
    assert got == want


@pytest.fixture(scope="module")
def grid_layouts(spark, tmp_path_factory):
    """A 256x256 point grid written twice: z-ordered and row-major,
    identical file count and row-group sizing."""
    d = tmp_path_factory.mktemp("zorder")
    pts = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("column"),
        (F.col("id") / 256).cast("long").alias("row"),
        (F.col("id") * 3 % 1000).alias("payload"),
    )
    zp, rp = str(d / "z"), str(d / "rowmajor")
    write_zordered(pts, zp, n_files=8, block_bytes=16 * 1024)
    write_rowmajor(pts, rp, n_files=8, block_bytes=16 * 1024)
    return zp, rp


def test_bbox_skips_more_rowgroups_under_zorder(spark, grid_layouts):
    zp, rp = grid_layouts
    bbox = ((40, 55), (200, 215))  # 16x16 tile window
    z = bbox_rowgroup_stats(zp, *bbox)
    r = bbox_rowgroup_stats(rp, *bbox)
    # identical data, so totals agree up to row-group boundary jitter
    assert z["rowgroups_total"] >= 8 and r["rowgroups_total"] >= 8
    # the claim: z-order prunes BOTH axes; row-major writes leave the
    # row axis spanning whole files, so the same bbox touches far more
    assert z["rowgroups_probed"] < r["rowgroups_probed"], (z, r)
    assert z["rowgroups_probed"] <= z["rowgroups_total"] // 2, z
    # and the probed groups really contain the bbox rows: Spark filter
    # over each layout returns the identical 16x16 result
    (c_lo, c_hi), (r_lo, r_hi) = bbox
    cond = (
        (F.col("column").between(c_lo, c_hi))
        & (F.col("row").between(r_lo, r_hi))
    )
    got_z = sorted(
        (x["column"], x["row"], x["payload"])
        for x in spark.read.parquet(zp).filter(cond).collect()
    )
    got_r = sorted(
        (x["column"], x["row"], x["payload"])
        for x in spark.read.parquet(rp).filter(cond).collect()
    )
    assert got_z == got_r and len(got_z) == 16 * 16


def test_zorder_layout_roundtrips_all_rows(spark, grid_layouts):
    zp, rp = grid_layouts
    assert spark.read.parquet(zp).count() == 256 * 256
    assert spark.read.parquet(rp).count() == 256 * 256
    # clustering dropped the helper key: consumer schema is untouched
    assert sorted(spark.read.parquet(zp).columns) == [
        "column", "payload", "row",
    ]
