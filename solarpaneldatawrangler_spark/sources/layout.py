"""Z-ordered parquet layout: the data-skipping lever for 2-D range
queries over an append-only tile/point corpus.

Parquet readers prune at two granularities — files (partition values,
footer min/max) and row groups (per-column min/max statistics). Both
prune on a RANGE of the stored order, so what a bbox query can skip is
decided entirely by the write-time sort: row-major order (sort by
column, then row) clusters one axis and leaves the other spanning
every file, so a small bbox still intersects nearly every row group's
row-stat range; sorting by the interleaved ``zorder_key`` bounds both
axes in every contiguous run, so the same bbox touches only the few
row groups whose (column, row) stats actually overlap it. This is the
same mechanism Delta/Iceberg sell as OPTIMIZE ZORDER BY; here it is
20 lines over open parquet.

Scale shape: `repartitionByRange` on the z-key samples the key
distribution (range boundaries from a driver-side sample, not a full
sort on one task), then each task sorts its slice — the standard
distributed total-order idiom, linear scale-out to any corpus size.
One file per range partition; row-group size stays the reader's
pruning quantum, set by ``parquet.block.size``.

The reference's imagery store (gather_city_shapes.py's
directory-of-PNG-tiles keyed by slippy x/y) gets locality from the
filesystem tree; this module is the columnar-analytics analog with a
MEASURED skipping proof (`bbox_rowgroup_stats`) instead of an assumed
one — bench.py records probed-vs-total row groups for both layouts as
`zorder_io`.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.functions.tiles import zorder_key


def write_zordered(
    df: DataFrame,
    path: str,
    col: str = "column",
    row: str = "row",
    n_files: int = 8,
    block_bytes: int = 64 * 1024,
) -> None:
    """Write ``df`` to parquet clustered by the Morton interleave of
    (``col``, ``row``). The z-key is computed, range-partitioned and
    sorted on, then DROPPED — consumers query the plain coordinate
    columns; the clustering lives only in the file/row-group order and
    its min/max stats. Small ``block_bytes`` keeps row groups small
    enough that skipping has granularity to work with (tune upward for
    real corpora: the quantum of IO saved per skip is one row group)."""
    z = zorder_key(F.col(col), F.col(row)).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.option("parquet.block.size", block_bytes)
        .mode("overwrite")
        .parquet(path)
    )


def write_rowmajor(
    df: DataFrame,
    path: str,
    col: str = "column",
    row: str = "row",
    n_files: int = 8,
    block_bytes: int = 64 * 1024,
) -> None:
    """The comparison layout: identical data, identical file/row-group
    sizing, sorted row-major (column, then row) — what a naive
    'sort by x' write produces. Exists so the z-order win is a
    measured delta between two otherwise-identical writes, not a
    claim."""
    (
        df.repartitionByRange(n_files, F.col(col), F.col(row))
        .sortWithinPartitions(col, row)
        .write.option("parquet.block.size", block_bytes)
        .mode("overwrite")
        .parquet(path)
    )


def bbox_rowgroup_stats(
    path: str,
    col_range: tuple[int, int],
    row_range: tuple[int, int],
    col: str = "column",
    row: str = "row",
) -> dict[str, int]:
    """Row groups a bbox query MUST read under this layout, straight
    from the parquet footers' per-column min/max statistics — the same
    stats Spark's reader prunes with, counted here engine-neutrally so
    the bench artifact carries layout quality as data, not prose.
    Ranges are inclusive on both ends (tile coordinates)."""
    import pyarrow.parquet as pq

    (c_lo, c_hi), (r_lo, r_hi) = col_range, row_range
    total = probed = 0
    bytes_total = bytes_probed = 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        meta = pq.ParquetFile(f).metadata
        names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        ci, ri = names[col], names[row]
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            total += 1
            size = rg.total_byte_size
            bytes_total += size
            cs, rs = rg.column(ci).statistics, rg.column(ri).statistics
            hit = (
                cs is None
                or rs is None
                or (cs.min <= c_hi and cs.max >= c_lo
                    and rs.min <= r_hi and rs.max >= r_lo)
            )
            if hit:
                probed += 1
                bytes_probed += size
    return {
        "rowgroups_total": total,
        "rowgroups_probed": probed,
        "bytes_total": bytes_total,
        "bytes_probed": bytes_probed,
    }
