"""Grid/tile operators (SURVEY.md §2.9 G3/G10, §2.3 J3/J5/J8).

The reference does these with NumPy meshgrids and Python sets on one
core (its stated bottleneck, /root/reference/process_city_shapes.py:150-152).
Here each is a generate/explode/join plan: embarrassingly parallel
across polygons and grid ranges, no driver-side materialization.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enumerate_grid(
    bboxes: DataFrame,
    xmin: str = "xmin",
    xmax: str = "xmax",
    ymin: str = "ymin",
    ymax: str = "ymax",
    max_cells_per_task: int = 4_000_000,
) -> DataFrame:
    """Enumerate every integer (column,row) cell inside each row's bbox
    (SURVEY.md G3; reference meshgrid /root/reference/process_city_shapes.py:146-171).

    Two chained sequence+explode stages. Scale note: a zoom-21 city bbox
    can be 10^7+ cells from ONE input row, which would pin a single
    task; we pre-split wide x-ranges into chunks (repartitioned) so cell
    generation parallelizes before the y-explode.
    """
    span = F.col(xmax) - F.col(xmin) + 1
    n_chunks = F.greatest(
        F.ceil(
            span
            * (F.col(ymax) - F.col(ymin) + 1)
            / F.lit(max_cells_per_task)
        ),
        F.lit(1),
    )
    chunked = (
        bboxes.withColumn("_nc", n_chunks)
        .withColumn("_chunk", F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)))
        .withColumn("_cxmin", F.col(xmin) + (span * F.col("_chunk") / F.col("_nc")).cast("long"))
        .withColumn(
            "_cxmax",
            F.least(
                F.col(xmin) + (span * (F.col("_chunk") + 1) / F.col("_nc")).cast("long") - 1,
                F.col(xmax),
            ),
        )
        .repartition("_chunk", xmin, ymin)
    )
    cells = (
        chunked.withColumn("column", F.explode(F.sequence(F.col("_cxmin"), F.col("_cxmax"))))
        .withColumn("row", F.explode(F.sequence(F.col(ymin), F.col(ymax))))
        .drop("_nc", "_chunk", "_cxmin", "_cxmax")
    )
    return cells


def dilate(
    tiles: DataFrame,
    radius: int = 1,
    col_name: str = "column",
    row_name: str = "row",
    keep: Sequence[str] = (),
) -> DataFrame:
    """(2r+1)^2 neighborhood dilation of tile keys (SURVEY.md G10;
    reference nested range loops /root/reference/run_inference.py:69-72).

    explode over a constant offset array — a narrow 1->(2r+1)^2 flatMap,
    then distinct on the dilated key. Feeds the imagery-GC anti-join (J5).
    """
    offsets = F.array(
        *[
            F.struct(F.lit(dc).alias("dc"), F.lit(dr).alias("dr"))
            for dc in range(-radius, radius + 1)
            for dr in range(-radius, radius + 1)
        ]
    )
    out = (
        tiles.withColumn("_o", F.explode(offsets))
        .select(
            (F.col(col_name) + F.col("_o.dc")).alias(col_name),
            (F.col(row_name) + F.col("_o.dr")).alias(row_name),
            *keep,
        )
        .dropDuplicates([col_name, row_name])
    )
    return out


def gc_retention(
    all_tiles: DataFrame,
    positives: DataFrame,
    radius: int = 1,
    col_name: str = "column",
    row_name: str = "row",
) -> DataFrame:
    """Imagery GC as a retention anti-join (SURVEY.md J5; reference
    /root/reference/run_inference.py:63-92): tiles to DELETE = all
    tiles minus the (2r+1)^2 dilation of positive tiles. Immutable-storage
    idiom: compute the delete (or retained) set, overwrite partitions.
    """
    keep_keys = dilate(positives, radius, col_name, row_name)
    return all_tiles.join(keep_keys, on=[col_name, row_name], how="left_anti")


def neighbor_edges(
    tiles: DataFrame, col_name: str = "column", row_name: str = "row"
) -> DataFrame:
    """4-adjacency edges between present tiles (feeds connected
    components, SURVEY.md G1). Returns columns (src, dst) of packed ids.

    Joins on the SINGLE packed bigint key: east neighbor = id + 2^32,
    south neighbor = id + 1 (valid while 0 <= row < 2^32, which zoom-21
    slippy rows satisfy by 10 orders of magnitude). A one-column bigint
    equi-join hash-partitions tighter than a two-expression key and
    halves the shuffle payload. Only E/S generated, then symmetrized.

    r16-opt (guide §2.4): the E and S candidates are exploded from each
    tile and matched in ONE equi-join — the previous per-delta join
    pair shuffled the tile relation twice more (4 exchanges vs 2) for
    the identical edge set.
    """
    packed = tiles.select(pack_cell(col_name, row_name).alias("id"))
    cand = packed.select(
        F.col("id").alias("src"),
        F.explode(
            F.array(
                F.col("id") + F.lit(4294967296).cast("long"),  # east
                F.col("id") + F.lit(1).cast("long"),  # south
            )
        ).alias("dst"),
    )
    half = cand.join(
        packed.select(F.col("id").alias("dst")), "dst", "inner"
    ).select("src", "dst")
    return half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def pack_cell(col_name: str = "column", row_name: str = "row"):
    """Pack (column,row) into one bigint id: column * 2^32 + row.
    Zoom-21 coords < 2^22 so this is collision-free, and the id is
    deterministic across runs (unlike monotonically_increasing_id)."""
    return F.col(col_name).cast("long") * F.lit(4294967296).cast("long") + F.col(
        row_name
    ).cast("long")
