"""Slippy-tile <-> lon/lat projection math as pure Catalyst column
expressions (SURVEY.md §2.8 F1-F5, F11).

The reference implements these as row-at-a-time Python scalar functions
(deg2num/num2deg, /root/reference/process_city_shapes.py:18-59) applied
via np.apply_along_axis. Here they are column expressions — JVM-side,
whole-stage-codegen'd, no Python round trip — which is the single
biggest idiom shift from the reference: projection of 10^9 coordinates
is a narrow map stage with zero serde.

Semantics notes (matching the reference, SURVEY.md §7 "what's hard"):
- deg2num uses int() truncation in the reference; slippy coordinates
  are non-negative for valid lat/lon so floor() is equivalent.
- num2deg with center=True offsets by half a tile before projecting
  (/root/reference/process_city_shapes.py:52-54).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _n(zoom: Column | int) -> Column:
    """2^zoom as a double; exact for integer zoom levels."""
    return F.pow(F.lit(2.0), zoom)


def deg2num_column(lon: Column, zoom: Column | int) -> Column:
    """Slippy x (column) for a longitude. Reference: int((lon+180)/360*n)."""
    return F.floor((lon + F.lit(180.0)) / F.lit(360.0) * _n(zoom)).cast("long")


def deg2num_row(lat: Column, zoom: Column | int) -> Column:
    """Slippy y (row) for a latitude (Web-Mercator).

    Reference: int((1 - ln(tan(lat_rad) + 1/cos(lat_rad))/pi) / 2 * n).
    """
    lat_rad = F.radians(lat)
    merc = F.log(F.tan(lat_rad) + F.lit(1.0) / F.cos(lat_rad))
    return F.floor((F.lit(1.0) - merc / F.lit(math.pi)) / F.lit(2.0) * _n(zoom)).cast(
        "long"
    )


def num2deg_lon(column: Column, zoom: Column | int, center: bool = True) -> Column:
    """Longitude of a tile's top-left corner (or center)."""
    c = column + F.lit(0.5) if center else column.cast("double")
    return c / _n(zoom) * F.lit(360.0) - F.lit(180.0)


def num2deg_lat(row: Column, zoom: Column | int, center: bool = True) -> Column:
    """Latitude of a tile's top-left corner (or center): degrees(atan(sinh(pi*(1-2*row/n))))."""
    r = row + F.lit(0.5) if center else row.cast("double")
    return F.degrees(F.atan(F.sinh(F.lit(math.pi) * (F.lit(1.0) - F.lit(2.0) * r / _n(zoom)))))


def tile_distance(row_a: Column, col_a: Column, row_b: Column, col_b: Column) -> Column:
    """Euclidean distance in tile units (reference /root/reference/solardb.py:130-132).

    Uses x*x (not pow) so Spark and any IEEE-754 oracle agree bit-for-bit.
    """
    dr = row_a.cast("double") - row_b.cast("double")
    dc = col_a.cast("double") - col_b.cast("double")
    return F.sqrt(dr * dr + dc * dc)


def grid_snap(coord: Column, grid_size: int) -> Column:
    """Top-left of the containing super-grid cell: x - x % g
    (reference /root/reference/imagery.py:149). Slippy coords are
    non-negative so %'s sign convention is moot.
    """
    return coord - coord % F.lit(grid_size)


def tile_bbox_ring(column: Column, row: Column, zoom: Column | int) -> Column:
    """Closed 5-point lon/lat ring of a tile's bounding box
    (reference /root/reference/maproulette.py:21-27): corners projected
    with center=False, first point repeated last.

    Returns array<array<double>> — a GeoJSON-shaped ring, built entirely
    from Catalyst expressions.
    """

    def corner(c: Column, r: Column) -> Column:
        return F.array(
            num2deg_lon(c, zoom, center=False), num2deg_lat(r, zoom, center=False)
        )

    return F.array(
        corner(column, row),
        corner(column + F.lit(1), row),
        corner(column + F.lit(1), row + F.lit(1)),
        corner(column, row + F.lit(1)),
        corner(column, row),
    )


def zorder_key(column: Column, row: Column) -> Column:
    """Morton / Z-order key: interleave the bits of (column, row) into
    one BIGINT, so sorting by it places 2-D-adjacent tiles near each
    other in the file order. That's the data-layout lever for a 100 TB
    imagery store: parquet row-group min/max stats on the key let any
    bbox query skip most files (the same reason Delta/Iceberg expose
    ZORDER BY), where sorting by (column, row) clusters only one axis.

    Pure codegen: the classic magic-number bit spread (x | x<<16 ...
    masked) — 10 integer ops per coordinate, no UDF. Coordinates must
    be in [0, 2^31); slippy tiles at zoom<=21 fit comfortably.
    """
    def spread(v: Column) -> Column:
        # spread 32 bits to 64, one empty bit between each (0x55... mask)
        x = v.cast("long")
        x = (x.bitwiseOR(F.shiftleft(x, 16))).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
        x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
        x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
        x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x3333333333333333))
        x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x5555555555555555))
        return x

    return spread(column).bitwiseOR(F.shiftleft(spread(row), 1))


def zorder_sql(col_expr: str, row_expr: str) -> str:
    """ANSI-SQL replay of ``zorder_key`` for the DuckDB oracle — the
    shared-builder idiom (c4_*_sql, dsir_features_sql): ONE definition
    of the bit-spread feeds both engines, so the interleave cannot
    drift between the Spark column and the oracle. Decimal literals
    (not hex) for engine-neutral parsing; BIGINT throughout — inputs
    in [0, 2^31) spread into bits 0..62, no signed-overflow hazard."""

    def spread(v: str) -> str:
        x = f"CAST(({v}) AS BIGINT)"
        for shift, mask in (
            (16, 0x0000FFFF0000FFFF),
            (8, 0x00FF00FF00FF00FF),
            (4, 0x0F0F0F0F0F0F0F0F),
            (2, 0x3333333333333333),
            (1, 0x5555555555555555),
        ):
            x = f"(({x} | ({x} << {shift})) & {mask})"
        return x

    return f"({spread(col_expr)} | ({spread(row_expr)} << 1))"
