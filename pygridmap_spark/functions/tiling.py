"""Tile / grid-cell assignment as pure Catalyst column expressions.

The engine's core tiling op (SURVEY §2.3 G12/G13). Semantics pinned to the
reference's v1 streaming tiler (gridtiler.py:101-112) — including the
correct ``y_origin`` recentring (the reference's v2 path at gridtiler.py:236
recentres y with ``x_origin``; that bug is intentionally NOT reproduced).

All expressions stay inside whole-stage codegen: `floor`, arithmetic, casts.
No shuffles are introduced here — callers choose when to
``repartition("xt", "yt")`` for the partitioned write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tile_xy(
    x: Column,
    y: Column,
    resolution: float,
    tile_size_cell: int = 128,
    x_origin: float = 0.0,
    y_origin: float = 0.0,
) -> tuple[Column, Column, Column, Column]:
    """(xt, yt, cx, cy) columns — reference formulas gridtiler.py:101-112.

    ``xt = floor((x - x0) / (res*ts))``; in-tile
    ``cx = floor((x - x0)/res - xt*ts)`` in [0, ts-1].

    Known float edge (property-tested): when ``(x-x0)/(res*ts)`` rounds just
    below an integer while ``(x-x0)/res`` rounds onto it, ``cx == ts``.
    The reference hits the same case and only warns (gridtiler.py:115-118);
    we reproduce its arithmetic exactly rather than clamp.
    """
    tile_size_m = float(resolution) * int(tile_size_cell)
    xt = F.floor((x - F.lit(float(x_origin))) / F.lit(tile_size_m)).cast("int")
    yt = F.floor((y - F.lit(float(y_origin))) / F.lit(tile_size_m)).cast("int")
    cx = F.floor(
        (x - F.lit(float(x_origin))) / F.lit(float(resolution)) - xt.cast("double") * F.lit(float(tile_size_cell))
    ).cast("int")
    cy = F.floor(
        (y - F.lit(float(y_origin))) / F.lit(float(resolution)) - yt.cast("double") * F.lit(float(tile_size_cell))
    ).cast("int")
    return xt, yt, cx, cy


def with_tile_assignment(
    df: DataFrame,
    resolution: float,
    tile_size_cell: int = 128,
    x_origin: float = 0.0,
    y_origin: float = 0.0,
    x: str = "x",
    y: str = "y",
    out: tuple[str, str, str, str] = ("xt", "yt", "cx", "cy"),
) -> DataFrame:
    """Append tile-assignment columns (G12). One projection, no shuffle."""
    xt, yt, cx, cy = tile_xy(F.col(x), F.col(y), resolution, tile_size_cell, x_origin, y_origin)
    cols = dict(zip(out, (xt, yt, cx, cy)))
    return df.withColumns(cols)


def cell_xy(x: Column, y: Column, resolution: float, x_origin: float = 0.0, y_origin: float = 0.0) -> tuple[Column, Column]:
    """Global integer cell indices (lower-left-corner convention)."""
    cell_x = F.floor((x - F.lit(float(x_origin))) / F.lit(float(resolution))).cast("long")
    cell_y = F.floor((y - F.lit(float(y_origin))) / F.lit(float(resolution))).cast("long")
    return cell_x, cell_y


def agg_cell_xy(x: Column, y: Column, target_resolution: float) -> tuple[Column, Column]:
    """Coarsened roll-up key (G13, gridtiler.py:392-393):
    ``xa = R * floor(x / R)`` — keeps the coordinate unit, unlike cell_xy."""
    r = F.lit(float(target_resolution))
    return (r * F.floor(x / r), r * F.floor(y / r))


def with_agg_cell(df: DataFrame, target_resolution: float, x: str = "x", y: str = "y") -> DataFrame:
    xa, ya = agg_cell_xy(F.col(x), F.col(y), target_resolution)
    return df.withColumns({"xa": xa, "ya": ya})


def tile_bbox_exprs(
    xt: Column,
    yt: Column,
    resolution: float,
    tile_size_cell: int = 128,
    x_origin: float = 0.0,
    y_origin: float = 0.0,
) -> tuple[Column, Column, Column, Column]:
    """Tile bbox from tile indices (G8 as a column expression)."""
    tm = F.lit(float(resolution) * int(tile_size_cell))
    x0 = F.lit(float(x_origin))
    y0 = F.lit(float(y_origin))
    xmin = x0 + xt.cast("double") * tm
    ymin = y0 + yt.cast("double") * tm
    return xmin, ymin, xmin + tm, ymin + tm


def bbox_union_agg(x="x", y="y", xmax="xmax", ymax="ymax") -> list[Column]:
    """A12 (bbox form, base.py:497-503): reduce-union of boxes = coordinate
    extremes — one aggregation, no geometry."""
    return [
        F.min(x).alias("xmin"),
        F.min(y).alias("ymin"),
        F.max(xmax).alias("xmax"),
        F.max(ymax).alias("ymax"),
    ]


def bbox_intersection_agg(x="x", y="y", xmax="xmax", ymax="ymax") -> list[Column]:
    """A13 (bbox form, base.py:432-482): reduce-intersection of boxes =
    max-of-mins / min-of-maxes (empty when xmin>xmax in the result)."""
    return [
        F.max(x).alias("xmin"),
        F.max(y).alias("ymin"),
        F.min(xmax).alias("xmax"),
        F.min(ymax).alias("ymax"),
    ]


def round_to_tolerance(col: Column, aggregation_rounding: int = 6) -> Column:
    """Aggregate rounding to 10^-k (gridtiler.py:414-416): round(v*t)/t."""
    tol = F.lit(float(10 ** aggregation_rounding))
    return F.round(col * tol) / tol


def floats_to_ints(col: Column) -> Column:
    """Cosmetic ``12.0 -> "12"`` normalization for CSV output
    (gridtiler.py:567-576): returns a STRING column — "12" where the value
    is integral, the plain double rendering otherwise (a when/otherwise
    with a long branch would just coerce back to double and change
    nothing). Non-finite values pass through as their string forms."""
    is_intlike = (
        col.isNotNull()
        & ~F.isnan(col)
        & (F.abs(col) < F.lit(float(1 << 62)))
        & (col == F.floor(col))
    )
    return F.when(is_intlike, col.cast("long").cast("string")).otherwise(
        col.cast("string")
    )
