"""Grid kernel-density heatmap (quartic/biweight kernel) with EXACT
integer arithmetic — the hotspot-surface operator (Silverman 1986,
public; the ArcGIS "Kernel Density" shape) over integer planar
coordinates.

The quartic kernel K(d) = (1 - d^2/h^2)^2 for d <= h is a polynomial —
so with integer coordinates its numerator is an INTEGER:

    contribution(point -> cell) = (4h^2 - D2)^2,  D2 = (2px - cx)^2
                                                      + (2py - cy)^2

where (cx, cy) is twice the cell center (half-integer centers cleared
by doubling everything). The per-cell sum of those integers is exact,
order-free, and engine-independent — the driver oracle hash-gates a
DENSITY SURFACE, which a float-kernel implementation could never do
(its sum depends on reduction order). The density itself is one pinned
final division: kde = sum / (16 h^4) in cell-area units.

Evaluation points are the occupied cells' 3x3 neighborhoods (the
standard sparse-surface contract: a cell farther than one ring from
every point has density 0 and is not emitted). Cell side g >= h keeps
the ring cover exact: a point within h of a cell's center always lies
in that cell's 3x3 ring.

Scale shape at 100 TB: one explode-to-ring pass over the points (x9)
into ONE partial-aggregated shuffle keyed on the cell — map-side sums
collapse any corpus to a row per live cell per task; dense hotspot
cells are plain equi-join/agg skew that AQE splits. The sum accumulates
in decimal(38,0) (ANSI-safe for any realistic bandwidth: each term is
<= 16 h^4, so long accumulation would overflow near 2^63 / (16 h^4)
points per cell).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pygridmap_spark.operators.pointpattern import _floor_div


def kde_grid(
    df: DataFrame,
    bandwidth: int,
    x: str = "x",
    y: str = "y",
    by: list[str] | tuple[str, ...] = (),
    cell: int | None = None,
) -> DataFrame:
    """Quartic-kernel density per grid cell: ``(*by, cell_x, cell_y,
    kernel_sum, kde)`` where ``kernel_sum`` is the exact integer
    numerator sum (as double, cast from the decimal accumulator) and
    ``kde = kernel_sum / (16 h^4)`` — the kernel mass at the cell
    center in point units. Cells with no point in their 3x3 ring are
    absent (density 0). Integer coordinates by contract; ``cell``
    defaults to ``bandwidth`` and must be >= it (the ring-cover
    guarantee)."""
    h = int(bandwidth)
    if h <= 0:
        raise ValueError("bandwidth must be positive")
    g = h if cell is None else int(cell)
    if g < h:
        raise ValueError(f"cell ({g}) must be >= bandwidth ({h})")
    by = list(by)
    pts = df.select(
        *by,
        F.col(x).cast("long").alias("__x__"),
        F.col(y).cast("long").alias("__y__"),
    ).withColumns(
        {
            "__cx__": _floor_div("__x__", g),
            "__cy__": _floor_div("__y__", g),
        }
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probes = pts.select(
        *by,
        "__x__",
        "__y__",
        F.explode(offsets).alias("__o__"),
        (F.col("__cx__") + F.col("__o__.dx")).alias("cell_x"),
        (F.col("__cy__") + F.col("__o__.dy")).alias("cell_y"),
    )
    # twice the evaluated cell's center: 2*(c*g + g/2) = 2*c*g + g
    cx2 = F.col("cell_x") * (2 * g) + F.lit(g)
    cy2 = F.col("cell_y") * (2 * g) + F.lit(g)
    ddx = F.col("__x__") * 2 - cx2
    ddy = F.col("__y__") * 2 - cy2
    d2_4 = ddx * ddx + ddy * ddy  # 4*d^2 (|2p-c| <= 5g -> no overflow)
    h2_4 = F.lit(4 * h * h)
    # square in decimal(19)x(19)->(38): the long square of an
    # out-of-kernel diff could overflow int64 under ANSI before the
    # when() gates it, so gate FIRST and square exactly
    diff = (h2_4 - d2_4).cast("decimal(19,0)")
    contrib = F.when(d2_4 <= h2_4, diff * diff).otherwise(
        F.lit(0).cast("decimal(38,0)")
    )
    out = (
        probes.select(
            *by,
            "cell_x",
            "cell_y",
            contrib.alias("__k__"),
        )
        .groupBy(*by, "cell_x", "cell_y")
        .agg(F.sum("__k__").alias("__ks__"))
        .filter(F.col("__ks__") > 0)
    )
    norm = float(16 * h**4)
    ks = F.col("__ks__").cast("double")
    return out.select(
        *by,
        "cell_x",
        "cell_y",
        ks.alias("kernel_sum"),
        (ks / F.lit(norm)).alias("kde"),
    )
