"""Inverse-distance-weighted (IDW) grid interpolation — scattered point
samples to Morton-cell estimates (Shepard 1968, public formula).

The classic gridmap companion to the raster family: given point samples
``(lon, lat, v)``, estimate the field at grid-cell centers as

    est(c) = sum_i v_i / d_i^p  /  sum_i 1 / d_i^p

over the samples living in the (2*ring+1)^2 cell disk around ``c``, with
``d_i`` the great-circle meters from the cell center to the sample and
``p`` the power (2 = inverse-square, the usual choice). Distances are
floored at ``d_floor_m`` (default 1 mm), so a sample coinciding with the
center gets dominant-but-finite weight — no branch, no Infinity, and the
rule restates verbatim in the DuckDB oracle.

Spark shape (the gather form — never a crossJoin):

1. samples -> cells: ONE facts pass through the Morton index (the same
   staged projection as `core_cells`; NULL/NaN coordinates drop);
2. each target cell explodes to its cell disk (lon wraps the
   antimeridian, lat clamps — `geohash_neighbors` contract) and
   equi-joins the indexed samples on the cell key: the per-target fan-in
   is bounded by disk area x local sample density, never corpus-sized;
3. one partial-aggregated groupBy(target) finishes it. Every expression
   is Catalyst trig/arithmetic — zero Python anywhere.

Beyond pygridmap (whose grids only aggregate what falls inside each
cell): this fills cells FROM NEIGHBORING evidence — the standard move
for sparse geocoded signals over a dense tile pyramid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pygridmap_spark.functions import cellindex as CI
from pygridmap_spark.functions import geodesy as GD


def cell_center(ix, iy, z: int):
    """(lon, lat) Column pair for the center of cell (ix, iy) at zoom z."""
    n = float(1 << z)
    clon = F.lit(-180.0) + (ix.cast("double") + F.lit(0.5)) * F.lit(360.0) / F.lit(n)
    clat = F.lit(-90.0) + (iy.cast("double") + F.lit(0.5)) * F.lit(180.0) / F.lit(n)
    return clon, clat


def idw_interpolate(
    samples: DataFrame,
    z: int,
    value: str = "v",
    ring: int = 1,
    power: float = 2.0,
    lon: str = "lon",
    lat: str = "lat",
    targets: DataFrame | None = None,
    d_floor_m: float = 0.001,
) -> DataFrame:
    """IDW estimate per target cell: ``(cell_ix, cell_iy, n_samples,
    est)``. ``targets`` is any frame with (cell_ix, cell_iy) — cells to
    estimate at; default = every sample-occupied cell (smoothing). Cells
    whose disk holds no sample produce no row (no evidence, no estimate —
    zero-fill is the caller's semantic decision)."""
    s = CI.with_cell_index(samples, z, lon=lon, lat=lat).filter(
        F.col("cell_ix").isNotNull() & F.col(value).isNotNull()
    )
    sv = s.select(
        F.col("cell_ix").alias("nix"),
        F.col("cell_iy").alias("niy"),
        F.col(lon).alias("__slon__"),
        F.col(lat).alias("__slat__"),
        F.col(value).cast("double").alias("__v__"),
    )
    if targets is None:
        targets = sv.select(
            F.col("nix").alias("cell_ix"), F.col("niy").alias("cell_iy")
        ).distinct()
    n = 1 << z
    probes = F.array(
        *[
            F.struct(
                ((F.col("cell_ix") + F.lit(dx + n)) % F.lit(n)).alias("nix"),
                (F.col("cell_iy") + F.lit(dy)).alias("niy"),
            )
            for dx, dy in CI.disk_offsets(ring)
        ]
    )
    t = (
        targets.select("cell_ix", "cell_iy", F.explode(probes).alias("p"))
        .select(
            "cell_ix",
            "cell_iy",
            F.col("p.nix").alias("nix"),
            F.col("p.niy").alias("niy"),
        )
        .filter((F.col("niy") >= 0) & (F.col("niy") < F.lit(n)))
    )
    clon, clat = cell_center(F.col("cell_ix"), F.col("cell_iy"), z)
    d = F.greatest(
        GD.gc_distance_m(clon, clat, F.col("__slon__"), F.col("__slat__")),
        F.lit(float(d_floor_m)),
    )
    w = F.lit(1.0) / F.pow(d, F.lit(float(power)))
    return (
        t.join(sv, ["nix", "niy"])
        .groupBy("cell_ix", "cell_iy")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            (F.sum(w * F.col("__v__")) / F.sum(w)).alias("est"),
        )
    )
