"""Deterministic synthetic polygon / grid layers (FIXTURES.md §2-3).

Polygon layers play the role of the reference tests' GISCO country borders
and NUTS-3 regions (tests/gridding.ipynb cell 14, tests/overlay.ipynb cells
20-22): a small vector side that the engine broadcasts into its spatial
joins. Generated driver-side with a seeded RNG (they are dimension tables —
thousands of rows at most, even at 100 TB of pages the polygon side stays
broadcastable), stored as WKB binary columns.
"""

from __future__ import annotations

import math
import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pygridmap_spark.core import wkb

POLYGON_SCHEMA = T.StructType(
    [
        T.StructField("poly_id", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("geometry", T.BinaryType(), False),
        T.StructField("pop", T.DoubleType(), False),
    ]
)


def synthetic_polygons(
    spark: SparkSession,
    n: int = 12,
    bbox=(0.0, 0.0, 100_000.0, 100_000.0),
    seed: int = 42,
    with_hole: bool = True,
    with_multi: bool = True,
) -> DataFrame:
    """n irregular convex-ish polygons over bbox; last two are (optionally)
    a polygon-with-hole and a multipolygon, exercising the full WKB path."""
    rng = random.Random(seed)
    xmin, ymin, xmax, ymax = bbox
    w, h = xmax - xmin, ymax - ymin
    rows = []
    for i in range(n):
        cx = xmin + rng.uniform(0.15, 0.85) * w
        cy = ymin + rng.uniform(0.15, 0.85) * h
        base_r = rng.uniform(0.06, 0.16) * min(w, h)
        nv = rng.randint(5, 9)
        rot = rng.uniform(0, 2 * math.pi)
        ring = []
        for k in range(nv):
            ang = rot + 2 * math.pi * k / nv
            r = base_r * rng.uniform(0.7, 1.3)
            ring.append((cx + r * math.cos(ang), cy + r * math.sin(ang)))
        ring.append(ring[0])
        if with_hole and i == n - 2 and base_r > 0:
            hole_r = base_r * 0.3
            hole = [
                (cx + hole_r * math.cos(a), cy + hole_r * math.sin(a))
                for a in [2 * math.pi * k / 6 for k in range(6)]
            ]
            hole.append(hole[0])
            geom = wkb.encode_polygon([ring, hole])
        elif with_multi and i == n - 1:
            ring2 = [(x + 0.25 * w, y + 0.2 * h) for x, y in ring]
            geom = wkb.encode_multipolygon([[ring], [ring2]])
        else:
            geom = wkb.encode_polygon([ring])
        rows.append((i, f"region{i}", geom, round(100.0 * rng.random(), 6)))
    pdf = pd.DataFrame(rows, columns=["poly_id", "name", "geometry", "pop"])
    return spark.createDataFrame(pdf, schema=POLYGON_SCHEMA)


def rect_regions(spark: SparkSession, n: int = 25, bbox=(0.0, 0.0, 100_000.0, 100_000.0), seed: int = 7) -> DataFrame:
    """Axis-aligned rectangle 'polygons' — PIP over these is expressible as
    SQL range predicates, giving the driver's DuckDB oracle a way to check
    the real spatial-join path end-to-end. Carries both the WKB geometry and
    the explicit (xmin, ymin, xmax, ymax) columns."""
    rng = random.Random(seed)
    xmin, ymin, xmax, ymax = bbox
    w, h = xmax - xmin, ymax - ymin
    rows = []
    for i in range(n):
        x0 = xmin + rng.uniform(0.0, 0.8) * w
        y0 = ymin + rng.uniform(0.0, 0.8) * h
        x1 = x0 + rng.uniform(0.05, 0.25) * w
        y1 = y0 + rng.uniform(0.05, 0.25) * h
        rows.append((i, f"rect{i}", wkb.encode_box(x0, y0, x1, y1), x0, y0, x1, y1))
    pdf = pd.DataFrame(
        rows, columns=["poly_id", "name", "geometry", "rxmin", "rymin", "rxmax", "rymax"]
    )
    return spark.createDataFrame(pdf)


def grid_layer(
    spark: SparkSession,
    bbox=(0.0, 0.0, 100_000.0, 100_000.0),
    cell=(50_000.0, 50_000.0),
    val_from_index: bool = True,
) -> DataFrame:
    """Regular grid in GridMaker-output shape (FIXTURES.md §3): one row per
    cell with lower-left (x, y), integer (cell_x, cell_y), WKB square
    geometry and a deterministic ``val`` column (the overlay-identity
    DUMMYCOL analog). Generated with sequence x sequence — distributed, no
    driver loop — so it scales to arbitrarily fine grids."""
    height, width = cell
    xmin, ymin, xmax, ymax = bbox
    nx = int(math.ceil((xmax - xmin) / width))
    ny = int(math.ceil((ymax - ymin) / height))
    df = (
        spark.range(nx)
        .select(F.col("id").cast("int").alias("ix"))
        .crossJoin(spark.range(ny).select(F.col("id").cast("int").alias("iy")))
    )
    x = F.lit(float(xmin)) + F.col("ix") * F.lit(float(width))
    y = F.lit(float(ymin)) + F.col("iy") * F.lit(float(height))
    out = df.select(
        F.col("ix").cast("long").alias("cell_x"),
        F.col("iy").cast("long").alias("cell_y"),
        x.alias("x"),
        y.alias("y"),
        (F.col("ix").cast("long") + F.col("iy").cast("long") * nx).alias("cell_id"),
    )
    if val_from_index:
        out = out.withColumn("val", (F.col("cell_id") + 1).cast("double"))
    return out.withColumns(
        {
            "xmax": F.col("x") + F.lit(float(width)),
            "ymax": F.col("y") + F.lit(float(height)),
        }
    )


def read_geojson(
    spark: SparkSession,
    path: str,
    id_col: str = "poly_id",
    geometry_col: str = "geometry",
) -> DataFrame:
    """Read a GeoJSON FeatureCollection into a WKB polygon layer (S7 — the
    reference's geopandas GeoJSON intake, gridding.ipynb cell 14).

    Driver-side parse: vector layers are dimension tables (a country/NUTS
    file is KBs-to-MBs even for a 100 TB page corpus), so one json.loads on
    the driver plus WKB encoding is the right plan — the result broadcasts
    into the spatial joins like every other polygon layer. Feature
    properties become columns; Polygon/MultiPolygon geometries only (the
    grid engine's domain); the GeoJSON spec fixes the CRS to OGC:CRS84,
    declared via the engine CRS convention. ``id_col`` comes from the
    feature's ``id`` when present, else the feature index."""
    import json

    from pygridmap_spark.core import crs as CRS
    from pygridmap_spark.core import fsio

    data = json.loads(fsio.read_text(spark, path))
    feats = data["features"] if data.get("type") == "FeatureCollection" else [data]
    rows = []
    prop_keys: list[str] = []
    for i, feat in enumerate(feats):
        geom = feat.get("geometry") or {}
        gtype = geom.get("type")
        coords = geom.get("coordinates", [])
        if gtype == "Polygon":
            buf = wkb.encode_polygon(coords)
        elif gtype == "MultiPolygon":
            buf = wkb.encode_multipolygon(coords)
        else:
            raise ValueError(
                f"feature {i}: unsupported GeoJSON geometry {gtype!r} "
                "(Polygon/MultiPolygon only)"
            )
        props = feat.get("properties") or {}
        for k in props:
            if k not in prop_keys:
                prop_keys.append(k)
        rows.append((feat.get("id"), i, buf, props))
    # id policy: explicit feature ids when EVERY feature has one of a single
    # type and they are unique; otherwise the feature index (mixed-type id
    # columns crash createDataFrame, and an index fallback colliding with an
    # explicit numeric id would silently double-count in keyed joins)
    explicit = [r[0] for r in rows]
    if all(v is not None for v in explicit) and len({type(v) for v in explicit}) == 1:
        if len(set(explicit)) != len(explicit):
            raise ValueError("duplicate GeoJSON feature ids — ids must be unique")
        ids = explicit
    else:
        ids = [r[1] for r in rows]
    rows = [(fid, r[2], r[3]) for fid, r in zip(ids, rows)]
    pdf = pd.DataFrame(
        {
            id_col: [r[0] for r in rows],
            geometry_col: [r[1] for r in rows],
            **{k: [r[2].get(k) for r in rows] for k in prop_keys},
        }
    )
    df = spark.createDataFrame(pdf)
    return CRS.with_crs(df, "OGC:CRS84", geometry_col=geometry_col)
