"""CRS reprojection: EPSG:4326 (lon/lat, GRS80/WGS84) <-> EPSG:3035
(ETRS89-extended / LAEA Europe) <-> EPSG:3857 (Web/Pseudo-Mercator) as
pure column expressions — any pair among the three (projected<->projected
chains through the 4326 hub as one fused expression).

Reference parity: the reference silently reprojects a mismatched layer
(/root/reference/pygridmap/base.py:220 ``gdf2.to_crs(gdf1.crs)``) via
pyproj; this container has no projection engine, so the engine's CRS
guard (core/crs.py) raises on mismatch — and THIS module is the fix-it
action it points at.

The Lambert Azimuthal Equal Area (ellipsoidal) forward/inverse formulas
are public closed forms (J.P. Snyder, *Map Projections — A Working
Manual*, USGS PP 1395, pp. 187-190, eqs 3-12/3-18/24-26..24-61; EPSG
method 1027), re-derived here — trig + log only, so the SAME math runs
three ways:

- Catalyst column expressions (``laea_forward`` / ``laea_inverse``) —
  whole-stage codegen, zero Python in the hot path, 100-TB-ready;
- numpy (``laea_forward_np`` / ``laea_inverse_np``) — vectorized kernel
  for WKB geometry vertices (``reproject_geometry``);
- ANSI SQL (the driver's DuckDB oracle twin re-states the same formula).

EPSG:3035 parameters (public registry): GRS80 ellipsoid a=6378137,
1/f=298.257222101; lat0=52N, lon0=10E, FE=4321000, FN=3210000. Inverse
authalic latitude uses the e^6 series (error ~1e-9 rad ≈ 6e-8 deg —
round-trips hold |Δ| < 1e-6 deg).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pygridmap_spark.core import crs as CRS

# --- GRS80 / EPSG:3035 constants (driver-side floats, embedded as literals)
_A = 6378137.0
_F = 1.0 / 298.257222101
_E2 = _F * (2.0 - _F)
_E = math.sqrt(_E2)
_LAT0 = math.radians(52.0)
_LON0 = math.radians(10.0)
_FE = 4321000.0
_FN = 3210000.0


def _q_authalic(sin_phi: float) -> float:
    return (1.0 - _E2) * (
        sin_phi / (1.0 - _E2 * sin_phi * sin_phi)
        - (1.0 / (2.0 * _E)) * math.log((1.0 - _E * sin_phi) / (1.0 + _E * sin_phi))
    )


_QP = _q_authalic(1.0)  # q at the pole
_RQ = _A * math.sqrt(_QP / 2.0)  # authalic-sphere radius
_BETA1 = math.asin(_q_authalic(math.sin(_LAT0)) / _QP)
_SB1, _CB1 = math.sin(_BETA1), math.cos(_BETA1)
_M1 = math.cos(_LAT0) / math.sqrt(1.0 - _E2 * math.sin(_LAT0) ** 2)
_D = _A * _M1 / (_RQ * _CB1)
# inverse authalic-latitude series coefficients (Snyder eq 3-18)
_A2 = _E2 / 3.0 + 31.0 * _E2**2 / 180.0 + 517.0 * _E2**3 / 5040.0
_A4 = 23.0 * _E2**2 / 360.0 + 251.0 * _E2**3 / 3780.0
_A6 = 761.0 * _E2**3 / 45360.0

_WGS84 = "EPSG:4326"
_LAEA = "EPSG:3035"


def laea_forward(lon: Column, lat: Column) -> tuple[Column, Column]:
    """EPSG:4326 degrees -> EPSG:3035 meters, as two column expressions
    (pure Catalyst trig — whole-stage codegen)."""
    phi = F.radians(lat)
    lam = F.radians(lon) - F.lit(_LON0)
    sp = F.sin(phi)
    q = F.lit(1.0 - _E2) * (
        sp / (F.lit(1.0) - F.lit(_E2) * sp * sp)
        - F.lit(1.0 / (2.0 * _E))
        * F.log((F.lit(1.0) - F.lit(_E) * sp) / (F.lit(1.0) + F.lit(_E) * sp))
    )
    # clamp: q/qp can exceed 1 by 1 ulp at the pole and NaN the asin
    beta = F.asin(F.greatest(F.least(q / F.lit(_QP), F.lit(1.0)), F.lit(-1.0)))
    sb, cb = F.sin(beta), F.cos(beta)
    b_den = F.lit(1.0) + F.lit(_SB1) * sb + F.lit(_CB1) * cb * F.cos(lam)
    big_b = F.lit(_RQ) * F.sqrt(F.lit(2.0) / b_den)
    x = F.lit(_FE) + big_b * F.lit(_D) * cb * F.sin(lam)
    y = F.lit(_FN) + (big_b / F.lit(_D)) * (
        F.lit(_CB1) * sb - F.lit(_SB1) * cb * F.cos(lam)
    )
    return x, y


def laea_inverse(x: Column, y: Column) -> tuple[Column, Column]:
    """EPSG:3035 meters -> EPSG:4326 degrees (lon, lat) column expressions."""
    xp = (x - F.lit(_FE)) / F.lit(_D)
    yp = (y - F.lit(_FN)) * F.lit(_D)
    rho = F.sqrt(xp * xp + yp * yp)
    ce = F.lit(2.0) * F.asin(
        F.greatest(F.least(rho / F.lit(2.0 * _RQ), F.lit(1.0)), F.lit(-1.0))
    )
    sc, cc = F.sin(ce), F.cos(ce)
    beta = F.when(rho == 0.0, F.lit(_BETA1)).otherwise(
        F.asin(
            F.greatest(
                F.least(
                    cc * F.lit(_SB1) + yp * sc * F.lit(_CB1) / rho, F.lit(1.0)
                ),
                F.lit(-1.0),
            )
        )
    )
    lam = F.when(rho == 0.0, F.lit(0.0)).otherwise(
        F.atan2(xp * sc, rho * F.lit(_CB1) * cc - yp * F.lit(_SB1) * sc)
    )
    phi = (
        beta
        + F.lit(_A2) * F.sin(F.lit(2.0) * beta)
        + F.lit(_A4) * F.sin(F.lit(4.0) * beta)
        + F.lit(_A6) * F.sin(F.lit(6.0) * beta)
    )
    return F.degrees(lam + F.lit(_LON0)), F.degrees(phi)


def laea_forward_np(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """numpy twin of :func:`laea_forward` (same constants/formula) for WKB
    vertex arrays inside Arrow kernels."""
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64)) - _LON0
    sp = np.sin(phi)
    q = (1.0 - _E2) * (
        sp / (1.0 - _E2 * sp * sp)
        - (1.0 / (2.0 * _E)) * np.log((1.0 - _E * sp) / (1.0 + _E * sp))
    )
    beta = np.arcsin(np.clip(q / _QP, -1.0, 1.0))
    sb, cb = np.sin(beta), np.cos(beta)
    big_b = _RQ * np.sqrt(2.0 / (1.0 + _SB1 * sb + _CB1 * cb * np.cos(lam)))
    x = _FE + big_b * _D * cb * np.sin(lam)
    y = _FN + (big_b / _D) * (_CB1 * sb - _SB1 * cb * np.cos(lam))
    return x, y


def laea_inverse_np(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """numpy twin of :func:`laea_inverse`; returns (lon, lat) degrees."""
    xp = (np.asarray(x, dtype=np.float64) - _FE) / _D
    yp = (np.asarray(y, dtype=np.float64) - _FN) * _D
    rho = np.sqrt(xp * xp + yp * yp)
    ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * _RQ), -1.0, 1.0))
    sc, cc = np.sin(ce), np.cos(ce)
    with np.errstate(invalid="ignore", divide="ignore"):
        beta = np.where(
            rho == 0.0,
            _BETA1,
            np.arcsin(np.clip(cc * _SB1 + yp * sc * _CB1 / np.where(rho == 0, 1, rho), -1.0, 1.0)),
        )
        lam = np.where(
            rho == 0.0, 0.0, np.arctan2(xp * sc, rho * _CB1 * cc - yp * _SB1 * sc)
        )
    phi = (
        beta
        + _A2 * np.sin(2.0 * beta)
        + _A4 * np.sin(4.0 * beta)
        + _A6 * np.sin(6.0 * beta)
    )
    return np.degrees(lam + _LON0), np.degrees(phi)


_MERC = "EPSG:3857"
# Web Mercator max latitude: the projection square's edge, atan(sinh(pi))
WEBMERCATOR_MAX_LAT = math.degrees(math.atan(math.sinh(math.pi)))  # 85.0511287798066


def webmercator_forward(lon: Column, lat: Column) -> tuple[Column, Column]:
    """EPSG:4326 degrees -> EPSG:3857 (WGS84 Web/Pseudo-Mercator) meters.

    Spherical closed form (EPSG method 1024: the WGS84 semi-major axis as
    sphere radius): x = a*lam, y = a*atanh(sin(phi)) — pure Catalyst trig,
    whole-stage codegen. Latitudes beyond ±WEBMERCATOR_MAX_LAT (85.0511°,
    the projection's domain of use) map to finite y outside the standard
    square rather than raising — filter first if the tile grid needs the
    square."""
    phi = F.radians(lat)
    sp = F.sin(phi)
    x = F.lit(_A) * F.radians(lon)
    # atanh(s) == 0.5*ln((1+s)/(1-s)); ln form keeps the DuckDB twin literal
    y = F.lit(_A * 0.5) * F.log((F.lit(1.0) + sp) / (F.lit(1.0) - sp))
    return x, y


def webmercator_inverse(x: Column, y: Column) -> tuple[Column, Column]:
    """EPSG:3857 meters -> EPSG:4326 degrees (lon, lat) column expressions:
    lon = x/a, lat = atan(sinh(y/a)) — exact spherical inverse."""
    lon = F.degrees(x / F.lit(_A))
    lat = F.degrees(F.atan(F.sinh(y / F.lit(_A))))
    return lon, lat


def webmercator_forward_np(
    lon: np.ndarray, lat: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """numpy twin of :func:`webmercator_forward` for WKB vertex arrays."""
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    sp = np.sin(np.radians(np.asarray(lat, dtype=np.float64)))
    with np.errstate(divide="ignore"):
        y = _A * 0.5 * np.log((1.0 + sp) / (1.0 - sp))
    return _A * lam, y


def webmercator_inverse_np(
    x: np.ndarray, y: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """numpy twin of :func:`webmercator_inverse`; returns (lon, lat) degrees."""
    lon = np.degrees(np.asarray(x, dtype=np.float64) / _A)
    lat = np.degrees(np.arctan(np.sinh(np.asarray(y, dtype=np.float64) / _A)))
    return lon, lat


def _compose(f1, f2):
    """(x,y) -> f2(f1(x,y)) — chains transforms through the shared hub CRS.
    Column version relies on whole-stage codegen's common-subexpression
    elimination for the duplicated inner stage; numpy version is two
    vectorized passes."""

    def chained(x, y):
        ix, iy = f1(x, y)
        return f2(ix, iy)

    return chained


_TRANSFORMS = {
    (_WGS84, _LAEA): (laea_forward, laea_forward_np),
    (_LAEA, _WGS84): (laea_inverse, laea_inverse_np),
    (_WGS84, _MERC): (webmercator_forward, webmercator_forward_np),
    (_MERC, _WGS84): (webmercator_inverse, webmercator_inverse_np),
    # projected<->projected via the 4326 hub (one fused expression tree /
    # two numpy passes; no intermediate DataFrame)
    (_LAEA, _MERC): (
        _compose(laea_inverse, webmercator_forward),
        _compose(laea_inverse_np, webmercator_forward_np),
    ),
    (_MERC, _LAEA): (
        _compose(webmercator_inverse, laea_forward),
        _compose(webmercator_inverse_np, laea_forward_np),
    ),
}


def _resolve(from_crs, to) -> tuple:
    src, dst = CRS.normalize_crs(from_crs), CRS.normalize_crs(to)
    if src is None:
        raise ValueError(
            "reproject: source CRS unknown — declare it with core.crs.with_crs "
            "or pass from_crs="
        )
    if src == dst:
        return None
    pair = _TRANSFORMS.get((src, dst))
    if pair is None:
        raise ValueError(
            f"reproject: no transform {src} -> {dst} (supported: "
            f"{sorted(_TRANSFORMS)}); other CRS pairs need a projection "
            "engine this container does not ship"
        )
    return pair


def reproject(
    df: DataFrame,
    to: str | int,
    from_crs: str | int | None = None,
    x_col: str | None = None,
    y_col: str | None = None,
    geometry_col: str = "geometry",
) -> DataFrame:
    """Reproject a layer to ``to`` — the fix-it action behind the CRS
    mismatch guard (reference parity with base.py:220's silent to_crs,
    made explicit). Transforms, in place:

    - the coordinate column pair (``x_col``/``y_col``; auto-detected as
      lon/lat then x/y when not given) via pure column expressions, and
    - the WKB ``geometry_col`` (when present) via a vectorized numpy
      Arrow kernel over every vertex,

    then re-declares the layer CRS metadata. ``from_crs`` defaults to the
    layer's declared CRS. No shuffle; a projection the optimizer inlines."""
    if (x_col is None) != (y_col is None):
        raise ValueError(
            "reproject: pass both x_col and y_col (or neither for "
            "auto-detect) — transforming one coordinate axis alone would "
            "silently mix projections"
        )
    src = from_crs if from_crs is not None else CRS.crs_of(df, geometry_col)
    pair = _resolve(src, to)
    if pair is None:  # same CRS: just (re)declare
        return CRS.with_crs(df, to, geometry_col)
    col_fn, np_fn = pair
    if x_col is None and y_col is None:
        for cx, cy in (("lon", "lat"), ("x", "y"), ("__x__", "__y__")):
            if cx in df.columns and cy in df.columns:
                x_col, y_col = cx, cy
                break
    out = df
    if x_col is not None:
        if y_col is None or x_col not in df.columns or y_col not in df.columns:
            raise ValueError(f"reproject: coordinate columns {x_col!r}/{y_col!r} not found")
        # NOTE: col_fn takes (lon, lat) == (x, y) order for both directions
        nx, ny = col_fn(F.col(x_col), F.col(y_col))
        out = out.withColumns({x_col: nx, y_col: ny})
    if geometry_col in df.columns:
        out = _reproject_wkb(out, geometry_col, np_fn)
    if x_col is None and geometry_col not in df.columns:
        raise ValueError(
            "reproject: nothing to transform (no lon/lat, x/y, or geometry column)"
        )
    return CRS.with_crs(out, to, geometry_col)


def _reproject_wkb(df: DataFrame, geometry_col: str, np_fn) -> DataFrame:
    """Map every WKB vertex through ``np_fn`` — Arrow-batched, one decode/
    encode pass per geometry, vertices transformed as one numpy call."""
    import pandas as pd

    from pygridmap_spark.core import wkb as WKB

    def _kernel(s):
        out = []
        for buf in s:
            if buf is None:
                out.append(None)
                continue
            raw = bytes(buf)
            kind, parts = WKB.decode(raw)  # polygons normalize to multipolygon
            if kind == "point":
                x, y = np_fn(np.array([parts[0]]), np.array([parts[1]]))
                out.append(WKB.encode_point(float(x[0]), float(y[0])))
            else:
                polys = [[_tx_ring(r, np_fn) for r in rings] for rings in parts]
                # preserve the original POLYGON vs MULTIPOLYGON type tag —
                # via the header parser (endianness/EWKB-flag aware), not a
                # raw byte peek
                gtype, _, _ = WKB._parse_header(memoryview(raw), 0)
                if gtype == WKB.WKB_POLYGON and len(polys) == 1:
                    out.append(WKB.encode_polygon(polys[0]))
                else:
                    out.append(WKB.encode_multipolygon(polys))
        return pd.Series(out)

    udf = F.pandas_udf(_kernel, "binary", functionType=200)
    return df.withColumn(geometry_col, udf(F.col(geometry_col)))


def _tx_ring(ring: np.ndarray, np_fn) -> np.ndarray:
    arr = np.asarray(ring, dtype=np.float64)
    x, y = np_fn(arr[:, 0], arr[:, 1])
    return np.column_stack([x, y])
