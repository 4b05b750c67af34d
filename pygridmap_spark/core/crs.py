"""CRS convention + mismatch guard.

The reference carries a CRS on every GeoDataFrame and (a) normalizes EPSG
codes given as ints/strings (`/root/reference/pygridmap/gridding.py:282-289`:
3035 -> "EPSG:3035"), (b) reprojects / errors when two layers disagree
(`/root/reference/pygridmap/base.py:206-221` check_ref_proj/set_ref_proj).

Spark DataFrames have no geo type, so the engine stores the CRS as column
METADATA on the WKB geometry column (survives select/filter/join projection
of that column — the same channel GeoParquet readers use). There is no
reprojection engine in this container; the guard's job is to make a
mixed-CRS overlay an immediate ValueError instead of silently-wrong
geometry arithmetic. Layers without a declared CRS are accepted (opt-in
guard), matching how the reference only errors when projections are known
and different.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CRS_META_KEY = "crs"


def normalize_crs(crs: str | int | None) -> str | None:
    """EPSG normalization (reference gridding.py:282-289 parity):
    3035 / "3035" -> "EPSG:3035"; "EPSG:3035" / "epsg:3035" -> "EPSG:3035";
    non-numeric authority strings (e.g. full WKT, "ESRI:102013") pass
    through unchanged. None stays None."""
    if crs is None:
        return None
    if isinstance(crs, bool) or not isinstance(crs, (str, int)):
        raise TypeError(f"Wrong format for projection: {type(crs).__name__}")
    if isinstance(crs, int):
        return f"EPSG:{crs}"
    s = crs.strip()
    if not s:
        return None
    if s.isdigit():
        return f"EPSG:{s}"
    if s.upper().startswith("EPSG:"):
        return "EPSG:" + s.split(":", 1)[1].strip()
    return s


def _anchor_col(df: DataFrame, geometry_col: str) -> str | None:
    """Column that carries the CRS declaration: the WKB geometry column when
    present, else a rect-layer coordinate column — 'x', or GridMaker's
    '__x__' (rect grids have no geometry column; their coordinates are
    still in SOME projection)."""
    if geometry_col in df.columns:
        return geometry_col
    for cand in ("x", "__x__"):
        if cand in df.columns:
            return cand
    return None


def with_crs(df: DataFrame, crs: str | int | None, geometry_col: str = "geometry") -> DataFrame:
    """Declare the CRS of a layer (stored as column metadata on the geometry
    column, or on 'x' for rect layers without one)."""
    anchor = _anchor_col(df, geometry_col)
    if anchor is None:
        raise ValueError(
            f"no {geometry_col!r} or 'x' column to anchor the CRS declaration"
        )
    norm = normalize_crs(crs)
    meta = dict(df.schema[anchor].metadata or {})
    if norm is None:
        meta.pop(CRS_META_KEY, None)
    else:
        meta[CRS_META_KEY] = norm
    return df.withMetadata(anchor, meta)


def crs_of(df: DataFrame, geometry_col: str = "geometry") -> str | None:
    """Declared CRS of a layer, or None when undeclared."""
    anchor = _anchor_col(df, geometry_col)
    if anchor is None:
        return None
    meta = df.schema[anchor].metadata or {}
    val = meta.get(CRS_META_KEY)
    return normalize_crs(val) if val is not None else None


def ensure_same_crs(*crs_values: str | int | None, context: str = "overlay") -> str | None:
    """Resolve the common CRS of the declared values; raises ValueError when
    two DECLARED values disagree. Undeclared (None) values never conflict.
    Returns the resolved CRS (or None if nothing is declared)."""
    declared = {normalize_crs(c) for c in crs_values if c is not None}
    declared.discard(None)
    if len(declared) > 1:
        raise ValueError(
            f"CRS mismatch in {context}: {sorted(declared)} — reproject one "
            "layer first with functions.reproject.reproject(df, to=...) "
            "(the engine does not silently mix projections)"
        )
    return next(iter(declared), None)


def check_layers_crs(
    a: DataFrame,
    b: DataFrame,
    a_col: str = "geometry",
    b_col: str = "geometry",
    context: str = "overlay",
    extra: str | int | None = None,
) -> str | None:
    """Guard two layers (plus an optional explicit crs argument) against a
    declared-CRS mismatch; returns the resolved CRS."""
    return ensure_same_crs(crs_of(a, a_col), crs_of(b, b_col), extra, context=context)
