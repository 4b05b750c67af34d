"""Great-circle column primitives — haversine distance, initial bearing,
direct-geodesic destination. Pure Catalyst trig (whole-stage codegen, zero
Python), on the IUGG mean-radius sphere shared with core/sphere.py.

These are the scalar building blocks the operators compose: the exact
radius join (operators/knn_sphere.within_radius_s2) tests chord distance on
unit vectors for speed, the point buffer (operators/pip_sphere.
geodesic_point_buffer) is ``destination`` swept over bearings, and
trajectory statistics (operators/trajectories.py) lag-join consecutive
pings and sum ``gc_distance_m``. Reference parity: pygridmap measures
planar GEOS distances after pyproj reprojection (base.py); on lake-scale
lon/lat these closed forms are the sphere-true equivalent with no
reprojection pass. Formulas are the textbook haversine / forward-azimuth /
direct identities (Ed Williams' Aviation Formulary; public domain).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from pygridmap_spark.core.sphere import EARTH_RADIUS_KM

EARTH_RADIUS_M = EARTH_RADIUS_KM * 1000.0


def _clamp_unit(c: Column) -> Column:
    """Clamp a sine/cosine result to [-1, 1] against the 1+ulp rounding
    that would NaN the downstream asin — while PROPAGATING null and NaN
    inputs (a bare `when(c > 1, 1)` would capture NaN too, since NaN
    compares greater than everything in Spark, fabricating a plausible
    value from corrupt input)."""
    return (
        F.when(F.isnan(c), c)
        .when(c > F.lit(1.0), F.lit(1.0))
        .when(c < F.lit(-1.0), F.lit(-1.0))
        .otherwise(c)
    )


def gc_distance_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in meters (haversine — numerically stable at
    small separations where the xyz-chord acos form loses bits). The
    sqrt argument is clamped to 1 so antipodal pairs return pi*R instead
    of NaN from a 1+ulp rounding."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    a = (
        F.pow(F.sin((p2 - p1) / F.lit(2.0)), 2)
        + F.cos(p1) * F.cos(p2) * F.pow(F.sin((F.radians(lon2) - F.radians(lon1)) / F.lit(2.0)), 2)
    )
    # NOT least(): least/greatest SKIP nulls, so a null coordinate would
    # clamp to 1.0 (= pi*R) instead of propagating null; _clamp_unit also
    # keeps a NaN coordinate NaN instead of fabricating the antipode
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(_clamp_unit(F.sqrt(a)))


def initial_bearing_deg(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Forward azimuth at the first point, degrees clockwise from true
    north in [0, 360). Undefined (returns 0) when the points coincide."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dl = F.radians(lon2) - F.radians(lon1)
    th = F.degrees(
        F.atan2(F.sin(dl) * F.cos(p2), F.cos(p1) * F.sin(p2) - F.sin(p1) * F.cos(p2) * F.cos(dl))
    )
    return th - F.lit(360.0) * F.floor(th / F.lit(360.0))


def destination(
    lon: Column, lat: Column, bearing_deg: Column, distance_m: float | Column
) -> tuple[Column, Column]:
    """(lon, lat) of the point ``distance_m`` along the great circle at
    ``bearing_deg`` — the direct-geodesic closed form (the same identity
    pip_sphere.geodesic_buffer_vertices sweeps over bearings). Longitude
    normalized to [-180, 180)."""
    if isinstance(distance_m, Column):
        d = distance_m / F.lit(EARTH_RADIUS_M)
        sin_d, cos_d = F.sin(d), F.cos(d)
    else:
        dd = float(distance_m) / EARTH_RADIUS_M
        sin_d, cos_d = F.lit(math.sin(dd)), F.lit(math.cos(dd))
    p1 = F.radians(lat)
    th = F.radians(bearing_deg)
    # clamped: a destination landing exactly on a pole rounds sin_lat2 to
    # 1+ulp and would NaN the asin
    sin_lat2 = _clamp_unit(F.sin(p1) * cos_d + F.cos(p1) * sin_d * F.cos(th))
    lat2 = F.degrees(F.asin(sin_lat2))
    lon2 = F.degrees(
        F.radians(lon) + F.atan2(F.sin(th) * sin_d * F.cos(p1), cos_d - F.sin(p1) * sin_lat2)
    )
    lon2 = lon2 - F.lit(360.0) * F.floor((lon2 + F.lit(180.0)) / F.lit(360.0))
    return lon2, lat2
