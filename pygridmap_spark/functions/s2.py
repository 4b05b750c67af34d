"""S2-scheme spherical cell index — the engine's true sphere-aware cell key.

The north star asks for "H3/S2 cells"; ``cellindex.py`` supplies the planar
quadtree family (Morton/quadkey/Hilbert over equirectangular lon/lat, the
spherical analog of the reference's square cells, gridtiler.py:101-112).
Equirectangular cell AREA shrinks with cos(lat) — unbounded distortion
toward the poles, which becomes partition skew when the cell id is the
groupBy/partitionBy key at lake scale. This module adds the S2 scheme:

- cube-face decomposition of the sphere (6 faces, gnomonic projection),
- the per-face quadratic (s, t) reparameterization (publicly documented in
  s2geometry's ``s2coords.h``; cell areas vary <= ~2.1x over the WHOLE
  sphere, vs. unbounded for equirectangular),
- a Hilbert space-filling curve over each face's (i, j) grid (classic
  Lam–Shapiro bit formulation, public domain),
- the S2 64-bit id LAYOUT: ``face:3 | curve position:2*level | 1`` sentinel
  lsb, so parent/child/range algebra is pure bit arithmetic.

Honesty note: ids follow the S2 *layout* and the S2 *projection*, but no
s2geometry build ships in this container to cross-check the library's
Hilbert orientation tables, so ids are NOT claimed bit-interchangeable
with libs2. Every structural property a pipeline relies on — hierarchical
prefix containment, parent/child algebra, curve locality, near-equal cell
area, neighbor topology across cube edges — holds and is pinned by tests
(tests/test_s2.py).

Implementation: the whole encode is Catalyst column arithmetic (trig +
bitwise ops inside whole-stage codegen, zero Python). The Hilbert unroll
is one projection per level; each level's state columns are non-cheap
aliases referenced multiple times, which is exactly the CollapseProject
guard (SPARK-36718) that keeps the optimized plan LINEAR in `level`
(pinned by test) instead of exponentially inlined. A numpy twin
(`py_s2_index`) backs property tests and the >CATALYST_MAX_LEVEL kernel
route (`with_s2_index_kernel`).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_LEVEL = 30
# codegen stays comfortable to ~18 unrolled levels (plan is linear but each
# level is ~15 expressions); beyond that use with_s2_index_kernel.
CATALYST_MAX_LEVEL = 18

_FACE_BITS = 3
_POS_BITS = 2 * MAX_LEVEL + 1  # 61: curve bits + sentinel, S2 layout


def _check_level(level: int, cap: int = MAX_LEVEL) -> None:
    if not 0 < level <= cap:
        raise ValueError(f"level must be in (0, {cap}], got {level}")


# --- Catalyst encode --------------------------------------------------------


def _face_uv_cols(x: Column, y: Column, z: Column) -> tuple[Column, Column, Column]:
    """(face, u, v) from a direction vector; largest-|component| face pick,
    per-face (u, v) axes as documented in s2coords.h."""
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    face = (
        F.when((ax >= ay) & (ax >= az), F.when(x >= 0, 0).otherwise(3))
        .when(ay >= az, F.when(y >= 0, 1).otherwise(4))
        .otherwise(F.when(z >= 0, 2).otherwise(5))
    )
    # CaseWhen short-circuits at runtime, so only the selected face's
    # division executes (its denominator is the largest-|.| component,
    # nonzero for any unit vector) — no divide-by-zero under ANSI mode.
    u = (
        F.when(face == 0, y / x)
        .when(face == 1, -x / y)
        .when(face == 2, -x / z)
        .when(face == 3, z / x)
        .when(face == 4, z / y)
        .otherwise(-y / z)
    )
    v = (
        F.when(face == 0, z / x)
        .when(face == 1, z / y)
        .when(face == 2, -y / z)
        .when(face == 3, y / x)
        .when(face == 4, -x / y)
        .otherwise(x / z)
    )
    return face, u, v


def _uv_to_st_col(u: Column) -> Column:
    """Quadratic projection (s2coords.h UVtoST): equalizes cell areas."""
    return F.when(u >= 0, 0.5 * F.sqrt(1.0 + 3.0 * u)).otherwise(
        1.0 - 0.5 * F.sqrt(1.0 - 3.0 * u)
    )


def _st_to_uv_col(s: Column) -> Column:
    return F.when(s >= 0.5, (4.0 * s * s - 1.0) / 3.0).otherwise(
        (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0
    )


def _solid_angle_f_col(u: Column, v: Column) -> Column:
    """Corner term of the pyramid solid-angle closed form (see
    core/sphere.solid_angle_uv_rect, the numpy twin)."""
    return F.atan2(u * v, F.sqrt(1.0 + u * u + v * v))


def cell_area_sr(i: Column, j: Column, level: int, km2: bool = False) -> Column:
    """EXACT spherical area of a level-``level`` cell given its (i, j)
    leaf coordinates at that level — a pure Catalyst column expression
    (zero Python, stays inside WholeStageCodegen).

    A cell is the central projection of an axis-aligned rect in the
    face's gnomonic (u, v) chart, so its solid angle has the classic
    closed form: inclusion-exclusion of atan2(u*v, sqrt(1+u^2+v^2)) over
    the 4 corners (sanity anchor: a whole face is 2*pi/3). Face-
    independent — every cube face has identical chart geometry. With
    ``km2=True`` the result is scaled by the mean-Earth-radius sphere.

    This is what makes density rollups equal-AREA-correct: S2's quadratic
    st projection only approximately equalizes cells (max/min area ratio
    ~2.1 across a face at fine levels), so `count(*) / cell_area_sr(...)`
    is the honest
    per-km^2 statistic where a bare count-per-cell is not.
    """
    _check_level(level)
    inv = 1.0 / float(1 << level)
    u0 = _st_to_uv_col(i.cast("double") * inv)
    u1 = _st_to_uv_col((i.cast("double") + 1.0) * inv)
    v0 = _st_to_uv_col(j.cast("double") * inv)
    v1 = _st_to_uv_col((j.cast("double") + 1.0) * inv)
    area = (
        _solid_angle_f_col(u1, v1)
        - _solid_angle_f_col(u0, v1)
        - _solid_angle_f_col(u1, v0)
        + _solid_angle_f_col(u0, v0)
    )
    if km2:
        from pygridmap_spark.core.sphere import EARTH_RADIUS_KM

        return area * (EARTH_RADIUS_KM * EARTH_RADIUS_KM)
    return area


def full_id(face: Column, pos: Column, level: int) -> Column:
    """S2-layout 64-bit id from (face, level-``level`` curve position).

    ``face<<61 | pos<<(61-2L) | 1<<(60-2L)``; faces 4-5 set the sign bit
    (stored as signed two's complement, exactly like the JVM S2 ports)."""
    shift = _POS_BITS - 2 * level
    return (
        F.shiftleft(face.cast("long"), _POS_BITS)
        .bitwiseOR(F.shiftleft(pos, shift))
        .bitwiseOR(F.lit(1 << (shift - 1)))
    )


def compact_id(face: Column, pos: Column, level: int) -> Column:
    """Level-implicit compact id ``face*4^level + pos`` — always positive,
    < 2^63 for level <= 29; the friendlier groupBy/partition key when one
    fixed level is in play (and the form the DuckDB oracle twin emits)."""
    return F.shiftleft(face.cast("long"), 2 * level) + pos


# Per-axis |d(st)/d(theta)| supremum for the quadratic projection: a
# geodesic of angle theta displaces a point's (s, t) by at most
# theta * ST_GRAD_BOUND per axis within one face chart. Numerically the
# supremum is ~1.0606 (attained near face-edge midpoints); 9/8 adds a 6%
# safety margin. Pinned empirically by test_s2.test_gradient_bound_holds.
ST_GRAD_BOUND = 1.125


def _with_face_ij(df: DataFrame, level: int, lon: str, lat: str) -> DataFrame:
    """Internal: append __s2f__/__s2i__/__s2j__ at ``level`` (no Hilbert)."""
    lam = F.radians(F.col(lon))
    phi = F.radians(F.col(lat))
    cp = F.cos(phi)
    df = df.withColumns(
        {"__s2x__": cp * F.cos(lam), "__s2y__": cp * F.sin(lam), "__s2z__": F.sin(phi)}
    )
    face, u, v = _face_uv_cols(F.col("__s2x__"), F.col("__s2y__"), F.col("__s2z__"))
    df = df.withColumns({"__s2f__": face, "__s2u__": u, "__s2v__": v})
    n = 1 << level
    s = _uv_to_st_col(F.col("__s2u__"))
    t = _uv_to_st_col(F.col("__s2v__"))
    clamp = lambda c: F.greatest(F.lit(0).cast("long"), F.least(c, F.lit(n - 1).cast("long")))  # noqa: E731
    # NULL/NaN coordinates must yield NULL face/i/j, not a fabricated cell:
    # the face CaseWhen's otherwise() would turn a null comparison chain
    # into face 5, greatest/least SKIP nulls (i/j -> n-1), and NaN passes
    # every >= comparison (face 0 corner cell). Null keys then simply drop
    # out of equi-joins/rollups instead of polluting a real cell.
    ok = (
        F.col(lon).isNotNull()
        & F.col(lat).isNotNull()
        & ~F.isnan(F.col(lon))
        & ~F.isnan(F.col(lat))
    )
    return df.withColumns(
        {
            "__s2f__": F.when(ok, F.col("__s2f__")),
            "__s2i__": F.when(ok, clamp(F.floor(s * F.lit(float(n))))),
            "__s2j__": F.when(ok, clamp(F.floor(t * F.lit(float(n))))),
        }
    ).drop("__s2x__", "__s2y__", "__s2z__", "__s2u__", "__s2v__")


def with_s2_face_ij(
    df: DataFrame,
    level: int,
    lon: str = "lon",
    lat: str = "lat",
    prefix: str = "s2_",
) -> DataFrame:
    """Append only ``{prefix}face``, ``{prefix}i``, ``{prefix}j`` at
    ``level`` — the cheap equi-join key for spatial joins/kNN (the ij
    PREFIX is the ancestor: coarsening is a shiftright, no Hilbert
    needed). Valid to level 30; pure Catalyst. NULL/NaN coordinates
    yield NULL keys (the row drops from any equi-join)."""
    _check_level(level)
    df = _with_face_ij(df, level, lon, lat)
    return df.withColumns(
        {
            f"{prefix}face": F.col("__s2f__").cast("int"),
            f"{prefix}i": F.col("__s2i__"),
            f"{prefix}j": F.col("__s2j__"),
        }
    ).drop("__s2f__", "__s2i__", "__s2j__")


def with_s2_index(
    df: DataFrame,
    level: int,
    lon: str = "lon",
    lat: str = "lat",
    prefix: str = "s2_",
) -> DataFrame:
    """Append ``{prefix}face``, ``{prefix}i``, ``{prefix}j``,
    ``{prefix}pos``, ``{prefix}cell`` (S2-layout id) and
    ``{prefix}compact`` at ``level`` — all Catalyst, zero Python.

    Plan shape: one narrow projection per Hilbert level (linear in
    ``level``; see module docstring), all inside WholeStageCodegen.
    """
    _check_level(level, CATALYST_MAX_LEVEL)
    df = _with_face_ij(df, level, lon, lat)
    df = _hilbert_pos_cols(df, level, "__s2i__", "__s2j__", "__s2d__")
    pos = F.col("__s2d__")
    f = F.col("__s2f__")
    out = df.withColumns(
        {
            f"{prefix}face": f.cast("int"),
            f"{prefix}i": F.col("__s2i__"),
            f"{prefix}j": F.col("__s2j__"),
            f"{prefix}pos": pos,
            f"{prefix}cell": full_id(f, pos, level),
            f"{prefix}compact": compact_id(f, pos, level),
        }
    )
    return out.drop("__s2f__", "__s2i__", "__s2j__", "__s2d__")


def _hilbert_pos_cols(
    df: DataFrame, level: int, icol: str, jcol: str, out: str
) -> DataFrame:
    """Unrolled Lam–Shapiro xy2d: one withColumns per level. The three
    state aliases are non-cheap and multi-referenced by the next level, so
    CollapseProject leaves one Project per level (linear plan, pinned)."""
    df = df.withColumns(
        {
            "__hx__": F.col(icol).cast("long"),
            "__hy__": F.col(jcol).cast("long"),
            out: F.lit(0).cast("long"),
        }
    )
    for k in range(level - 1, -1, -1):
        hx, hy = F.col("__hx__"), F.col("__hy__")
        rx = F.shiftright(hx, k).bitwiseAND(F.lit(1))
        ry = F.shiftright(hy, k).bitwiseAND(F.lit(1))
        mask = (1 << k) - 1
        xl = hx.bitwiseAND(F.lit(mask))
        yl = hy.bitwiseAND(F.lit(mask))
        flip = (ry == 0) & (rx == 1)
        xl2 = F.when(flip, F.lit(mask) - xl).otherwise(xl)
        yl2 = F.when(flip, F.lit(mask) - yl).otherwise(yl)
        swap = ry == 0
        df = df.withColumns(
            {
                out: F.col(out).bitwiseOR(
                    F.shiftleft((F.lit(3) * rx).bitwiseXOR(ry), 2 * k)
                ),
                "__hx__": F.when(swap, yl2).otherwise(xl2),
                "__hy__": F.when(swap, xl2).otherwise(yl2),
            }
        )
    return df.drop("__hx__", "__hy__")


# --- id algebra (pure Column, any producer) ---------------------------------


def cell_lsb(cell: Column) -> Column:
    """Lowest set bit of an S2-layout id (``id & -id``)."""
    return cell.bitwiseAND(-cell)


def cell_level(cell: Column) -> Column:
    """Level of an S2-layout id: ``30 - bit_count(lsb - 1) / 2``."""
    return (F.lit(MAX_LEVEL) - F.bit_count(cell_lsb(cell) - 1) / 2).cast("int")


def parent_id(cell: Column, level: int) -> Column:
    """Ancestor of an S2-layout id at ``level`` (pure bit arithmetic —
    the prefix-containment algebra that makes rollups a shiftright)."""
    _check_level(level)
    new_lsb = 1 << (_POS_BITS - 2 * level - 1)
    return cell.bitwiseAND(F.lit(-2 * new_lsb)).bitwiseOR(F.lit(new_lsb))


def range_min(cell: Column) -> Column:
    """Smallest leaf id contained in the cell (for prefix range joins)."""
    return cell - (cell_lsb(cell) - 1)


def range_max(cell: Column) -> Column:
    """Largest leaf id contained in the cell."""
    return cell + (cell_lsb(cell) - 1)


def token(cell: Column) -> Column:
    """Canonical hex token: 16 lowercase hex digits, trailing zeros
    stripped (the S2 string form; '' would mean the invalid id 0)."""
    h = F.lower(F.lpad(F.hex(cell), 16, "0"))
    return F.regexp_replace(h, "0+$", "")


def compact_parent(compact: Column, level: int, parent_level: int) -> Column:
    """Coarsen a compact id from ``level`` to ``parent_level``: the curve
    position prefix IS the ancestor (shiftright by 2*delta) and the face
    bits ride along untouched."""
    if parent_level > level:
        raise ValueError("parent_level must be <= level")
    return F.shiftright(compact, 2 * (level - parent_level))


# --- numpy twin + kernel route ---------------------------------------------


def _np_hilbert_d(ix: np.ndarray, jy: np.ndarray, level: int) -> np.ndarray:
    x = ix.astype(np.int64, copy=True)
    y = jy.astype(np.int64, copy=True)
    d = np.zeros_like(x)
    for k in range(level - 1, -1, -1):
        rx = (x >> k) & 1
        ry = (y >> k) & 1
        d |= ((3 * rx) ^ ry) << (2 * k)
        mask = (np.int64(1) << k) - 1
        xl = x & mask
        yl = y & mask
        flip = (ry == 0) & (rx == 1)
        xl2 = np.where(flip, mask - xl, xl)
        yl2 = np.where(flip, mask - yl, yl)
        swap = ry == 0
        x = np.where(swap, yl2, xl2)
        y = np.where(swap, xl2, yl2)
    return d


def _np_hilbert_xy(d: np.ndarray, level: int) -> tuple[np.ndarray, np.ndarray]:
    d = d.astype(np.int64)
    x = np.zeros_like(d)
    y = np.zeros_like(d)
    for k in range(level):
        s = np.int64(1) << k
        rx = 1 & (d >> (2 * k + 1))
        ry = 1 & ((d >> (2 * k)) ^ rx)
        flip = (ry == 0) & (rx == 1)
        x2 = np.where(flip, s - 1 - x, x)
        y2 = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y2, x2), np.where(swap, x2, y2)
        x = x + s * rx
        y = y + s * ry
    return x, y


def _np_face_uv(
    x: np.ndarray, y: np.ndarray, z: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    fx = (ax >= ay) & (ax >= az)
    fy = ~fx & (ay >= az)
    face = np.where(
        fx, np.where(x >= 0, 0, 3), np.where(fy, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5))
    ).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve) in enumerate(
        [
            (lambda: y / x, lambda: z / x),
            (lambda: -x / y, lambda: z / y),
            (lambda: -x / z, lambda: -y / z),
            (lambda: z / x, lambda: y / x),
            (lambda: z / y, lambda: -x / y),
            (lambda: -y / z, lambda: x / z),
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face, u, v


def _np_uv_to_st(u: np.ndarray) -> np.ndarray:
    out = np.empty_like(u)
    pos = u >= 0
    out[pos] = 0.5 * np.sqrt(1.0 + 3.0 * u[pos])
    out[~pos] = 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u[~pos])
    return out


def _np_st_to_uv(s: np.ndarray) -> np.ndarray:
    out = np.empty_like(s)
    hi = s >= 0.5
    out[hi] = (4.0 * s[hi] * s[hi] - 1.0) / 3.0
    out[~hi] = (1.0 - 4.0 * (1.0 - s[~hi]) * (1.0 - s[~hi])) / 3.0
    return out


_FACE_UV_TO_XYZ = (
    # face -> xyz from (u, v): the inverse of _np_face_uv's per-face axes
    lambda u, v: (np.ones_like(u), u, v),
    lambda u, v: (-u, np.ones_like(u), v),
    lambda u, v: (-u, -v, np.ones_like(u)),
    lambda u, v: (-np.ones_like(u), -v, -u),
    lambda u, v: (v, -np.ones_like(u), -u),
    lambda u, v: (-v, u, -np.ones_like(u)),
)


def _np_face_uv_to_xyz(
    face: np.ndarray, u: np.ndarray, v: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f, fn in enumerate(_FACE_UV_TO_XYZ):
        m = face == f
        if m.any():
            xf, yf, zf = fn(u[m], v[m])
            x[m], y[m], z[m] = xf, yf, zf
    return x, y, z


def py_s2_index(
    lon: np.ndarray, lat: np.ndarray, level: int
) -> dict[str, np.ndarray]:
    """numpy twin of ``with_s2_index``: dict of face/i/j/pos/cell/compact.

    Bit-identical to the Catalyst route (pinned by test) and valid to
    ``level`` 30 — also the engine of ``with_s2_index_kernel``."""
    _check_level(level)
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    cp = np.cos(phi)
    x, y, z = cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)
    face, u, v = _np_face_uv(x, y, z)
    n = np.int64(1 << level)
    i = np.clip(np.floor(_np_uv_to_st(u) * n).astype(np.int64), 0, n - 1)
    j = np.clip(np.floor(_np_uv_to_st(v) * n).astype(np.int64), 0, n - 1)
    pos = _np_hilbert_d(i, j, level)
    shift = _POS_BITS - 2 * level
    cell = (
        (face.astype(np.uint64) << np.uint64(_POS_BITS))
        | (pos.astype(np.uint64) << np.uint64(shift))
        | np.uint64(1 << (shift - 1))
    ).view(np.int64)
    compact = (face << np.int64(2 * level)) + pos
    return {"face": face, "i": i, "j": j, "pos": pos, "cell": cell, "compact": compact}


def py_cell_center(
    face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int
) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) of the (face, i, j) cell center — tests + neighbor wrap."""
    n = float(1 << level)
    u = _np_st_to_uv((np.asarray(i, np.float64) + 0.5) / n)
    v = _np_st_to_uv((np.asarray(j, np.float64) + 0.5) / n)
    x, y, z = _np_face_uv_to_xyz(np.asarray(face), u, v)
    r = np.sqrt(x * x + y * y + z * z)
    return np.degrees(np.arctan2(y, x)), np.degrees(np.arcsin(z / r))


_NEIGHBOR_OFFSETS = ((0, 1), (0, -1), (1, 0), (-1, 0), (1, 1), (1, -1), (-1, 1), (-1, -1))


def py_s2_neighbors(
    face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int
) -> list[set[int]]:
    """Per-cell set of edge+vertex neighbor COMPACT ids, cube-wrap correct.

    Off-face offsets use the FromFaceIJWrap trick: extend (s, t) linearly
    past [0, 1] (the quadratic formulas are monotone outside the face),
    lift to an (unnormalized) cube direction, and re-canonicalize via
    face/uv — so neighbors across cube edges and at the 3-cell cube
    corners come out right (corner cells get 7 distinct neighbors, not 8;
    pinned by test)."""
    _check_level(level)
    face = np.asarray(face, np.int64)
    i = np.asarray(i, np.int64)
    j = np.asarray(j, np.int64)
    n = np.int64(1 << level)
    out: list[set[int]] = [set() for _ in range(len(face))]
    for di, dj in _NEIGHBOR_OFFSETS:
        ii = i + di
        jj = j + dj
        inside = (ii >= 0) & (ii < n) & (jj >= 0) & (jj < n)
        if inside.any():
            pos = _np_hilbert_d(ii[inside], jj[inside], level)
            comp = (face[inside] << np.int64(2 * level)) + pos
            for idx, c in zip(np.nonzero(inside)[0], comp):
                out[idx].add(int(c))
        off = ~inside
        if off.any():
            s = (ii[off].astype(np.float64) + 0.5) / float(n)
            t = (jj[off].astype(np.float64) + 0.5) / float(n)
            x, y, z = _np_face_uv_to_xyz(face[off], _np_st_to_uv(s), _np_st_to_uv(t))
            f2, u2, v2 = _np_face_uv(x, y, z)
            i2 = np.clip(np.floor(_np_uv_to_st(u2) * n).astype(np.int64), 0, n - 1)
            j2 = np.clip(np.floor(_np_uv_to_st(v2) * n).astype(np.int64), 0, n - 1)
            pos2 = _np_hilbert_d(i2, j2, level)
            comp2 = (f2 << np.int64(2 * level)) + pos2
            for idx, c in zip(np.nonzero(off)[0], comp2):
                out[idx].add(int(c))
    # drop self ids (possible only via the corner-wrap case above)
    own_pos = _np_hilbert_d(i, j, level)
    own_comp = (face << np.int64(2 * level)) + own_pos
    for idx, own in enumerate(own_comp):
        out[idx].discard(int(own))
    return out


def py_s2_neighbors_ij(
    face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Edge+vertex neighbors as flat (row_idx, face, i, j) arrays (each
    input row contributes 7-8 deduped neighbor triples; self-wraps at cube
    corners dropped). Same cube-wrap math as :func:`py_s2_neighbors` but
    keyed by (face, i, j) — no Hilbert — so ancestors are shiftrights."""
    _check_level(level)
    face = np.asarray(face, np.int64)
    i = np.asarray(i, np.int64)
    j = np.asarray(j, np.int64)
    n = np.int64(1 << level)
    rows, fs, is_, js = [], [], [], []
    for di, dj in _NEIGHBOR_OFFSETS:
        ii = i + di
        jj = j + dj
        inside = (ii >= 0) & (ii < n) & (jj >= 0) & (jj < n)
        if inside.any():
            rows.append(np.nonzero(inside)[0])
            fs.append(face[inside])
            is_.append(ii[inside])
            js.append(jj[inside])
        off = ~inside
        if off.any():
            s = (ii[off].astype(np.float64) + 0.5) / float(n)
            t = (jj[off].astype(np.float64) + 0.5) / float(n)
            x, y, z = _np_face_uv_to_xyz(face[off], _np_st_to_uv(s), _np_st_to_uv(t))
            f2, u2, v2 = _np_face_uv(x, y, z)
            i2 = np.clip(np.floor(_np_uv_to_st(u2) * n).astype(np.int64), 0, n - 1)
            j2 = np.clip(np.floor(_np_uv_to_st(v2) * n).astype(np.int64), 0, n - 1)
            rows.append(np.nonzero(off)[0])
            fs.append(f2)
            is_.append(i2)
            js.append(j2)
    row = np.concatenate(rows)
    f = np.concatenate(fs)
    ii = np.concatenate(is_)
    jj = np.concatenate(js)
    # dedup (row, cell) and drop corner self-wraps; lexsort (no packed key
    # — a single int64 key would overflow at high levels)
    order = np.lexsort((jj, ii, f, row))
    row, f, ii, jj = row[order], f[order], ii[order], jj[order]
    dup = np.zeros(len(row), dtype=bool)
    dup[1:] = (
        (row[1:] == row[:-1]) & (f[1:] == f[:-1]) & (ii[1:] == ii[:-1]) & (jj[1:] == jj[:-1])
    )
    self_wrap = (f == face[row]) & (ii == i[row]) & (jj == j[row])
    keep = ~dup & ~self_wrap
    return row[keep], f[keep], ii[keep], jj[keep]


def with_s2_index_kernel(
    df: DataFrame,
    level: int,
    lon: str = "lon",
    lat: str = "lat",
    prefix: str = "s2_",
) -> DataFrame:
    """Arrow-kernel route (``mapInPandas`` over py_s2_index) for levels past
    the Catalyst unroll cap — zero shuffles, one narrow pass; bit-identical
    to ``with_s2_index`` where both apply (pinned by test)."""
    _check_level(level)
    from pygridmap_spark import util as _util

    schema = _util.schema_with(
        df,
        f"{prefix}face int",
        f"{prefix}i long",
        f"{prefix}j long",
        f"{prefix}pos long",
        f"{prefix}cell long",
        f"{prefix}compact long",
    )

    def _kernel(batches):
        for pdf in batches:
            r = py_s2_index(pdf[lon].to_numpy(), pdf[lat].to_numpy(), level)
            pdf = pdf.copy()
            pdf[f"{prefix}face"] = r["face"].astype(np.int32)
            pdf[f"{prefix}i"] = r["i"]
            pdf[f"{prefix}j"] = r["j"]
            pdf[f"{prefix}pos"] = r["pos"]
            pdf[f"{prefix}cell"] = r["cell"]
            pdf[f"{prefix}compact"] = r["compact"]
            yield pdf

    return df.mapInPandas(_kernel, schema)



# Exactness domain of the winding-based region operators: the polygon's
# bounding cap must fit in an OPEN QUARTER-SPHERE. The tangent-plane
# winding number flags a region AND its antipodal mirror; candidates are
# restricted to the bounding cap, which excludes the mirror exactly when
# pi - pad > pad, i.e. pad < pi/2. At pad >= pi/2 the two overlap and no
# cap/chord test can separate them (orientation-agnostic kernel), so
# polyfill/covering fail closed rather than silently tag mirror cells.
_MAX_CAP_RAD = np.pi / 2.0 * (1.0 - 1e-9)


def _check_cap(pad: float, what: str) -> None:
    if pad >= _MAX_CAP_RAD:
        raise ValueError(
            f"{what}: polygon bounding cap radius {np.degrees(pad):.1f} deg >= "
            "90 deg (quarter-sphere): the orientation-agnostic winding kernel "
            "cannot distinguish the polygon from its antipodal mirror at this "
            "size. Split the polygon (e.g. clip by hemispheres) into "
            "smaller-cap pieces."
        )


def _np_expand_group(g, inv_n):
    """Expand one polygon's chunked (_f, _i, _jlo, _jhi) range rows into
    candidate cells (f, i, j) plus their NORMALIZED center unit vectors —
    shared by the plain and classify containment kernels."""
    lo = g["_jlo"].to_numpy()
    hi = g["_jhi"].to_numpy()
    ii = g["_i"].to_numpy()
    ffc = g["_f"].to_numpy()
    spans = hi - lo + 1
    total = int(spans.sum())
    idx = np.arange(total) - np.repeat(np.cumsum(spans) - spans, spans)
    j = np.repeat(lo, spans) + idx
    i = np.repeat(ii, spans)
    f = np.repeat(ffc, spans)
    u = _np_st_to_uv((i.astype(np.float64) + 0.5) * inv_n)
    v = _np_st_to_uv((j.astype(np.float64) + 0.5) * inv_n)
    x, y, z = _np_face_uv_to_xyz(f, u, v)
    norm = np.sqrt(x * x + y * y + z * z)
    return f, i, j, x / norm, y / norm, z / norm


def _np_cell_circumradius(f, i, j, inv_n, px, py, pz):
    """Exact per-cell circumradius: max angle from the NORMALIZED center
    (px, py, pz) to the 4 corners (quadratic st is monotone, so corners
    realize the max)."""
    cosmin = np.ones(len(px))
    for di in (0.0, 1.0):
        cu = _np_st_to_uv((i.astype(np.float64) + di) * inv_n)
        for dj in (0.0, 1.0):
            cv = _np_st_to_uv((j.astype(np.float64) + dj) * inv_n)
            cx, cy, cz = _np_face_uv_to_xyz(f, cu, cv)
            cn = np.sqrt(cx * cx + cy * cy + cz * cz)
            dot = (px * cx + py * cy + pz * cz) / cn
            np.minimum(cosmin, dot, out=cosmin)
    return np.arccos(np.clip(cosmin, -1.0, 1.0))


def _np_classify_cells(f, i, j, level, rxyz):
    """(inside, boundary) for cells (f, i, j) at ``level`` vs a geodesic
    ring list (unit-vector arrays): ``inside`` = center containment
    (winding), ``boundary`` = the cell's circumball can touch a boundary
    arc (min arc distance <= exact max center-to-corner angle, margin
    erring toward boundary). interior == inside & ~boundary; a cell with
    neither flag contains no polygon point. Frontier-sized inputs (the
    covering refiner) — no slabbing."""
    from pygridmap_spark.core import sphere as SPH

    inv_n = 1.0 / float(1 << level)
    u = _np_st_to_uv((i.astype(np.float64) + 0.5) * inv_n)
    v = _np_st_to_uv((j.astype(np.float64) + 0.5) * inv_n)
    x, y, z = _np_face_uv_to_xyz(f, u, v)
    nn = np.sqrt(x * x + y * y + z * z)
    p = np.column_stack([x / nn, y / nn, z / nn])
    rcell = _np_cell_circumradius(f, i, j, inv_n, p[:, 0], p[:, 1], p[:, 2])
    inside = np.zeros(len(p), dtype=bool)
    mind = np.full(len(p), np.pi)
    for rx in rxyz:
        inside ^= SPH.points_in_spherical_ring(p, rx)
        np.minimum(mind, SPH.min_arc_dist(p, rx), out=mind)
    boundary = mind <= rcell * (1.0 + 1e-9) + 1e-12
    return inside, boundary, p, rcell


def _np_cell_ranges(f, i, j, level):
    """S2-layout id + leaf [range_min, range_max] for cells at ``level``
    (numpy twin of full_id/range_min/range_max; uint64 internally, viewed
    signed like the Column algebra — a cell never spans the sign
    boundary, so signed BETWEEN stays correct per range)."""
    pos = _np_hilbert_d(i, j, level)
    shift = _POS_BITS - 2 * level
    half = np.uint64(1 << (shift - 1))
    cell = (
        (f.astype(np.uint64) << np.uint64(_POS_BITS))
        | (pos.astype(np.uint64) << np.uint64(shift))
        | half
    )
    off = half - np.uint64(1)
    return (
        cell.view(np.int64),
        (cell - off).view(np.int64),
        (cell + off).view(np.int64),
    )


def covering(
    polys: DataFrame,
    max_cells: int = 64,
    max_level: int = 18,
    wkb_col: str = "wkb",
    id_col: str = "poly_id",
    prefix: str = "s2_",
) -> DataFrame:
    """Adaptive MIXED-LEVEL cell covering of each geodesic (multi)polygon
    — the S2 RegionCoverer analog: at most ``max_cells`` cells per
    polygon (guaranteed), coarse where the region is fat, fine along the
    boundary, each labeled ``{prefix}interior`` (provably inside, same
    exact criterion as ``polyfill(classify=True)``) and carrying the
    S2-layout id plus its descendant leaf range
    [``{prefix}range_min``, ``{prefix}range_max``] — the form that
    compiles a region into BETWEEN predicates on an indexed cell column
    (operators.pip_sphere.region_filter pushes them into the scan).

    Level-synchronous refinement rather than s2geometry's priority queue
    (same containment guarantee — the covering always contains the whole
    polygon; cell selection can differ): seed with the bounding-cap
    cover (whole sphere for cap-scale polygons), then repeatedly emit
    interior cells, drop outside cells, and split boundary cells while
    the budget allows; leftover boundary cells emit as-is. One Arrow
    pass over the polygon rows — per-polygon work is O(max_cells x
    edges), distributed by polygon."""
    _check_level(max_level)
    if max_cells < 9:
        # the cap seed is center + 8 cube-wrap neighbors: if all 9 come
        # back as boundary cells on the very first round they are emitted
        # as-is, so any smaller budget could be exceeded (the per-round
        # split check only guards rounds AFTER the seed)
        raise ValueError("max_cells must be >= 9 (the 9-cell cap seed)")
    id_field = f"{id_col} {dict(polys.dtypes)[id_col]}"
    schema = (
        f"{id_field}, {prefix}face int, {prefix}i long, {prefix}j long, "
        f"{prefix}level int, {prefix}cell long, {prefix}range_min long, "
        f"{prefix}range_max long, {prefix}interior boolean"
    )

    def _cover(batches):
        import pandas as pd

        from pygridmap_spark.core import sphere as SPH
        from pygridmap_spark.core import wkb as WKB

        for pdf in batches:
            parts = []
            for pid, buf in zip(pdf[id_col], pdf[wkb_col]):
                if buf is None:
                    continue
                mp = WKB.decode_multipolygon(bytes(buf))
                rings = [r for poly in mp for r in poly if len(r) >= 3]
                if not rings:
                    continue
                rxyz = [SPH.ring_to_xyz(r) for r in rings]
                c, theta = SPH.bounding_cap(rings)
                pad = min(theta * (1.0 + 1e-12) + 1e-15, np.pi)
                _check_cap(pad, "covering")
                lc = (
                    int(np.floor(-np.log2(pad * ST_GRAD_BOUND)))
                    if pad * ST_GRAD_BOUND < 1.0
                    else 0
                )
                lev = min(max(lc, 0), max_level)
                if lev < 1:
                    lev = 0
                    f = np.arange(6, dtype=np.int64)
                    i = np.zeros(6, dtype=np.int64)
                    j = np.zeros(6, dtype=np.int64)
                else:
                    clon = np.degrees(np.arctan2(c[1], c[0]))
                    clat = np.degrees(np.arcsin(np.clip(c[2], -1.0, 1.0)))
                    idx0 = py_s2_index(np.array([clon]), np.array([clat]), lev)
                    _, fn, in_, jn = py_s2_neighbors_ij(
                        idx0["face"], idx0["i"], idx0["j"], lev
                    )
                    f = np.concatenate([idx0["face"], fn])
                    i = np.concatenate([idx0["i"], in_])
                    j = np.concatenate([idx0["j"], jn])
                ef, ei, ej, el, eint = [], [], [], [], []
                n_out = 0
                cm = 2.0 * np.sin(min(pad, np.pi) / 2.0)
                while True:
                    inside, bnd, ctr, rcell = _np_classify_cells(f, i, j, lev, rxyz)
                    # cap restriction: the winding test also flags the
                    # polygon's ANTIPODAL mirror (hemisphere caveat) —
                    # only cells whose circumball can reach the bounding
                    # cap may carry either label (chord subadditivity, as
                    # in polyfill's candidate prefilter)
                    dx = ctr[:, 0] - c[0]
                    dy = ctr[:, 1] - c[1]
                    dz = ctr[:, 2] - c[2]
                    near = np.sqrt(dx * dx + dy * dy + dz * dz) <= cm + 2.0 * np.sin(
                        rcell / 2.0
                    )
                    inside &= near
                    bnd &= near
                    it = inside & ~bnd
                    if it.any():
                        ef.append(f[it]); ei.append(i[it]); ej.append(j[it])
                        el.append(np.full(int(it.sum()), lev, np.int64))
                        eint.append(np.ones(int(it.sum()), bool))
                        n_out += int(it.sum())
                    fb, ib, jb = f[bnd], i[bnd], j[bnd]
                    if len(fb) == 0:
                        break
                    if lev >= max_level or n_out + 4 * len(fb) > max_cells:
                        ef.append(fb); ei.append(ib); ej.append(jb)
                        el.append(np.full(len(fb), lev, np.int64))
                        eint.append(np.zeros(len(fb), bool))
                        n_out += len(fb)
                        break
                    f = np.repeat(fb, 4)
                    i = (ib[:, None] * 2 + np.array([0, 0, 1, 1])).ravel()
                    j = (jb[:, None] * 2 + np.array([0, 1, 0, 1])).ravel()
                    lev += 1
                if not ef:
                    continue
                f = np.concatenate(ef); i = np.concatenate(ei)
                j = np.concatenate(ej); lv = np.concatenate(el)
                it = np.concatenate(eint)
                cells = np.empty(len(f), np.int64)
                rmin = np.empty(len(f), np.int64)
                rmax = np.empty(len(f), np.int64)
                for L in np.unique(lv):
                    m = lv == L
                    cells[m], rmin[m], rmax[m] = _np_cell_ranges(
                        f[m], i[m], j[m], int(L)
                    )
                parts.append(
                    pd.DataFrame(
                        {
                            id_col: np.repeat(np.asarray(pid), len(f)),
                            f"{prefix}face": f.astype(np.int32),
                            f"{prefix}i": i,
                            f"{prefix}j": j,
                            f"{prefix}level": lv.astype(np.int32),
                            f"{prefix}cell": cells,
                            f"{prefix}range_min": rmin,
                            f"{prefix}range_max": rmax,
                            f"{prefix}interior": it,
                        }
                    )
                )
            if parts:
                yield pd.concat(parts, ignore_index=True)

    return polys.select(id_col, wkb_col).mapInPandas(_cover, schema)


def py_cell_corners(
    face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int
) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) degrees of the 4 cell corners, shape (N, 4), in st
    order (0,0) (1,0) (1,1) (0,1) — the cell's geodesic outline (cell
    edges are st-axis lines, which are great-circle arcs in the gnomonic
    face chart)."""
    n = float(1 << level)
    lon = np.empty((len(i), 4))
    lat = np.empty((len(i), 4))
    for k, (di, dj) in enumerate(((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0))):
        u = _np_st_to_uv((np.asarray(i, np.float64) + di) / n)
        v = _np_st_to_uv((np.asarray(j, np.float64) + dj) / n)
        x, y, z = _np_face_uv_to_xyz(np.asarray(face), u, v)
        r = np.sqrt(x * x + y * y + z * z)
        lon[:, k] = np.degrees(np.arctan2(y, x))
        lat[:, k] = np.degrees(np.arcsin(z / r))
    return lon, lat


def cell_outline_wkb(
    df: DataFrame,
    level: int,
    face: str = "s2_face",
    i: str = "s2_i",
    j: str = "s2_j",
    out_col: str = "cell_wkb",
) -> DataFrame:
    """Append each cell's geodesic outline as a WKB polygon (closed
    4-corner ring) — the vector form of a cell rollup, consumable by the
    overlay/dissolve machinery and by the spherical PIP kernels. One
    Arrow pass, zero shuffles."""
    _check_level(level)
    from pygridmap_spark import util as _util

    schema = _util.schema_with(df, f"{out_col} binary")

    def _kernel(batches):
        from pygridmap_spark.core import wkb as WKB

        for pdf in batches:
            lon, lat = py_cell_corners(
                pdf[face].to_numpy(), pdf[i].to_numpy(), pdf[j].to_numpy(), level
            )
            pdf = pdf.copy()
            pdf[out_col] = [
                WKB.encode_multipolygon(
                    [[np.column_stack([np.append(lon[r], lon[r, 0]),
                                       np.append(lat[r], lat[r, 0])])]]
                )
                for r in range(len(pdf))
            ]
            yield pdf

    return df.mapInPandas(_kernel, schema)


def py_cells_to_multipolygon(face: int, i: np.ndarray, j: np.ndarray, level: int) -> list:
    """EXACT dissolved outline of a set of same-face level-``level`` cells
    as a multipolygon of geodesic lon/lat rings (H3's cellsToMultiPolygon
    semantics for the S2 scheme; inverse of :func:`polyfill`).

    Exactness argument: cells are unit squares on the face's integer
    (i, j) grid, so adjacent cells share FULL bit-identical edges — the
    shared-edge dissolve (:func:`_grid_outline`, the vectorized twin of
    ``core.geometry.dissolve_multipolygon``, equivalence property-pinned)
    cancels every interior seam with no tolerance anywhere. Surviving
    outline edges are axis-parallel in (i, j), hence axis-parallel in
    (s, t) and — because st→uv is per-axis monotone — axis-parallel in the
    gnomonic (u, v) chart, where a u=const / v=const line IS a great
    circle: every output edge is a true geodesic arc, and the collinear
    vertices the dissolve drops along a straight run lie on that same
    arc, so dropping them is exact on the sphere too.

    Returns ``[[ring, ...], ...]``: outer shells + holes per polygon,
    each ring an (V, 2) lon/lat-degree array (even-odd semantics, the
    convention of every spherical consumer in this repo — core/sphere.py
    containment is orientation-insensitive). Duplicate input cells are
    deduped (a repeated cell would otherwise break the partition
    precondition of the strict dissolve)."""
    _check_level(level)
    ij = np.unique(
        np.stack([np.asarray(i, np.int64), np.asarray(j, np.int64)], axis=1), axis=0
    )
    mp = _grid_outline(ij)
    return _lift_ij_rings(mp, face, level)


def _cells_outline_via_dissolve(ij: np.ndarray) -> list:
    """Reference implementation of the grid outline through the general
    strict dissolve — kept for the equivalence property test of
    :func:`_grid_outline` (the vectorized fast path)."""
    from pygridmap_spark.core import geometry as GEO

    cells = [
        [
            np.array(
                [[a, b], [a + 1, b], [a + 1, b + 1], [a, b + 1]], dtype=np.float64
            )
        ]
        for a, b in ij
    ]
    return GEO.dissolve_multipolygon(
        cells, strict=True, assume_oriented=True, input_area=float(len(ij))
    )


_GRID_DX = np.array([1, 0, -1, 0], dtype=np.int64)  # E N W S
_GRID_DY = np.array([0, 1, 0, -1], dtype=np.int64)


def _grid_member(keys: np.ndarray, sorted_keys: np.ndarray) -> np.ndarray:
    pos = np.searchsorted(sorted_keys, keys)
    ok = pos < len(sorted_keys)
    out = np.zeros(len(keys), dtype=bool)
    out[ok] = sorted_keys[pos[ok]] == keys[ok]
    return out


def _grid_outline(ij: np.ndarray) -> list:
    """EXACT dissolved outline of a set of unit squares on the integer
    grid, as canonical multipolygons (CCW shells + CW holes, exactly-
    collinear run vertices dropped) — the vectorized twin of running the
    general strict dissolve over the squares (equivalence pinned by a
    property test). Everything is numpy: edge cancellation is a neighbor-
    membership test, the left-turn traversal is three searchsorted passes
    that build a successor permutation, and Python only walks its cycles.

    The turn priority (right > straight > left, region always on the LEFT)
    is the general stitcher's "smallest CCW rotation from the reversed
    arrival edge" restated on the 4 grid directions: two diagonally
    touching squares merge into one pinched CCW ring, while a hole
    touching the shell at a corner stays a separate CW ring — matching
    the reference dissolve exactly (pinned by the equivalence test)."""
    ii = np.asarray(ij[:, 0], dtype=np.int64)
    jj = np.asarray(ij[:, 1], dtype=np.int64)
    k = len(ii)
    if k == 0:
        return []
    PACK = np.int64(1) << np.int64(31)
    cell_keys = np.sort(ii * PACK + jj)

    def has(di: int, dj: int) -> np.ndarray:
        return _grid_member((ii + di) * PACK + (jj + dj), cell_keys)

    # directed boundary edges, region on the left: (start x, start y, dir)
    sx_parts, sy_parts, dir_parts = [], [], []
    for d, (sx, sy, ndi, ndj) in enumerate(
        (
            (ii, jj, 0, -1),  # E: bottom edge, survives iff no cell below
            (ii + 1, jj, 1, 0),  # N: right edge, iff no cell east
            (ii + 1, jj + 1, 0, 1),  # W: top edge, iff no cell above
            (ii, jj + 1, -1, 0),  # S: left edge, iff no cell west
        )
    ):
        m = ~has(ndi, ndj)
        sx_parts.append(sx[m])
        sy_parts.append(sy[m])
        dir_parts.append(np.full(int(m.sum()), d, dtype=np.int64))
    sx = np.concatenate(sx_parts)
    sy = np.concatenate(sy_parts)
    dr = np.concatenate(dir_parts)
    ne = len(sx)
    ex = sx + _GRID_DX[dr]
    ey = sy + _GRID_DY[dr]
    # successor permutation: first existing among left/straight/right
    ekey = (sx * PACK + sy) * 4 + dr
    order = np.argsort(ekey, kind="stable")
    skey = ekey[order]
    succ = np.full(ne, -1, dtype=np.int64)
    pending = np.arange(ne)
    for turn in (3, 0, 1):  # right, straight, left — the general stitcher's
        # "smallest CCW rotation from the REVERSED arrival edge" works out
        # to right > straight > left on grid directions: diagonal squares
        # merge into one pinched ring, diagonal hole contacts stay separate
        if not len(pending):
            break
        cand = (ex[pending] * PACK + ey[pending]) * 4 + (dr[pending] + turn) % 4
        pos = np.searchsorted(skey, cand)
        ok = pos < ne
        ok[ok] = skey[pos[ok]] == cand[ok]
        succ[pending[ok]] = order[pos[ok]]
        pending = pending[~ok]
    if len(pending):  # unreachable for a valid cell set
        raise ValueError("_grid_outline: open boundary chain (invalid cell set)")
    # walk the cycles (plain int ops only — every per-ring reduction below
    # is a reduceat over the walk order, where rings are contiguous)
    visited = np.zeros(ne, dtype=bool)
    oe = np.empty(ne, dtype=np.int64)  # edges in walk order
    starts = [0]
    succl = succ.tolist()
    pos = 0
    for e0 in range(ne):
        if visited[e0]:
            continue
        e = e0
        while not visited[e]:
            visited[e] = True
            oe[pos] = e
            pos += 1
            e = succl[e]
        starts.append(pos)
    rs = np.array(starts[:-1], dtype=np.int64)
    re_ = np.array(starts[1:], dtype=np.int64)
    wsx, wsy, wd = sx[oe], sy[oe], dr[oe]
    # per-ring signed area straight from the directed edges (collinear
    # dropping never moves area); float64 like the reference shoelace
    cross = (wsx * (sy + _GRID_DY[dr])[oe] - (sx + _GRID_DX[dr])[oe] * wsy).astype(
        np.float64
    )
    sas = 0.5 * np.add.reduceat(cross, rs)
    # per-ring bbox (outer-ring prune for hole assignment)
    minx = np.minimum.reduceat(wsx, rs)
    miny = np.minimum.reduceat(wsy, rs)
    maxx = np.maximum.reduceat(wsx, rs)
    maxy = np.maximum.reduceat(wsy, rs)
    # vertex kept iff the direction changes there (cyclic within the ring)
    prev = np.empty(ne, dtype=np.int64)
    prev[1:] = wd[:-1]
    prev[rs] = wd[re_ - 1]
    keep = wd != prev
    gx = wsx[keep]
    gy = wsy[keep]
    ko = np.concatenate([[0], np.cumsum(np.add.reduceat(keep.astype(np.int64), rs))])
    gkey = gx * PACK + gy
    nr = len(rs)
    # canonical rotation of every ring in ONE gather: start at the lex-min
    # vertex (unique — a pinch revisit can never be the ring's minimum,
    # since the diagonal cell it joins contributes a smaller corner)
    lens = ko[1:] - ko[:-1]
    total = ko[-1]
    rid = np.repeat(np.arange(nr), lens)
    minval = np.minimum.reduceat(gkey, ko[:-1])
    rotpos = np.nonzero(gkey == minval[rid])[0]
    if len(rotpos) != nr:  # unreachable: min-vertex uniqueness argument
        raise ValueError("_grid_outline: non-unique ring minimum")
    off = np.arange(total) - ko[rid]
    gather = ko[rid] + (off + (rotpos[rid] - ko[rid])) % lens[rid]
    gxy = np.column_stack([gx[gather], gy[gather]]).astype(np.float64)
    rings: list = [gxy[ko[r]:ko[r + 1]] for r in range(nr)]
    # shells CCW / holes CW by construction; group holes into the smallest
    # containing shell (the general dissolve's rule), shells area-ascending
    from pygridmap_spark.core import geometry as GEO

    order2 = np.argsort(sas, kind="stable")
    outer_idx = [r for r in order2 if sas[r] > 0]
    hole_idx = [r for r in order2 if sas[r] < 0]
    polys = [[rings[r]] for r in outer_idx]
    if hole_idx:
        oi = np.array(outer_idx)
        for hr in hole_idx:
            h = rings[hr]
            px, py = h[0, 0], h[0, 1]
            # bbox prune before the containment scan: without it a
            # footprint with many tiny shells pays O(holes x shells) casts
            cand = np.nonzero(
                (minx[oi] <= px) & (miny[oi] <= py)
                & (maxx[oi] >= px) & (maxy[oi] >= py)
            )[0]
            hx, hy = np.asarray([px]), np.asarray([py])
            for ci in cand:  # area-ascending: tightest container wins
                if GEO.points_in_ring(hx, hy, polys[ci][0])[0]:
                    polys[ci].append(h)
                    break
            else:
                raise ValueError("_grid_outline: unplaced hole (invalid cell set)")
    # strict contract: dissolved signed area must equal the cell count
    if abs(float(sas.sum()) - k) > 1e-9 * max(k, 1.0):
        raise ValueError("_grid_outline: area diverged from the cell count")
    return polys


def _lift_ij_rings(mp: list, face: int, level: int) -> list:
    """Lift (i, j) integer-grid rings to lon/lat degrees through st→uv +
    the gnomonic face chart — ONE vectorized pass over every vertex of
    every ring (tiny per-ring arrays are pure numpy overhead)."""
    n = float(1 << level)
    flat = [ring for rings in mp for ring in rings]
    if not flat:
        return []
    allv = np.vstack(flat)
    u = _np_st_to_uv(allv[:, 0] / n)
    v = _np_st_to_uv(allv[:, 1] / n)
    x, y, z = _np_face_uv_to_xyz(np.full(len(allv), face, dtype=np.int64), u, v)
    r = np.sqrt(x * x + y * y + z * z)
    lonlat = np.column_stack(
        [np.degrees(np.arctan2(y, x)), np.degrees(np.arcsin(z / r))]
    )
    bounds = np.cumsum([0] + [len(rg) for rg in flat])
    out, pos = [], 0
    for rings in mp:
        lifted = []
        for _ in rings:
            lifted.append(lonlat[bounds[pos]:bounds[pos + 1]])
            pos += 1
        out.append(lifted)
    return out


def cells_to_wkb(
    df: DataFrame,
    level: int,
    group_cols: tuple = ("poly_id",),
    face: str = "s2_face",
    i: str = "s2_i",
    j: str = "s2_j",
    out_col: str = "wkb",
) -> DataFrame:
    """Distributed cells→vector dissolve: one geodesic WKB multipolygon
    per (group..., face) from that group's level-``level`` cells —
    completing the vector↔cell round trip (:func:`polyfill` is the other
    direction; reference counterpart: the gridding notebooks' dissolve of
    selected grid cells back to a boundary, base.py:504-516 via GEOS).

    Plan: ONE hash exchange on (group..., face) through
    ``util.grouped_rows_sorted`` (per-BATCH Arrow fee, not per-group — a
    lake-scale layer has millions of small groups), then the exact
    in-group kernel (:func:`py_cells_to_multipolygon`). Output rows carry
    ``n_polys``/``n_vertices`` so rollups don't need to decode the WKB.
    Cross-face groups emit one row per face; the two face outlines share
    their cube-edge arcs exactly on the sphere (the charts agree there),
    so even-odd containment over the row set equals containment in the
    cell union."""
    _check_level(level)
    from pygridmap_spark import util as _util
    from pygridmap_spark.core import wkb as WKB

    keys = [*group_cols, face]
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.select(*keys).schema.fields
    )
    schema += f", {out_col} binary, n_polys int, n_vertices int"

    def _reduce(sub):
        mp = py_cells_to_multipolygon(
            int(sub[face].iloc[0]), sub[i].to_numpy(), sub[j].to_numpy(), level
        )
        row = {k: sub[k].iloc[0] for k in keys}
        row[out_col] = WKB.encode_multipolygon(mp)
        row["n_polys"] = len(mp)
        row["n_vertices"] = int(sum(len(r) for rings in mp for r in rings))
        return row

    # pin_partitions=False: the dissolve kernel's cost is ~O(cells) per
    # group and a cell is a fixed-width (i, j) row, so exchanged BYTES
    # proxy the kernel cost — AQE's byte-based coalescing sizes this
    # exchange correctly (a bench-scale layer runs as one task instead of
    # paying the per-task Python fee across the full shuffle width; a
    # lake-scale layer still splits by size). Measured: the pinned form
    # cost this operator ~0.4 s at sf0.1 (0.75 -> 1.15 interleaved A/B).
    return _util.grouped_rows_sorted(
        df.select(*keys, i, j), keys, _reduce, schema, pin_partitions=False
    )


# --- polyfill (S2 region covering at a fixed level) --------------------------

_PF_MAX_SPAN = 4096  # candidates per range row (bounds per-task PIP work)
_PF_PIP_SLAB = 32768  # points per winding call ((P x 3) temporaries per edge)


def polyfill(
    polys: DataFrame,
    level: int,
    wkb_col: str = "wkb",
    id_col: str = "poly_id",
    prefix: str = "s2_",
    candidates_partitions: int | None = None,
    max_span: int = _PF_MAX_SPAN,
    classify: bool = False,
) -> DataFrame:
    """All level-``level`` S2 cells whose CENTER lies inside each geodesic
    (multi)polygon — H3 ``polygonToCells`` semantics on the sphere, the
    spherical twin of ``hexgrid.polyfill``.

    With ``classify=True`` the output instead carries every cell whose
    closed circumball can touch the polygon, labeled by an extra
    ``{prefix}interior`` boolean: ``true`` means the whole cell is
    PROVABLY inside (center inside and the boundary farther than the
    cell's circumradius — min great-circle arc distance vs. the max
    center-to-corner angle, both exact), ``false`` means the cell may
    straddle the boundary (its center can be inside or outside). The
    interior/boundary split is what makes an EXACT point-in-polygon join
    scale: points landing in interior cells are inside by the equi-join
    alone; only boundary-cell points pay a per-point winding refine
    (see operators.pip_sphere.point_in_polygon_s2).

    Polygons are WKB in lon/lat degrees; edges are great-circle arcs
    (< 180 deg), rings even-odd (holes), each polygon bounded by an open
    hemisphere (core/sphere.py's winding-number domain). The plan mirrors
    the hex polyfill's scale shape:

    1. an Arrow kernel computes each polygon's bounding cap (vertex-mean
       center, max-vertex + half-max-edge radius — provably encloses the
       boundary, and the interior for hemisphere-bounded rings), picks the
       cover level from the same pinned st-gradient bound the geodesic
       kNN/radius join rely on, and emits the <= 9 cube-wrap cover cells'
       DESCENDANT ij ranges at the target level as chunked rows
       (<= ``max_span`` candidates each); caps too wide for any cover
       level fall back to whole-sphere ranges;
    2. the range rows equi-join the polygon WKB on ``id_col`` (one copy
       per <= ``max_span`` candidates, never per cell);
    3. a second Arrow kernel expands ranges to cell centers (quadratic
       st -> uv -> unit xyz), pre-filters by the cap chord, and runs the
       tangent-plane winding ray cast slab-sized
       (core/sphere.points_in_spherical_polygon).

    ``candidates_partitions`` round-robins the chunked range rows (an
    O(cells/max_span) tiny exchange) so one continent-sized polygon's
    work spreads across tasks — same knob, same reasoning, same pinned
    identity guarantee as the hex polyfill. It is the MEGA-polygon knob
    only: on a layer of many small zones the extra exchange plus the
    de-co-partitioned WKB join costs ~8x (measured, 10k 12-gon zones at
    level 9: 11 s default vs 81 s at 256) — leave it None unless one
    polygon's cover dwarfs the rest.

    Returns (id_col, {prefix}face, {prefix}i, {prefix}j,
    {prefix}compact). Reference parity: pygridmap covers polygons with
    planar rect cells (gridding.grid_maker); this is the spherical cell
    family the north star's "H3/S2 cells" implies.
    """
    _check_level(level)
    n = 1 << level
    id_field = f"{id_col} {dict(polys.dtypes)[id_col]}"
    ranges_schema = (
        f"{id_field}, _f int, _i long, _jlo long, _jhi long, "
        "_cx double, _cy double, _cz double, _cm double"
    )

    def _ranges(batches):
        import pandas as pd

        from pygridmap_spark.core import sphere as SPH
        from pygridmap_spark.core import wkb as WKB

        def _emit(rows, pid, f, i, jlo, jhi, cap):
            # chunk j spans at max_span
            nch = (jhi - jlo) // max_span + 1
            i2 = np.repeat(i, nch)
            f2 = np.repeat(f, nch)
            idx = np.arange(int(nch.sum())) - np.repeat(np.cumsum(nch) - nch, nch)
            lo = np.repeat(jlo, nch) + idx * max_span
            hi = np.minimum(lo + max_span - 1, np.repeat(jhi, nch))
            m = len(lo)
            rows.append(
                pd.DataFrame(
                    {
                        id_col: np.repeat(np.asarray(pid), m),
                        "_f": f2.astype(np.int32),
                        "_i": i2,
                        "_jlo": lo,
                        "_jhi": hi,
                        "_cx": np.full(m, cap[0]),
                        "_cy": np.full(m, cap[1]),
                        "_cz": np.full(m, cap[2]),
                        "_cm": np.full(m, cap[3]),
                    }
                )
            )

        for pdf in batches:
            rows: list = []
            for pid, buf in zip(pdf[id_col], pdf[wkb_col]):
                if buf is None:
                    continue
                mp = WKB.decode_multipolygon(bytes(buf))
                rings = [r for poly in mp for r in poly if len(r) >= 3]
                if not rings:
                    continue
                c, theta = SPH.bounding_cap(rings)
                pad = min(theta * (1.0 + 1e-12) + 1e-15, np.pi)
                _check_cap(pad, "polyfill")
                cap = (c[0], c[1], c[2], 2.0 * np.sin(pad / 2.0))
                lc = (
                    int(np.floor(-np.log2(pad * ST_GRAD_BOUND)))
                    if pad * ST_GRAD_BOUND < 1.0
                    else 0
                )
                lcov = min(lc, level)
                if lcov < 1:
                    # whole sphere: every face, every i row, full j span
                    ii = np.tile(np.arange(n, dtype=np.int64), 6)
                    ff = np.repeat(np.arange(6, dtype=np.int64), n)
                    _emit(
                        rows, pid, ff, ii,
                        np.zeros(len(ii), np.int64),
                        np.full(len(ii), n - 1, np.int64),
                        cap,
                    )
                    continue
                # cap-center cell at the cover level + cube-wrap neighbors
                clon = np.degrees(np.arctan2(c[1], c[0]))
                clat = np.degrees(np.arcsin(np.clip(c[2], -1.0, 1.0)))
                idx0 = py_s2_index(np.array([clon]), np.array([clat]), lcov)
                f0, i0, j0 = idx0["face"], idx0["i"], idx0["j"]
                _, fn, in_, jn = py_s2_neighbors_ij(f0, i0, j0, lcov)
                cf = np.concatenate([f0, fn])
                ci = np.concatenate([i0, in_])
                cj = np.concatenate([j0, jn])
                s = level - lcov
                w = np.int64(1 << s)
                # descendant rect of each cover cell: per-i rows
                ii = (ci[:, None] << s) + np.arange(w, dtype=np.int64)[None, :]
                ff = np.repeat(cf, w)
                jlo = np.repeat(cj << s, w)
                _emit(
                    rows, pid, ff, ii.ravel(), jlo, jlo + w - 1, cap
                )
            if rows:
                yield pd.concat(rows, ignore_index=True)

    ranges = polys.select(id_col, wkb_col).mapInPandas(_ranges, ranges_schema)
    if candidates_partitions:
        ranges = ranges.repartition(int(candidates_partitions))
    joined = ranges.join(polys.select(id_col, wkb_col), id_col)

    out_schema = (
        f"{id_field}, {prefix}face int, {prefix}i long, {prefix}j long, "
        f"{prefix}compact long"
    )

    def _containment(batches):
        import pandas as pd

        from pygridmap_spark.core import sphere as SPH
        from pygridmap_spark.core import wkb as WKB

        inv_n = 1.0 / float(n)
        for pdf in batches:
            if not len(pdf):
                continue
            parts = []
            for pid, g in pdf.groupby(id_col, sort=False):
                buf = g[wkb_col].iloc[0]
                if buf is None:
                    continue
                mp = WKB.decode_multipolygon(bytes(buf))
                rings = [r for poly in mp for r in poly if len(r) >= 3]
                if not rings:
                    continue
                rxyz = [SPH.ring_to_xyz(r) for r in rings]
                f, i, j, x, y, z = _np_expand_group(g, inv_n)
                total = len(f)
                # cap-chord prefilter (the cap provably contains the
                # polygon, so dropped centers cannot be inside)
                cx = g["_cx"].iloc[0]
                cy = g["_cy"].iloc[0]
                cz = g["_cz"].iloc[0]
                cm = g["_cm"].iloc[0]
                dx, dy, dz = x - cx, y - cy, z - cz
                near = dx * dx + dy * dy + dz * dz <= cm * cm
                if not near.any():
                    continue
                f, i, j = f[near], i[near], j[near]
                p = np.column_stack([x[near], y[near], z[near]])
                m = len(p)
                inside = np.zeros(m, dtype=bool)
                for st in range(0, m, _PF_PIP_SLAB):
                    en = min(st + _PF_PIP_SLAB, m)
                    acc = np.zeros(en - st, dtype=bool)
                    for rx in rxyz:
                        acc ^= SPH.points_in_spherical_ring(p[st:en], rx)
                    inside[st:en] = acc
                if not inside.any():
                    continue
                f, i, j = f[inside], i[inside], j[inside]
                parts.append(
                    pd.DataFrame(
                        {
                            id_col: np.repeat(g[id_col].to_numpy()[:1], len(i)),
                            f"{prefix}face": f.astype(np.int32),
                            f"{prefix}i": i,
                            f"{prefix}j": j,
                            f"{prefix}compact": (
                                f.astype(np.int64) << np.int64(2 * level)
                            ) + _np_hilbert_d(i, j, level),
                        }
                    )
                )
            if parts:
                yield pd.concat(parts, ignore_index=True)

    if not classify:
        return joined.mapInPandas(_containment, out_schema)

    cls_schema = out_schema + f", {prefix}interior boolean"

    def _containment_classify(batches):
        import pandas as pd

        from pygridmap_spark.core import sphere as SPH
        from pygridmap_spark.core import wkb as WKB

        inv_n = 1.0 / float(n)
        for pdf in batches:
            if not len(pdf):
                continue
            parts = []
            for pid, g in pdf.groupby(id_col, sort=False):
                buf = g[wkb_col].iloc[0]
                if buf is None:
                    continue
                mp = WKB.decode_multipolygon(bytes(buf))
                rings = [r for poly in mp for r in poly if len(r) >= 3]
                if not rings:
                    continue
                rxyz = [SPH.ring_to_xyz(r) for r in rings]
                f, i, j, x, y, z = _np_expand_group(g, inv_n)
                total = len(f)
                # exact per-cell circumradius: max center->corner angle
                # (quadratic st is monotone, so corners realize the max),
                # slab-sized like the ray cast
                m = total
                rcell = np.empty(m)
                for st0 in range(0, m, _PF_PIP_SLAB):
                    en = min(st0 + _PF_PIP_SLAB, m)
                    rcell[st0:en] = _np_cell_circumradius(
                        f[st0:en], i[st0:en], j[st0:en], inv_n,
                        x[st0:en], y[st0:en], z[st0:en],
                    )
                # cap-chord prefilter padded per cell by the circumball
                # chord (chord is subadditive, so cap+circumball is safe)
                cxc = g["_cx"].iloc[0]
                cyc = g["_cy"].iloc[0]
                czc = g["_cz"].iloc[0]
                cm = g["_cm"].iloc[0]
                dx, dy, dz = x - cxc, y - cyc, z - czc
                near = np.sqrt(dx * dx + dy * dy + dz * dz) <= cm + 2.0 * np.sin(
                    rcell / 2.0
                )
                if not near.any():
                    continue
                f, i, j, rcell = f[near], i[near], j[near], rcell[near]
                p = np.column_stack([x[near], y[near], z[near]])
                m = len(p)
                inside = np.zeros(m, dtype=bool)
                mind = np.empty(m)
                for st0 in range(0, m, _PF_PIP_SLAB):
                    en = min(st0 + _PF_PIP_SLAB, m)
                    acc = np.zeros(en - st0, dtype=bool)
                    dmin = np.full(en - st0, np.pi)
                    for rx in rxyz:
                        acc ^= SPH.points_in_spherical_ring(p[st0:en], rx)
                        np.minimum(dmin, SPH.min_arc_dist(p[st0:en], rx), out=dmin)
                    inside[st0:en] = acc
                    mind[st0:en] = dmin
                # err toward "boundary": a misclassified boundary cell is
                # refined exactly downstream, a misclassified interior
                # cell would skip the refine — so the margin must only
                # ever widen the boundary class
                boundary = mind <= rcell * (1.0 + 1e-9) + 1e-12
                keep = inside | boundary
                if not keep.any():
                    continue
                f, i, j = f[keep], i[keep], j[keep]
                interior = inside[keep] & ~boundary[keep]
                parts.append(
                    pd.DataFrame(
                        {
                            id_col: np.repeat(g[id_col].to_numpy()[:1], len(i)),
                            f"{prefix}face": f.astype(np.int32),
                            f"{prefix}i": i,
                            f"{prefix}j": j,
                            f"{prefix}compact": (
                                f.astype(np.int64) << np.int64(2 * level)
                            ) + _np_hilbert_d(i, j, level),
                            f"{prefix}interior": interior,
                        }
                    )
                )
            if parts:
                yield pd.concat(parts, ignore_index=True)

    return joined.mapInPandas(_containment_classify, cls_schema)


# --- cell-set compaction (the H3 compactCells / S2 CellUnion.Normalize
#     analog) -----------------------------------------------------------------


def compact_cells(
    cells: DataFrame,
    level: int,
    min_level: int = 0,
    compact_col: str = "compact",
) -> DataFrame:
    """Compact a set of level-``level`` cells: replace every COMPLETE
    sibling subtree by its ancestor, as coarsely as possible. Returns
    ``(level, compact)`` rows — the minimal mixed-level cover of exactly
    the input set (``uncompact_cells`` is the exact inverse; the
    round-trip is property-tested).

    Non-iterative formulation (no 30-round loop): with all inputs at one
    level, the level-``a`` ancestor of a cell is complete iff EXACTLY
    ``4^(level-a)`` distinct input cells share it — and completeness is
    monotone (a full subtree has full child subtrees), so each cell's
    answer is its COARSEST complete ancestor. That is: one explode by
    the (level - min_level + 1) candidate levels, one count per
    ancestor, one semi-join back, one min per cell — four bounded
    shuffles on the CELL set, zero driver-side rounds, no
    localCheckpoint chain. ``min_level`` bounds the explode (and how
    coarse the output may get); the default 0 allows whole-face fusion.

    Input cells must be distinct and level-homogeneous (enforced with
    ``.distinct()``; mixed-level inputs need uncompact-to-max first).
    """
    if not 0 <= min_level <= level:
        raise ValueError("need 0 <= min_level <= level")
    src = cells.select(F.col(compact_col).alias("__c__")).distinct()
    anc = F.array(
        *[
            F.struct(
                F.lit(a).alias("lvl"),
                F.shiftright(F.col("__c__"), 2 * (level - a)).alias("anc"),
            )
            for a in range(min_level, level + 1)
        ]
    )
    cand = src.select("__c__", F.explode(anc).alias("p")).select(
        "__c__", F.col("p.lvl").alias("lvl"), F.col("p.anc").alias("anc")
    )
    full = F.lit(None).cast("long")
    for a in range(min_level, level + 1):
        full = F.when(F.col("lvl") == a, F.lit(1 << (2 * (level - a)))).otherwise(full)
    complete = (
        cand.groupBy("lvl", "anc")
        .agg(F.count(F.lit(1)).alias("__n__"))
        .filter(F.col("__n__") == full)
        .select("lvl", "anc")
    )
    best = (
        cand.join(complete, ["lvl", "anc"])
        .groupBy("__c__")
        .agg(F.min("lvl").alias("level"))
    )
    # variable shift as a bounded CASE chain (the shiftright wrapper takes
    # only literal amounts; the level domain is <= 31 branches)
    anc_at = F.lit(None).cast("long")
    for a in range(min_level, level + 1):
        anc_at = F.when(
            F.col("level") == a, F.shiftright(F.col("__c__"), 2 * (level - a))
        ).otherwise(anc_at)
    out = best.select("level", anc_at.alias(compact_col))
    return out.distinct()


def uncompact_cells(
    df: DataFrame,
    level: int,
    level_col: str = "level",
    compact_col: str = "compact",
) -> DataFrame:
    """Expand a mixed-level ``(level, compact)`` cell set to uniform
    ``level``: each cell explodes to its ``4^(level - cell_level)``
    descendants (``(compact << 2d) + k``). Pure Catalyst sequence/explode;
    the fan-out is the caller's contract (a level-0 face at level 15 is a
    billion rows — uncompact at the level you mean to join at)."""
    n = F.lit(None).cast("long")
    base = F.lit(None).cast("long")
    for a in range(0, level + 1):
        d = level - a
        n = F.when(F.col(level_col) == a, F.lit(1 << (2 * d)).cast("long")).otherwise(n)
        base = F.when(
            F.col(level_col) == a, F.shiftleft(F.col(compact_col), 2 * d)
        ).otherwise(base)
    return (
        df.select(
            base.alias("__b__"),
            F.explode(F.sequence(F.lit(0).cast("long"), n - 1)).alias("__k__"),
        )
        .select((F.col("__b__") + F.col("__k__")).alias(compact_col))
    )
