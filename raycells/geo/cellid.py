"""Hierarchical 64-bit spatial cell IDs (S2-style), pure numpy.

No ``h3``/``s2sphere`` wheels exist in this environment, so this module
implements the published S2 cell-id *scheme* — a space-filling Hilbert
curve over a hierarchical quad subdivision, with the level encoded as a
trailing set bit so parent/child relations are bit operations — with TWO
projections behind one narrow API (encode / decode / parent / children /
neighbors / ring / grid containment):

- ``encode``/``decode``: equirectangular single face (lon×lat grid) —
  cheap, and what the kNN ring expansion assumes (a torus in x);
- ``encode_cube``/``decode_cube``: the TRUE cube-face S2 projection
  (SURVEY.md §7.4) — unit vector → dominant-axis face → gnomonic (u,v)
  → quadratic st → per-face Hilbert, packed exactly like S2CellId
  (face in bits 61-63). Area distortion is bounded (≤ ~2.1× edge/center
  per face) instead of the equirectangular pole blow-up. Oracle-checked
  distributed via q_cell_agg_s2face (every float expression mirrored
  token-for-token in SQL; numpy and DuckDB bind libm bit-identically).

ID layout (level L ∈ [0, MAX_LEVEL=30]):

    id = (hilbert_pos_at_L << (2*(30-L)+1)) | (1 << (2*(30-L)))

i.e. the Hilbert position occupies the high bits and the lowest set bit
marks the level — identical mechanics to S2CellId. Total ≤ 61 bits.

Everything is vectorized over numpy uint64 arrays; the Hilbert transform
is the standard iterative rotate-and-accumulate, 1 pass per level.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

MAX_LEVEL = 30

__all__ = [
    "MAX_LEVEL",
    "encode",
    "decode",
    "level_of",
    "parent",
    "children",
    "neighbors",
    "ring",
    "lonlat_to_xy",
    "xy_to_lonlat",
    "xy2d",
    "d2xy",
    "grid_cell",
    "GRID_RES",
    "GRID_NX",
    "encode_cube",
    "decode_cube",
    "encode_with_projection",
]


# ---------------------------------------------------------------------------
# Hilbert curve (vectorized xy <-> d), standard algorithm
# ---------------------------------------------------------------------------

def xy2d(level: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Hilbert distance of grid coords on a 2^level × 2^level grid."""
    x = np.asarray(x, dtype=np.uint64).copy()
    y = np.asarray(y, dtype=np.uint64).copy()
    d = np.zeros_like(x)
    if level == 0:
        return d
    n = np.uint64(1) << np.uint64(level)
    s = np.uint64(1) << np.uint64(level - 1)
    one = np.uint64(1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate quadrant (canonical rot() uses the full grid size n here)
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, n - one - x, x)
        y_f = np.where(flip, n - one - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= one
    return d


def d2xy(level: int, d: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Inverse Hilbert: distance → grid coords."""
    d = np.asarray(d, dtype=np.uint64).copy()
    x = np.zeros_like(d)
    y = np.zeros_like(d)
    t = d
    s = np.uint64(1)
    one = np.uint64(1)
    n = np.uint64(1) << np.uint64(level)
    while s < n:
        rx = (t // np.uint64(2)) & one
        ry = (t ^ rx) & one
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - one - x, x)
        y_f = np.where(flip, s - one - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        x += s * rx
        y += s * ry
        t //= np.uint64(4)
        s <<= one
    return x, y


# ---------------------------------------------------------------------------
# lon/lat <-> grid coords
# ---------------------------------------------------------------------------

def lonlat_to_xy(level: int, lon: np.ndarray, lat: np.ndarray):
    n = 1 << level
    x = np.floor((np.asarray(lon) + 180.0) / 360.0 * n).astype(np.int64)
    y = np.floor((np.asarray(lat) + 90.0) / 180.0 * n).astype(np.int64)
    return np.clip(x, 0, n - 1).astype(np.uint64), np.clip(y, 0, n - 1).astype(np.uint64)


def xy_to_lonlat(level: int, x: np.ndarray, y: np.ndarray):
    """Center of cell (x, y) at ``level``."""
    n = 1 << level
    lon = (np.asarray(x, dtype=np.float64) + 0.5) / n * 360.0 - 180.0
    lat = (np.asarray(y, dtype=np.float64) + 0.5) / n * 180.0 - 90.0
    return lon, lat


# ---------------------------------------------------------------------------
# cell IDs
# ---------------------------------------------------------------------------

def _shift(level: int) -> np.uint64:
    return np.uint64(2 * (MAX_LEVEL - level))


def encode(lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
    """(lon, lat) → uint64 cell id at ``level``."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    x, y = lonlat_to_xy(level, lon, lat)
    d = xy2d(level, x, y)
    sh = _shift(level)
    return (d << (sh + np.uint64(1))) | (np.uint64(1) << sh)


def level_of(cell: np.ndarray) -> np.ndarray:
    """Level from the position of the lowest set bit."""
    cell = np.asarray(cell, dtype=np.uint64)
    lsb = cell & (~cell + np.uint64(1))
    # log2 of lsb via bit_length on float exponent — exact for powers of two
    p = np.frexp(lsb.astype(np.float64))[1] - 1  # lsb = 2^p
    return (MAX_LEVEL - p // 2).astype(np.int64) if hasattr(p, "astype") else MAX_LEVEL - p // 2


def decode(cell: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id → (lon, lat, level) of the cell center. All cells must share
    one level (vectorized paths assume homogeneous level per call)."""
    cell = np.asarray(cell, dtype=np.uint64)
    lev = level_of(cell)
    lev0 = int(np.min(lev)) if cell.size else MAX_LEVEL
    if cell.size and int(np.max(lev)) != lev0:
        raise ValueError("decode requires a homogeneous level per call")
    sh = _shift(lev0)
    d = cell >> (sh + np.uint64(1))
    x, y = d2xy(lev0, d)
    lon, lat = xy_to_lonlat(lev0, x, y)
    return lon, lat, np.full(cell.shape, lev0, dtype=np.int64)


def parent(cell: np.ndarray, steps: int = 1) -> np.ndarray:
    """Parent cell ``steps`` levels up (S2CellId::parent mechanics)."""
    cell = np.asarray(cell, dtype=np.uint64)
    for _ in range(steps):
        lsb = cell & (~cell + np.uint64(1))
        nl = lsb << np.uint64(2)
        cell = (cell & (~(nl - np.uint64(1)))) | nl
    return cell


def children(cell: int) -> np.ndarray:
    """The 4 children of one cell, one level down."""
    cell = np.uint64(cell)
    lsb = cell & (~cell + np.uint64(1))
    nl = lsb >> np.uint64(2)
    base = cell - lsb
    return np.array([base + nl * np.uint64(2 * i + 1) for i in range(4)], dtype=np.uint64)


def _xy_of(cell: np.ndarray, level: int):
    sh = _shift(level)
    d = np.asarray(cell, dtype=np.uint64) >> (sh + np.uint64(1))
    return d2xy(level, d)


def _cell_of_xy(x: np.ndarray, y: np.ndarray, level: int) -> np.ndarray:
    d = xy2d(level, x.astype(np.uint64), y.astype(np.uint64))
    sh = _shift(level)
    return (d << (sh + np.uint64(1))) | (np.uint64(1) << sh)


def ring(cell: int, k: int, level: int) -> np.ndarray:
    """All cells at Chebyshev grid distance exactly ``k`` (k=0 → the cell
    itself). Longitude wraps; latitude clamps at the poles (cells beyond
    the pole are dropped). This is the kNN ring-expansion primitive."""
    n = 1 << level
    x, y = _xy_of(np.array([cell], dtype=np.uint64), level)
    cx, cy = int(x[0]), int(y[0])
    if k == 0:
        return np.array([cell], dtype=np.uint64)
    xs, ys = [], []
    for dx in range(-k, k + 1):
        for dy in (-k, k):
            xs.append((cx + dx) % n)
            ys.append(cy + dy)
    for dy in range(-k + 1, k):
        for dx in (-k, k):
            xs.append((cx + dx) % n)
            ys.append(cy + dy)
    xs = np.array(xs, dtype=np.int64)
    ys = np.array(ys, dtype=np.int64)
    keep = (ys >= 0) & (ys < n)
    return _cell_of_xy(xs[keep].astype(np.uint64), ys[keep].astype(np.uint64), level)


def neighbors(cell: int, level: int) -> np.ndarray:
    """The 8 edge/corner neighbors (ring k=1)."""
    return ring(cell, 1, level)


# ---------------------------------------------------------------------------
# SQL-parity quantized grid (used by oracle-checked queries)
# ---------------------------------------------------------------------------

GRID_RES = 0.25  # degrees
GRID_NX = int(360 / GRID_RES)  # 1440


def grid_cell(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Flat quantized grid id — deliberately expressible in ANSI SQL:
    ``floor((lat+90)/0.25) * 1440 + floor((lon+180)/0.25)``.

    No clipping on EITHER axis, exactly like the SQL: lon=180 or lat=90
    produce the out-of-range-but-consistent edge cells (1440 / row 720)
    on both engines — a one-sided gx clip silently diverged from the
    oracle at the lon=180 domain edge."""
    gx = np.floor((np.asarray(lon) + 180.0) / GRID_RES).astype(np.int64)
    gy = np.floor((np.asarray(lat) + 90.0) / GRID_RES).astype(np.int64)
    return gy * GRID_NX + gx


# ---------------------------------------------------------------------------
# cube-face (true S2-style) projection backend — SURVEY §7.4's promised
# face projection. The equirectangular single-face grid above stays the
# default (the SQL oracles reproduce it); this backend fixes its polar
# distortion: cells project gnomonically onto 6 cube faces with the S2
# quadratic ST transform, so max/min cell ground-area ratio is bounded
# (~2.1) instead of unbounded at the poles. Published scheme only
# (s2geometry's s2coords tables, re-derived).
#
# ID layout (S2CellId mechanics): 3 face bits at the top, Hilbert
# position below, trailing set bit marks the level — parent()/children()
# /level_of() above work unchanged on cube ids.
# ---------------------------------------------------------------------------


def _lonlat_to_xyz(lon, lat):
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    cp = np.cos(phi)
    return cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)


def _xyz_to_face_uv(x, y, z):
    """S2 face layout: 0:+x 1:+y 2:+z 3:−x 4:−y 5:−z, with the published
    per-face (u, v) axes (s2coords FaceXYZtoUV)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
            [y / x, -x / y, -x / z, z / x, z / y, -y / z],
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
            [z / x, z / y, -y / z, y / x, -x / y, -x / z],
        )
    return face.astype(np.int64), u, v


def _face_uv_to_xyz(face, u, v):
    x = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [np.ones_like(u), -u, -u, -np.ones_like(u), v, v],
    )
    y = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [u, np.ones_like(u), -v, -v, -np.ones_like(u), u],
    )
    z = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [v, v, np.ones_like(u), -u, -u, -np.ones_like(u)],
    )
    return x, y, z


def _uv_to_st(u):
    """S2 quadratic projection: near-uniform cell areas across a face."""
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):  # np.where evaluates both branches;
        # the off-branch sqrt of a negative is discarded
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _st_to_uv(s):
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5, (4.0 * s * s - 1.0) / 3.0, (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0
    )


_FACE_SHIFT = np.uint64(61)


def encode_cube(lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
    """(lon, lat) → uint64 cube-face cell id at ``level``."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    face, u, v = _xyz_to_face_uv(*_lonlat_to_xyz(lon, lat))
    n = 1 << level
    i = np.clip(np.floor(_uv_to_st(u) * n).astype(np.int64), 0, n - 1).astype(np.uint64)
    j = np.clip(np.floor(_uv_to_st(v) * n).astype(np.int64), 0, n - 1).astype(np.uint64)
    d = xy2d(level, i, j)
    sh = _shift(level)
    return (
        (face.astype(np.uint64) << _FACE_SHIFT)
        | (d << (sh + np.uint64(1)))
        | (np.uint64(1) << sh)
    )


def decode_cube(cell: np.ndarray):
    """cube cell id → (lon, lat, level) of the cell center (homogeneous
    level per call, like :func:`decode`)."""
    cell = np.asarray(cell, dtype=np.uint64)
    face = (cell >> _FACE_SHIFT).astype(np.int64)
    pos = cell & ((np.uint64(1) << _FACE_SHIFT) - np.uint64(1))
    lev = level_of(pos)
    lev0 = int(np.min(lev)) if cell.size else MAX_LEVEL
    if cell.size and int(np.max(lev)) != lev0:
        raise ValueError("decode requires a homogeneous level per call")
    sh = _shift(lev0)
    d = pos >> (sh + np.uint64(1))
    i, j = d2xy(lev0, d)
    n = 1 << lev0
    u = _st_to_uv((i.astype(np.float64) + 0.5) / n)
    v = _st_to_uv((j.astype(np.float64) + 0.5) / n)
    x, y, z = _face_uv_to_xyz(face, u, v)
    r = np.sqrt(x * x + y * y + z * z)
    lat = np.degrees(np.arcsin(z / r))
    lon = np.degrees(np.arctan2(y, x))
    return lon, lat, np.full(cell.shape, lev0, dtype=np.int64)


def encode_with_projection(lon, lat, level: int, projection: str = "equirect"):
    """Narrow dispatch point (SURVEY §7.4): ``equirect`` is the default
    single-face grid every oracle reproduces; ``cube`` is the S2-style
    face projection for polar-safe partitioning keys."""
    if projection == "equirect":
        return encode(lon, lat, level)
    if projection == "cube":
        return encode_cube(lon, lat, level)
    raise ValueError(f"unknown projection: {projection!r}")

