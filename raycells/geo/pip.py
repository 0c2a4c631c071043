"""Vectorized point-in-polygon (ray casting) and polygon cell covers.

No shapely in this environment; the even-odd ray-casting rule is
implemented directly over numpy so one call tests a whole batch of tile
centroids against one polygon (or one point against many polygons).
Points exactly on a horizontal edge follow the standard half-open rule
(consistent, so join output rows are deterministic).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from raycells.geo import cellid

__all__ = ["points_in_polygon", "polygon_bbox", "polygon_cell_cover", "bbox_intersects"]


def points_in_polygon(
    px: np.ndarray, py: np.ndarray, ring: np.ndarray
) -> np.ndarray:
    """Even-odd ray cast of points (px, py) against one closed ring (V, 2).

    The ring may repeat its first vertex at the end or not; both work.
    Returns a bool array, True = inside.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    ring = np.asarray(ring, dtype=np.float64)
    if ring.shape[0] >= 2 and np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    x1, y1 = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)

    # edges straddling the horizontal line through each point (half-open)
    # shape: (n_points, n_edges)
    ycond = (y1[None, :] > py[:, None]) != (y2[None, :] > py[:, None])
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1[None, :] + (py[:, None] - y1[None, :]) / (y2 - y1)[None, :] * (
            x2 - x1
        )[None, :]
    crossings = ycond & (px[:, None] < xint)
    return crossings.sum(axis=1) % 2 == 1


def polygon_bbox(ring: np.ndarray) -> Tuple[float, float, float, float]:
    ring = np.asarray(ring, dtype=np.float64)
    return (
        float(ring[:, 0].min()),
        float(ring[:, 1].min()),
        float(ring[:, 0].max()),
        float(ring[:, 1].max()),
    )


def bbox_intersects(
    aminx, aminy, amaxx, amaxy, bminx, bminy, bmaxx, bmaxy
) -> np.ndarray:
    """Vectorized axis-aligned bbox overlap test (inclusive edges)."""
    return (
        (np.asarray(aminx) <= bmaxx)
        & (np.asarray(amaxx) >= bminx)
        & (np.asarray(aminy) <= bmaxy)
        & (np.asarray(amaxy) >= bminy)
    )


def polygon_cell_cover(ring: np.ndarray, level: int) -> np.ndarray:
    """All Hilbert cells at ``level`` whose bbox intersects the polygon's
    bbox AND whose center-or-overlap passes a coarse test. Used to
    co-partition large-large spatial joins (the prefilter; exact PIP runs
    per candidate pair afterwards)."""
    minx, miny, maxx, maxy = polygon_bbox(ring)
    n = 1 << level
    x0, y0 = cellid.lonlat_to_xy(level, np.array([minx]), np.array([miny]))
    x1, y1 = cellid.lonlat_to_xy(level, np.array([maxx]), np.array([maxy]))
    xs = np.arange(int(x0[0]), int(x1[0]) + 1, dtype=np.uint64)
    ys = np.arange(int(y0[0]), int(y1[0]) + 1, dtype=np.uint64)
    gx, gy = np.meshgrid(xs, ys)
    return cellid._cell_of_xy(gx.ravel(), gy.ravel(), level)
