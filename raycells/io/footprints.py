"""Synthetic vector footprint polygons (spatial-join small side).

~200 deterministic polygons (FIXTURES.md §3): tiny sub-tile ones,
tile-sized ones, and large multi-cell ones; several concentrated in the
dense city boxes; degenerate cases included (polygon containing no tile,
tiles containing whole polygons). Closed simple CCW rings, 4–12 vertices.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raycells.io.tilestore import CITY_CENTERS

RING_TYPE = pa.list_(pa.struct([("x", pa.float64()), ("y", pa.float64())]))
SCHEMA = pa.schema(
    [("footprint_id", pa.string()), ("ring", RING_TYPE), ("category", pa.string())]
)

CATEGORIES = ("park", "industrial", "residential", "water")


def _convex_ring(rng: np.random.Generator, cx: float, cy: float, radius: float):
    """Simple CCW polygon: sorted random angles around a center."""
    n = int(rng.integers(4, 13))
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    r = radius * rng.uniform(0.5, 1.0, n)
    xs = cx + r * np.cos(ang)
    ys = np.clip(cy + r * np.sin(ang), -89.9, 89.9)
    return np.stack([xs, ys], axis=1)


def generate_footprints(n: int = 200, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    ids, rings, cats = [], [], []
    for i in range(n):
        kind = i % 4
        if kind < 2:  # concentrated in the dense city boxes
            cx, cy = CITY_CENTERS[i % 3]
            cx += rng.uniform(-1, 1)
            cy += rng.uniform(-1, 1)
        else:  # global
            cx = rng.uniform(-179, 179)
            cy = rng.uniform(-84, 84)
        if i % 5 == 0:
            radius = 0.002  # tiny: smaller than one tile
        elif i % 5 in (1, 2):
            radius = 0.05  # tile-sized
        else:
            radius = rng.uniform(0.5, 3.0)  # large: covers many cells
        ring = _convex_ring(rng, cx, cy, radius)
        ids.append(f"fp-{i:05d}")
        rings.append([{"x": float(x), "y": float(y)} for x, y in ring])
        cats.append(CATEGORIES[i % len(CATEGORIES)])
    return pa.table({"footprint_id": ids, "ring": rings, "category": cats}, schema=SCHEMA)


def rings_as_numpy(tbl: pa.Table):
    """→ list of (V, 2) float64 arrays plus ids/categories (broadcast
    form). Ring vertices come straight out of the Arrow list buffers —
    ONE flat x/y copy for the whole table via the list offsets, sliced
    per polygon — instead of a per-row ``to_pylist`` rebuild of every
    vertex dict (VERDICT r4 #7)."""
    ring_col = tbl["ring"]
    if isinstance(ring_col, pa.ChunkedArray):
        ring_col = ring_col.combine_chunks()
    vals = ring_col.values  # flat StructArray<x,y>
    offs = ring_col.offsets.to_numpy(zero_copy_only=False)
    flat = np.column_stack(
        [
            vals.field("x").to_numpy(zero_copy_only=False),
            vals.field("y").to_numpy(zero_copy_only=False),
        ]
    )
    fids = tbl["footprint_id"].to_pylist()
    cats = tbl["category"].to_pylist()
    return [
        (fid, cat, flat[offs[i] : offs[i + 1]])
        for i, (fid, cat) in enumerate(zip(fids, cats))
    ]


BBOX_PARQUET = "/tmp/raycells_docs/footprint_bboxes.parquet"
EDGES_PARQUET = "/tmp/raycells_docs/footprint_edges.parquet"


def ensure_edges_parquet(path: str = EDGES_PARQUET) -> str:
    """Write the footprint EDGE table once (idempotent, atomic): one row
    per directed ring edge (x1,y1)→(x2,y2), closing edge included —
    exactly the edge set :func:`raycells.geo.pip.points_in_polygon` ray-casts
    against. With the edges in a table, the even-odd rule IS
    SQL-expressible (sum of crossings % 2), so the exact PIP joins get
    DuckDB oracles, not just the bbox prefilter."""
    import os

    import pyarrow.parquet as pq

    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rows = rings_as_numpy(generate_footprints())
    fids, cats, x1s, y1s, x2s, y2s = [], [], [], [], [], []
    for fid, cat, ring in rows:
        nxt = np.roll(ring, -1, axis=0)
        for (x1, y1), (x2, y2) in zip(ring, nxt):
            fids.append(fid)
            cats.append(cat)
            x1s.append(float(x1))
            y1s.append(float(y1))
            x2s.append(float(x2))
            y2s.append(float(y2))
    tbl = pa.table(
        {
            "footprint_id": pa.array(fids, pa.string()),
            "category": pa.array(cats, pa.string()),
            "x1": pa.array(x1s, pa.float64()),
            "y1": pa.array(y1s, pa.float64()),
            "x2": pa.array(x2s, pa.float64()),
            "y2": pa.array(y2s, pa.float64()),
        }
    )
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path


def ensure_bbox_parquet(path: str = BBOX_PARQUET) -> str:
    """Write the footprint bounding-box table once (idempotent, atomic).
    The bboxes are what the SQL oracle joins against — rect-intersection
    range joins ARE SQL-expressible, unlike the exact PIP ring test."""
    import os

    import pyarrow.parquet as pq

    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rows = rings_as_numpy(generate_footprints())
    tbl = pa.table(
        {
            "footprint_id": pa.array([fid for fid, _, _ in rows], pa.string()),
            "category": pa.array([cat for _, cat, _ in rows], pa.string()),
            "minx": pa.array([float(r[:, 0].min()) for _, _, r in rows]),
            "miny": pa.array([float(r[:, 1].min()) for _, _, r in rows]),
            "maxx": pa.array([float(r[:, 0].max()) for _, _, r in rows]),
            "maxy": pa.array([float(r[:, 1].max()) for _, _, r in rows]),
        }
    )
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path
