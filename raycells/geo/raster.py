"""Raster ↔ vector kernels: rasterize (polygon → cell mask) and vectorize
(cell regions → boundary rings). Per-tile, vectorized numpy; run inside
``map_batches`` stages (one tile per row).

Rasterize uses center-sample scanline semantics: a cell is set iff its
center is inside the polygon (the even-odd rule from
:mod:`raycells.geo.pip`). Vectorize extracts 4-connected regions of
equal-valued (and valid) cells and traces each region's outer boundary as
a closed ring in cell-edge coordinates, so
``rasterize(vectorize(tile)) == tile`` for each region (round-trip test).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from raycells.geo.pip import points_in_polygon

__all__ = ["rasterize", "vectorize", "connected_components"]


def rasterize(
    ring: np.ndarray,
    extent: Tuple[float, float, float, float],
    shape: Tuple[int, int],
) -> np.ndarray:
    """Polygon ring → bool mask of ``shape`` (rows, cols) over ``extent``
    (minx, miny, maxx, maxy). Row 0 is the MINY edge (south-up, matching
    the tile payload order). Cell centers are sampled."""
    rows, cols = shape
    minx, miny, maxx, maxy = extent
    xs = minx + (np.arange(cols) + 0.5) * (maxx - minx) / cols
    ys = miny + (np.arange(rows) + 0.5) * (maxy - miny) / rows
    gx, gy = np.meshgrid(xs, ys)
    inside = points_in_polygon(gx.ravel(), gy.ravel(), ring)
    return inside.reshape(rows, cols)


def connected_components(mask: np.ndarray) -> Tuple[np.ndarray, int]:
    """4-connected component labelling of a bool mask (two-pass union-find,
    vectorized row merging). Returns (labels int32 (rows, cols), n_labels);
    0 = background."""
    rows, cols = mask.shape
    labels = np.zeros((rows, cols), dtype=np.int32)
    parent = [0]  # union-find; parent[0] unused

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    next_label = 1
    for r in range(rows):
        row = mask[r]
        if not row.any():
            continue
        # segment the row into runs of True
        padded = np.concatenate([[False], row, [False]])
        starts = np.nonzero(~padded[:-1] & padded[1:])[0]
        ends = np.nonzero(padded[:-1] & ~padded[1:])[0]
        for s, e in zip(starts, ends):
            # labels of the row above overlapping this run
            if r > 0:
                above = labels[r - 1, s:e]
                hits = np.unique(above[above > 0])
            else:
                hits = np.empty(0, dtype=np.int32)
            if hits.size == 0:
                lab = next_label
                parent.append(lab)
                next_label += 1
            else:
                roots = [find(int(h)) for h in hits]
                lab = min(roots)
                for rt in roots:
                    parent[rt] = lab
            labels[r, s:e] = lab
    # flatten unions
    remap = np.zeros(next_label, dtype=np.int32)
    out_n = 0
    for lab in range(1, next_label):
        root = find(lab)
        if remap[root] == 0:
            out_n += 1
            remap[root] = out_n
        remap[lab] = remap[root]
    return remap[labels], out_n


def _trace_boundary(region: np.ndarray) -> np.ndarray:
    """Outer boundary ring of a 4-connected region mask, in cell-edge
    coordinates (col, row), counter-clockwise, closed (first == last).

    Walks the edge graph: collect all boundary edges (cell edges adjacent
    to outside), then chain them. Vectorized edge collection; the chaining
    loop is O(perimeter)."""
    rows, cols = region.shape
    pad = np.zeros((rows + 2, cols + 2), dtype=bool)
    pad[1:-1, 1:-1] = region
    # start vertex -> LIST of end vertices, oriented so the region is on
    # the left. A vertex where the outer ring touches a hole ring
    # diagonally (a saddle) has TWO outgoing edges — a plain dict would
    # drop one and cross-link the cycles into a non-terminating walk.
    edges: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}

    def add(a, b):
        edges.setdefault(a, []).append(b)

    # horizontal edges: between (r-1, c) above and (r, c)
    up_diff = pad[1:, 1:-1] & ~pad[:-1, 1:-1]  # cell filled, above empty → top edge
    rr, cc = np.nonzero(up_diff)
    for r, c in zip(rr, cc):  # top edge: keep region left → left-to-right
        add((c, r), (c + 1, r))
    # bottom edges: filled cell is (rr-1, cc), the edge lies at y = rr
    down_diff = pad[:-1, 1:-1] & ~pad[1:, 1:-1]
    rr, cc = np.nonzero(down_diff)
    for r, c in zip(rr, cc):
        add((c + 1, r), (c, r))
    left_diff = pad[1:-1, 1:] & ~pad[1:-1, :-1]  # cell filled, left empty → left edge
    rr, cc = np.nonzero(left_diff)
    for r, c in zip(rr, cc):
        add((c, r + 1), (c, r))
    # right edges: filled cell is (rr, cc-1), the edge lies at x = cc
    right_diff = pad[1:-1, :-1] & ~pad[1:-1, 1:]
    rr, cc = np.nonzero(right_diff)
    for r, c in zip(rr, cc):
        add((c, r), (c, r + 1))

    if not edges:
        return np.empty((0, 2), dtype=np.int64)
    # chain cycles, consuming each edge exactly once (terminates by
    # construction); at a saddle vertex pick the outgoing edge whose
    # turn has positive cross product vs the incoming direction — that
    # keeps the outer ring and the hole ring as separate cycles. The
    # outer ring is the longest chain.
    best: List[Tuple[int, int]] = []
    for start in sorted(edges):
        while edges.get(start):
            chain = [start]
            prev = None
            cur = start
            while True:
                outs = edges.get(cur)
                if not outs:
                    break  # open chain: only possible on malformed input
                if len(outs) == 1 or prev is None:
                    nxt = outs.pop(0)
                else:
                    din = (cur[0] - prev[0], cur[1] - prev[1])
                    pick = 0
                    for j, cand in enumerate(outs):
                        dout = (cand[0] - cur[0], cand[1] - cur[1])
                        if din[0] * dout[1] - din[1] * dout[0] > 0:
                            pick = j
                            break
                    nxt = outs.pop(pick)
                if not outs:
                    edges.pop(cur, None)
                chain.append(nxt)
                if nxt == start:
                    break
                prev, cur = cur, nxt
            if len(chain) > len(best):
                best = chain
    return np.asarray(best, dtype=np.int64)


def vectorize(values: np.ndarray, mask: np.ndarray = None) -> List[Dict]:
    """Cells → vector regions. 4-connected regions of equal value (invalid
    cells are background). Returns one dict per region: ``value``,
    ``cell_count``, ``bbox`` (col0, row0, col1, row1 inclusive), ``ring``
    (boundary in cell-edge coords, closed)."""
    vals = np.asarray(values)
    if mask is None:
        mask = np.ones(vals.shape, dtype=bool)
    out: List[Dict] = []
    for v in np.unique(vals[mask]):
        vm = (vals == v) & mask
        labels, n = connected_components(vm)
        for lab in range(1, n + 1):
            region = labels == lab
            rr, cc = np.nonzero(region)
            out.append(
                {
                    "value": v.item() if hasattr(v, "item") else v,
                    "cell_count": int(region.sum()),
                    "bbox": (int(cc.min()), int(rr.min()), int(cc.max()), int(rr.max())),
                    "ring": _trace_boundary(region),
                }
            )
    return out
