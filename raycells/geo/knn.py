"""kNN tile lookup over the hierarchical cell index.

``KnnIndex`` holds per-cell tile lists (cell id at a fixed level →
contiguous slices of sorted arrays) built ONCE, then answers queries by
ring expansion: probe the query's cell, then rings k=1, 2, ... until the
k-th best distance is closed out by the ring's lower bound. This is the
state a ``map_batches`` actor pool holds (SURVEY.md §2.9): build in
``__init__``, query per batch.

Scale path: the index here stores only (lon, lat, key) per tile — ~24
bytes/tile. At 10^12-doc scale the index itself shards by parent cell:
route each query batch to the actor owning the query's coarse parent
cell (groupby(parent) → map_groups), same ring logic per shard. The
sandbox uses the broadcast single-index path.

Distances are great-circle-approximate equirectangular (good enough for
ranking at tile scale and matched exactly by the DuckDB oracle's formula).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from raycells.geo import cellid

__all__ = ["KnnIndex", "brute_force_knn", "euclid_deg"]


def euclid_deg(qlon, qlat, lon, lat) -> np.ndarray:
    """Plain euclidean distance in degrees (the oracle-matched metric)."""
    dx = np.asarray(lon) - np.asarray(qlon)
    dy = np.asarray(lat) - np.asarray(qlat)
    return np.sqrt(dx * dx + dy * dy)


def brute_force_knn(
    qlon: np.ndarray, qlat: np.ndarray, lon: np.ndarray, lat: np.ndarray, k: int
) -> Tuple[np.ndarray, np.ndarray]:
    """All-pairs exact kNN (the small-scale oracle): returns (indices,
    distances), each (n_queries, k), ties broken by index order."""
    d = euclid_deg(
        np.asarray(qlon)[:, None], np.asarray(qlat)[:, None], lon[None, :], lat[None, :]
    )
    k = min(k, d.shape[1])
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return idx, np.take_along_axis(d, idx, axis=1)


class KnnIndex:
    """Cell-bucketed kNN index over tile centroids.

    Build once (actor ``__init__``), query per batch. ``level`` trades
    bucket size vs ring count; level 7 (≈1.4°cells) suits the sandbox
    densities.
    """

    def __init__(self, lon: np.ndarray, lat: np.ndarray, keys: np.ndarray, level: int = 7):
        self.level = level
        self.lon = np.asarray(lon, dtype=np.float64)
        self.lat = np.asarray(lat, dtype=np.float64)
        self.keys = np.asarray(keys)
        cells = cellid.encode(self.lon, self.lat, level)
        order = np.argsort(cells, kind="stable")
        self.order = order
        self.sorted_cells = cells[order]
        # unique cells + slice starts for O(log n) bucket lookup
        self.uniq, self.starts = np.unique(self.sorted_cells, return_index=True)
        self.ends = np.append(self.starts[1:], len(self.sorted_cells))
        # cell edge in degrees (lat direction) for ring lower bounds
        self.cell_deg = 180.0 / (1 << level)

    def _bucket(self, cell: np.uint64) -> np.ndarray:
        j = np.searchsorted(self.uniq, cell)
        if j < len(self.uniq) and self.uniq[j] == cell:
            return self.order[self.starts[j]: self.ends[j]]
        return np.empty(0, dtype=np.int64)

    def query_one(self, qlon: float, qlat: float, k: int):
        home = cellid.encode(np.array([qlon]), np.array([qlat]), self.level)[0]
        cand = []
        r = 0
        max_r = (1 << self.level)  # full sweep worst case
        best_kth = np.inf
        seen_cells = set()  # longitude wrap can revisit cells at small levels
        while r <= max_r:
            ring_cells = cellid.ring(int(home), r, self.level)
            for c in ring_cells:
                ci = int(c)
                if ci in seen_cells:
                    continue
                seen_cells.add(ci)
                b = self._bucket(np.uint64(c))
                if b.size:
                    cand.append(b)
            n_cand = sum(len(c) for c in cand)
            if n_cand >= k:
                idx = np.concatenate(cand)
                d = euclid_deg(qlon, qlat, self.lon[idx], self.lat[idx])
                top = np.lexsort((idx, d))[:k]  # ties → lowest index (oracle parity)
                best_kth = d[top[-1]] if len(top) == k else np.inf
                # points in ring r+1 are ≥ r * cell_deg away from the query
                if best_kth <= r * self.cell_deg:
                    return idx[top], d[top]
            r += 1
        if not cand:
            return np.empty(0, dtype=np.int64), np.empty(0)
        idx = np.concatenate(cand)
        d = euclid_deg(qlon, qlat, self.lon[idx], self.lat[idx])
        top = np.lexsort((idx, d))[:k]
        return idx[top], d[top]

    def query(self, qlon: np.ndarray, qlat: np.ndarray, k: int):
        """Batch query → (keys (nq, k) object array-safe, distances)."""
        out_idx, out_d = [], []
        for ql, qa in zip(np.asarray(qlon, dtype=float), np.asarray(qlat, dtype=float)):
            idx, d = self.query_one(ql, qa, k)
            out_idx.append(idx)
            out_d.append(d)
        return out_idx, out_d
