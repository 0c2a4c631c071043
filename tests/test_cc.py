"""Distributed connected components (engine/cc.py): the vectorized
min-label kernel and the bucketed two-level contraction, pinned against
a naive driver union-find."""

import numpy as np
import pyarrow as pa
import pytest

from raycells.engine.cc import (
    cc_edges_local,
    connected_components,
    min_label_components,
)


def _naive_components(edges):
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in edges:
        parent.setdefault(x, x)
        parent.setdefault(y, y)
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    return {x: find(x) for x in parent}


def test_min_label_components_chain_and_clique():
    # chain 0-1-2-3, clique {4,5,6}, isolated 7
    a = np.array([0, 1, 2, 4, 4, 5], dtype=np.int64)
    b = np.array([1, 2, 3, 5, 6, 6], dtype=np.int64)
    lab = min_label_components(a, b, 8)
    assert lab.tolist() == [0, 0, 0, 0, 4, 4, 4, 7]


def test_min_label_components_long_chain():
    # worst case for naive propagation: a 500-node path
    n = 500
    a = np.arange(n - 1, dtype=np.int64)
    b = a + 1
    lab = min_label_components(a, b, n)
    assert (lab == 0).all()


def test_cc_edges_local_min_string_label():
    t = pa.table(
        {
            "id_a": pa.array(["d9", "d2", "x1"], pa.string()),
            "id_b": pa.array(["d2", "d1", "x2"], pa.string()),
        }
    )
    df = cc_edges_local(t)
    got = dict(zip(df["node"], df["root"]))
    assert got == {"d1": "d1", "d2": "d1", "d9": "d1", "x1": "x1", "x2": "x1"}


@pytest.mark.parametrize("num_buckets", [1, 7])
def test_connected_components_matches_naive(ray_session, num_buckets):
    rng = np.random.default_rng(42)
    # 60 nodes, random edges → several multi-bucket components
    edges = [
        (f"n{int(i):03d}", f"n{int(j):03d}")
        for i, j in rng.integers(0, 60, size=(120, 2))
        if i != j
    ]
    t = pa.table(
        {
            "id_a": pa.array([e[0] for e in edges], pa.string()),
            "id_b": pa.array([e[1] for e in edges], pa.string()),
        }
    )
    df = connected_components(t, num_buckets=num_buckets)
    got = dict(zip(df["node"], df["root"]))
    assert got == _naive_components(edges)


def test_connected_components_empty(ray_session):
    t = pa.table(
        {"id_a": pa.array([], pa.string()), "id_b": pa.array([], pa.string())}
    )
    assert len(connected_components(t)) == 0


def test_connected_components_dataset_input(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "id_a": pa.array(["a", "b", "x"], pa.string()),
            "id_b": pa.array(["b", "c", "y"], pa.string()),
        }
    )
    df = connected_components(rd.from_arrow(t))
    got = dict(zip(df["node"], df["root"]))
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_connected_components_larger_graph(ray_session):
    """20k-node / 30k-edge random graph (mix of cliquish clusters and
    chains) — the contraction must agree with a driver union-find."""
    rng = np.random.default_rng(7)
    edges = []
    # 2000 clusters of ~8 nodes with a few internal edges each
    for c in range(2000):
        base = c * 10
        members = base + rng.integers(0, 10, size=6)
        for i in range(len(members) - 1):
            edges.append((int(members[i]), int(members[i + 1])))
    # plus long chains crossing cluster boundaries
    chain = rng.permutation(20000)[:3000]
    edges += [(int(a), int(b)) for a, b in zip(chain[:-1], chain[1:])]
    names = [(f"n{a:06d}", f"n{b:06d}") for a, b in edges if a != b]
    t = pa.table(
        {
            "id_a": pa.array([e[0] for e in names], pa.string()),
            "id_b": pa.array([e[1] for e in names], pa.string()),
        }
    )
    df = connected_components(t)
    got = dict(zip(df["node"], df["root"]))
    assert got == _naive_components(names)


def test_connected_components_integer_ids(ray_session):
    """Round 4: endpoint columns may be INTEGER ids (embedding vec_ids)
    — canon is the NUMERIC min, and the dtype survives the contraction
    (numeric order != lexicographic: 9 < 10 numerically but "10" < "9")."""
    edges = [(9, 10), (10, 100), (2, 1), (7, 7_000_000), (7_000_000, 3)]
    t = pa.table(
        {
            "id_a": pa.array([a for a, _ in edges], pa.int64()),
            "id_b": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    df = connected_components(t)
    got = dict(zip(df["node"], df["root"]))
    assert got == {9: 9, 10: 9, 100: 9, 1: 1, 2: 1, 3: 3, 7: 3, 7_000_000: 3}
    assert all(isinstance(k, (int, np.integer)) for k in got)
