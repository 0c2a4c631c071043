"""Similarity-search tests: brute-force oracle + LSH recall (SURVEY.md §5.2)."""

import numpy as np
import pyarrow as pa
import pytest

from raycells.sim.knn import lsh_topk, topk_cosine


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.default_rng(11)
    emb = rng.standard_normal((300, 64))
    return emb


@pytest.fixture()
def emb_ds(ray_session, vecs):
    import ray.data as rd

    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in vecs]),
        }
    )
    return rd.from_arrow(t)


def _exact_topk(vecs, q, k):
    u = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    uq = q / np.linalg.norm(q)
    sims = np.round(u @ uq, 6)
    return np.lexsort((np.arange(len(vecs)), -sims))[:k]


def test_brute_force_matches_oracle(emb_ds, vecs):
    q = vecs[5]
    out = topk_cosine(emb_ds, q[None, :], np.array([0]), k=10).to_pandas()
    expected = _exact_topk(vecs, q, 10)
    assert out["vec_id"].tolist() == expected.tolist()
    assert out["rank"].tolist() == list(range(1, 11))
    assert out["sim"].iloc[0] == 1.0  # the query vector itself


def test_multiple_queries(emb_ds, vecs):
    qs = vecs[[3, 7]]
    out = topk_cosine(emb_ds, qs, np.array([3, 7]), k=5).to_pandas()
    assert len(out) == 10
    for qid, qv in [(3, vecs[3]), (7, vecs[7])]:
        got = out[out["query_id"] == qid]["vec_id"].tolist()
        assert got == _exact_topk(vecs, qv, 5).tolist()


def test_lsh_topk_recall(ray_session):
    """Approximate path: on clustered data (true neighbors genuinely
    similar — LSH's design regime) recall@10 ≥ 0.8."""
    import ray.data as rd

    rng = np.random.default_rng(13)
    noise = rng.standard_normal((200, 64))
    q = rng.standard_normal(64)
    cluster = q[None, :] + 0.15 * rng.standard_normal((15, 64))  # cos ≈ 0.99
    vecs = np.vstack([noise, cluster])
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in vecs]),
        }
    )
    ds = rd.from_arrow(t)
    out = lsh_topk(ds, q[None, :], np.array([0]), k=10, multiprobe=1).to_pandas()
    expected = set(_exact_topk(vecs, q, 10).tolist())
    got = set(out["vec_id"].tolist())
    assert len(got & expected) >= 8


def test_ivf_topk_recall(ray_session):
    """IVF path: coarse k-means lists + nprobe pruning. On clustered
    data the cluster's list is probed first — recall@10 ≥ 0.8; with
    nprobe == n_centroids the scan is exhaustive and must equal exact."""
    import ray.data as rd

    from raycells.sim.ivf import ivf_topk

    rng = np.random.default_rng(17)
    noise = rng.standard_normal((200, 64))
    q = rng.standard_normal(64)
    cluster = q[None, :] + 0.15 * rng.standard_normal((15, 64))
    vecs = np.vstack([noise, cluster])
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in vecs]),
        }
    )
    ds = rd.from_arrow(t)
    out = ivf_topk(ds, q[None, :], np.array([0]), k=10, n_centroids=8, nprobe=2).to_pandas()
    expected = set(_exact_topk(vecs, q, 10).tolist())
    assert len(set(out["vec_id"].tolist()) & expected) >= 8

    full = ivf_topk(ds, q[None, :], np.array([0]), k=10, n_centroids=8, nprobe=8).to_pandas()
    assert full["vec_id"].tolist() == _exact_topk(vecs, q, 10).tolist()


def test_hll_within_tolerance_of_exact(ray_session):
    """HLL sketch aggregate vs exact distinct count: ±5% at p=12."""
    import duckdb

    from raycells.pipelines.queries import q_approx_distinct_custs

    sf = "/root/testdata/sf0.001"
    got = q_approx_distinct_custs(sf).to_pandas().set_index("o_orderpriority")
    con = duckdb.connect()
    exact = con.execute(
        f"""SELECT o_orderpriority, count(DISTINCT o_custkey) n
            FROM read_parquet('{sf}/orders.parquet') GROUP BY 1"""
    ).df().set_index("o_orderpriority")
    for prio, row in exact.iterrows():
        est = got.loc[prio, "approx_custs"]
        assert abs(est - row["n"]) / row["n"] < 0.05, (prio, est, row["n"])


def test_hamming_flips_multiprobe_depth():
    """multiprobe >= 2 must actually widen the probe set (a previous cap
    made every depth >= 2 identical to 1): depth d probes
    sum_{i<=d} C(n, i) buckets, all within Hamming distance d."""
    from math import comb

    from raycells.sim.knn import _hamming_flips

    for n in (4, 8):
        for m in range(0, n + 1):
            flips = _hamming_flips(n, m)
            assert len(flips) == len(set(flips)) == sum(comb(n, d) for d in range(m + 1))
            assert all(bin(f).count("1") <= m and f < (1 << n) for f in flips)
    assert len(_hamming_flips(8, 2)) > len(_hamming_flips(8, 1))


def test_topk_cosine_empty_dataset(ray_session):
    """Zero candidate blocks must return the typed empty table, not
    raise from np.concatenate([]) (regression — the inline merge lacked
    _merge_topk's empty guard)."""
    import ray.data as rd

    empty = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float64())),
        }
    )
    out = topk_cosine(
        rd.from_arrow(empty), np.ones((1, 4)), np.array([0]), k=3
    ).to_pandas()
    assert len(out) == 0
    assert list(out.columns) == ["query_id", "vec_id", "sim", "rank"]


def test_hll_rank_exact_across_binades():
    """The float64-exponent rank must equal the exact integer rank for
    adversarial values within half-ulp below a power of two (regression:
    off-by-one for p <= 9) and for random uint64 values."""
    from raycells.sim.hll import _rank

    def exact(rest, p):
        return np.array(
            [64 - p + 1 if r == 0 else 64 - int(r).bit_length() + 1 for r in rest],
            dtype=np.uint8,
        )

    for p in (4, 9, 12):
        adversarial = np.array(
            [
                (1 << 63) - (1 << p),  # half-ulp below 2^63 → rounds up
                (1 << 62) - (1 << p),
                (1 << 63),
                (1 << p),
                0,
                (1 << 64) - (1 << p),
            ],
            dtype=np.uint64,
        )
        np.testing.assert_array_equal(_rank(adversarial, p), exact(adversarial, p))
        rng = np.random.default_rng(7)
        rand = (rng.integers(0, 1 << 63, 4096, dtype=np.int64).view(np.uint64)
                << np.uint64(p))
        np.testing.assert_array_equal(_rank(rand, p), exact(rand, p))


def test_sketches_merge_across_shards():
    """The 'mergeable' claims, demonstrated concretely: (a) HLL registers
    built per shard and merged give the SAME estimate as one pass over
    the union; (b) the fixed-width histogram sketch's bucket counts add
    across shards and reproduce the single-pass quantile estimates —
    the incremental/append execution mode both sketches exist for."""
    from raycells.sim.hll import hll_estimate, hll_merge, hll_registers

    rng = np.random.default_rng(23)
    a = rng.integers(0, 50_000, 40_000)
    b = rng.integers(25_000, 90_000, 40_000)
    merged = hll_merge(hll_registers(a), hll_registers(b))
    single = hll_registers(np.concatenate([a, b]))
    assert np.array_equal(merged, single)  # registers, not just estimates
    est = hll_estimate(merged)
    true = len(np.unique(np.concatenate([a, b])))
    assert abs(est - true) / true < 0.05

    # histogram sketch: per-shard bucket counts are pure addition
    W = 100
    vals_a = rng.integers(0, 100_000, 30_000)
    vals_b = rng.integers(0, 100_000, 30_000)

    def hist(v):
        bu, c = np.unique(v // W, return_counts=True)
        return dict(zip(bu.tolist(), c.tolist()))

    ha, hb = hist(vals_a), hist(vals_b)
    hm = {k: ha.get(k, 0) + hb.get(k, 0) for k in set(ha) | set(hb)}
    hs = hist(np.concatenate([vals_a, vals_b]))
    assert hm == hs

    def est_q(h, q100):
        bu = np.array(sorted(h), dtype=np.int64)
        cum = np.cumsum([h[int(k)] for k in bu])
        n = cum[-1]
        i = int(np.searchsorted(cum * 100, n * q100))
        return int(bu[i] * W)

    for q in (50, 90, 99):
        assert est_q(hm, q) == est_q(hs, q)


def test_bloom_merge_and_probe_guarantees():
    """Bloom partials OR-merge to the full-build bitmap (mergeability),
    every true member probes positive (no false negatives), and the FP
    rate on non-members stays plausible for 4 hashes at this load."""
    import numpy as np

    from raycells.sim.bloom import bloom_probe, partial_bloom

    rng = np.random.default_rng(11)
    keys = rng.choice(10**9, size=3000, replace=False).astype(np.int64)
    full = partial_bloom(keys)
    merged = partial_bloom(keys[:1000]) | partial_bloom(keys[1000:2000]) | partial_bloom(keys[2000:])
    assert np.array_equal(full, merged)
    assert bloom_probe(full, keys).all()  # no false negatives, ever
    non = rng.choice(10**9, size=20000, replace=False).astype(np.int64)
    non = non[~np.isin(non, keys)]
    fp = bloom_probe(full, non).mean()
    assert fp < 0.05  # m=65536, k=4, n=3000 → theoretical ~0.05%


def test_sketch_dataset_surface(ray_session):
    """The promoted Dataset-level sketch API (sim/sketch.py): bloom_build
    over a Dataset equals the kernel-level full build; bloom_prune keeps
    a SUPERSET of the exact matches and never drops a true member; the
    composed prune→exact-filter result equals plain exact semantics;
    hll_build folds per-batch partials to the single-pass registers."""
    import ray
    import ray.data as rd

    from raycells.sim import sketch
    from raycells.sim.bloom import partial_bloom
    from raycells.sim.hll import hll_registers

    rng = np.random.default_rng(7)
    build_keys = np.unique(rng.integers(0, 100_000, 500).astype(np.int64))
    probe_keys = rng.integers(0, 100_000, 5000).astype(np.int64)

    build_ds = rd.from_arrow(
        pa.table({"k": pa.array(build_keys)})
    ).repartition(4)
    probe_ds = rd.from_arrow(
        pa.table({"k": pa.array(probe_keys)})
    ).repartition(4)

    ref = sketch.bloom_build(build_ds, "k")
    assert np.array_equal(ray.get(ref), partial_bloom(build_keys))

    kept = sketch.bloom_prune(probe_ds, ref, "k").to_pandas()["k"].to_numpy()
    true_mask = np.isin(probe_keys, build_keys)
    # no false negatives: every true match survives the prune
    assert np.isin(probe_keys[true_mask], kept).all()
    # composition: prune + exact filter == exact filter alone
    exact_after = kept[np.isin(kept, build_keys)]
    assert sorted(exact_after.tolist()) == sorted(
        probe_keys[true_mask].tolist()
    )

    # pred= restricts the build rows
    ref_even = sketch.bloom_build(
        build_ds, "k",
        pred=lambda b: b["k"].to_numpy(zero_copy_only=False) % 2 == 0,
    )
    assert np.array_equal(
        ray.get(ref_even), partial_bloom(build_keys[build_keys % 2 == 0])
    )

    regs = sketch.hll_build(probe_ds, "k")
    assert np.array_equal(regs, hll_registers(probe_keys))


def test_pq_adc_topk_recall_and_code_shape(ray_session):
    """PQ path (round 5): per-subspace codebooks + ADC scoring. On
    clustered data the planted cluster's codes reconstruct toward the
    query — recall@10 ≥ 0.8 — and the compressed representation is m
    small ints per vector (the 100-TB memory story). Also pins that the
    distributed encode equals the driver-side reference encode."""
    import ray.data as rd

    from raycells.sim.pq import pq_adc_topk, pq_encode, train_pq_books
    from raycells.text.dedup import quantize_embeddings

    rng = np.random.default_rng(23)
    noise = rng.standard_normal((200, 64))
    q = rng.standard_normal(64)
    cluster = q[None, :] + 0.10 * rng.standard_normal((15, 64))
    vecs = np.vstack([noise, cluster])
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in vecs]),
        }
    )
    ds = rd.from_arrow(t)
    out = pq_adc_topk(ds, q[None, :], np.array([0]), k=10, m=4, ks=16).to_pandas()
    # PQ granularity is the code cell: the 15 planted neighbors share a
    # code, so ADC cannot rank WITHIN the cell (ties -> vec_id) and
    # exact-top-10 overlap saturates near 10·(10/15). The structural
    # guarantee is that every hit comes from the planted cluster, and
    # cell-level recall stays >= 0.7.
    got = out["vec_id"].tolist()
    assert all(v >= 200 for v in got), got
    expected = set(_exact_topk(vecs, q, 10).tolist())
    assert len(set(got) & expected) >= 7
    assert out["rank"].tolist() == list(range(1, 11))

    # code shape + determinism: (N, m) small ints, stable across calls
    eq = quantize_embeddings(vecs)
    books = train_pq_books(eq, m=2, ks=16)
    codes = pq_encode(eq, books)
    assert codes.shape == (len(vecs), 2)
    assert codes.min() >= 0 and codes.max() < 16
    assert np.array_equal(codes, pq_encode(eq, books))


def test_cms_build_merges_blocks_and_never_undercounts(ray_session):
    """Count-min sketch (round 5): partials from many blocks sum to the
    single-pass sketch, every estimate >= the true count, and at a
    width below the key cardinality collisions INFLATE at least one
    estimate (the regime the cms_heavy_hitters oracle pins)."""
    import ray
    import ray.data as rd

    from raycells.sim.sketch import CMS_D, _cms_buckets, cms_build, cms_estimate

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 40, size=5000).astype(np.uint64)  # 40 keys, zipf-less
    t = pa.table({"k": pa.array(keys.view(np.int64), pa.int64())})
    ds = rd.from_arrow(t).repartition(8)

    def fps(b):
        return b["k"].to_numpy(zero_copy_only=False).view(np.uint64)

    w = 16
    cms = ray.get(cms_build(ds, fps, w=w))
    assert cms.shape == (CMS_D, w)
    # every row's counters sum to the total occurrence count
    assert (cms.sum(axis=1) == len(keys)).all()

    uniq, true = np.unique(keys, return_counts=True)
    est = cms_estimate(cms, uniq)
    assert (est >= true).all()
    assert (est > true).any()  # 40 keys into 16 buckets: must collide

    # single-block sketch == multi-block merged sketch
    cms1 = ray.get(cms_build(rd.from_arrow(t).repartition(1), fps, w=w))
    assert np.array_equal(cms, cms1)
    # bucket rows are distinct hash functions
    bks = _cms_buckets(uniq, w)
    assert any(not np.array_equal(bks[0], bks[r]) for r in range(1, CMS_D))


class TestKCenter:
    def _ds(self, vecs, ids=None, blocks=3):
        import ray.data as rd

        n = len(vecs)
        t = pa.table(
            {
                "vec_id": pa.array(
                    np.asarray(ids if ids is not None else np.arange(n)),
                    pa.int64(),
                ),
                "embedding": pa.array([list(map(float, r)) for r in vecs]),
            }
        )
        return rd.from_arrow(t).repartition(blocks)

    def test_matches_serial_greedy(self, ray_session):
        from raycells.sim.kcenter import kcenter_select
        from raycells.text.dedup import quantize_embeddings

        rng = np.random.default_rng(7)
        vecs = rng.normal(size=(40, 6)) * 0.3
        out = kcenter_select(self._ds(vecs), k=5).to_pandas()
        # serial reference: identical quantized-int greedy chain
        q = quantize_embeddings(vecs)
        n2 = np.einsum("ij,ij->i", q, q)
        order = [(0, int(np.flatnonzero(n2 == n2.max()).min()), int(n2.max()))]
        mind = np.einsum(
            "ij,ij->i", q - q[order[0][1]], q - q[order[0][1]]
        )
        for r in range(1, 5):
            m = mind.max()
            j = int(np.flatnonzero(mind == m).min())
            order.append((r, j, int(m)))
            d2 = np.einsum("ij,ij->i", q - q[j], q - q[j])
            mind = np.minimum(mind, d2)
        assert list(zip(out["rank"], out["vec_id"], out["d2"])) == order

    def test_duplicate_vectors_and_ties_pick_min_id(self, ray_session):
        from raycells.sim.kcenter import kcenter_select

        # 3 distinct locations; the far pair are exact duplicates, so
        # after both real locations are centers every remaining point is
        # a dup with md = 0 → rank 2+ must pick the MIN remaining id
        base = [[0.1, 0.1], [0.1, 0.1], [0.4, 0.4], [0.4, 0.4], [0.4, 0.4]]
        out = kcenter_select(self._ds(base, ids=[11, 7, 20, 3, 5]), k=4).to_pandas()
        # seed: max norm (the 0.4 dups), tie → min id 3
        assert out.iloc[0]["vec_id"] == 3 and out.iloc[0]["d2"] > 0
        # rank 1: farthest from the 0.4 cluster = a 0.1 point, min id 7
        assert out.iloc[1]["vec_id"] == 7 and out.iloc[1]["d2"] > 0
        # everything (including the chosen centers, whose md is 0 by
        # definition) is now distance 0 from a center: the deterministic
        # (max md, min id) rule picks the GLOBAL min id 3 again — the
        # saturated-selection corner, identical to the oracle's chain
        assert list(out.iloc[2:]["vec_id"]) == [3, 3]
        assert list(out.iloc[2:]["d2"]) == [0, 0]

    def test_empty_dataset(self, ray_session):
        from raycells.sim.kcenter import kcenter_select

        out = kcenter_select(self._ds(np.empty((0, 2))), k=3, )
        assert out.num_rows == 0


def test_cluster_cap_invariants_and_matches_undistributed(ray_session):
    """cluster_cap (SemDeDup keep-K-per-cluster): per-cluster row count
    ≤ k, ranks contiguous from 1, centrality non-increasing within a
    cluster, and the distributed grouped_topk keeps exactly the rows a
    single-process full ranking keeps."""
    import pandas as pd

    from raycells.pipelines.queries import q_cluster_cap, _read, SMALL_TABLE_BLOCKS
    from raycells.sim.ivf import _cent_norms, train_from_ds
    from raycells.text.dedup import quantize_embeddings

    sf = "/root/testdata/sf0.001"
    out = q_cluster_cap(sf, k=5).to_pandas()
    for _, g in out.groupby("cluster"):
        g = g.sort_values("rank")
        assert len(g) <= 5
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (np.diff(g["centrality"].to_numpy()) <= 0).all()

    # undistributed reference: same centroids, full pandas ranking
    ds = _read(sf, "embeddings", SMALL_TABLE_BLOCKS,
               columns=["vec_id", "embedding"])
    sums = train_from_ds(ds, n_centroids=16)
    nrm = _cent_norms(sums)
    t = ds.to_pandas()
    eq = quantize_embeddings(np.asarray(list(t["embedding"]), np.float64))
    sims = (eq @ sums.T).astype(np.float64) / nrm[None, :]
    a = np.argmax(sims, axis=1)
    x2 = np.einsum("ij,ij->i", eq, eq)
    ref = pd.DataFrame({
        "cluster": a.astype(np.int64),
        "vec_id": t["vec_id"].to_numpy().astype(np.int64),
        "centrality": sims[np.arange(len(a)), a] / np.sqrt(x2.astype(np.float64)),
    }).sort_values(["cluster", "centrality", "vec_id"],
                   ascending=[True, False, True], kind="stable")
    ref = ref.groupby("cluster", sort=True).head(5).reset_index(drop=True)
    ref["rank"] = ref.groupby("cluster", sort=False).cumcount() + 1
    got = out.sort_values(["cluster", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["cluster", "vec_id", "centrality", "rank"]],
        ref[["cluster", "vec_id", "centrality", "rank"]],
    )
