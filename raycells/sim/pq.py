"""Product-quantization (PQ) approximate-nearest-neighbor search — the
MEMORY-compression scale path next to IVF's scan-pruning path.

At 100 TB an embedding corpus cannot keep float vectors hot: a 64-dim
float32 vector is 256 B, its PQ code here is ``m`` uint8 bytes. The
engine shape (Jégou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011 — public paper):

- **Train** (driver, bounded): split the dims into ``m`` contiguous
  subspaces and run the SAME exact-integer Lloyd quantizer as IVF
  (``sim/ivf.train_centroids_int``) on each dim slice of a bounded
  sample — sample size is a constant, independent of corpus size.
- **Encode** (distributed): one ``map_batches`` stage assigns each
  row's subvector to its nearest codebook centroid per subspace
  (argmax dot/|s|, ties → lowest c — the codebase-wide assignment
  convention) with one (B, dsub) @ (dsub, ks) matmul per subspace.
  The code is ``m`` small ints; pixels^W floats never leave the task.
- **Score** (asymmetric distance computation, ADC): the query builds a
  tiny (m, ks) lookup table lut[j][c] = dot(q_j, s_{j,c}) / |s_{j,c}|
  ONCE; a row's score is the FIXED-ORDER sum Σ_j lut[j][code_j] —
  j ascending, so the float additions form an identical IEEE
  expression tree in numpy and SQL (the CLAUDE.md cross-engine float
  recipe; never an order-dependent aggregate).
- **Top-k**: per-block per-query top-k partials (top-k of the union ==
  top-k of per-block top-k's), driver merges ≤ k·Q rows per block —
  the exchange never carries candidates, codes, or vectors.

EXACTNESS BUDGET: quantized components |e| < 2^21, centroid sums
|s| < 2^21·train_rows < 2^32, per-subspace dot over ≤ 64 dims < 2^59 —
exact int64; lut divides that exact int (cast to double, exact) by the
sqrt of an exact integer — every number both engines compare is an
exact-int-derived double.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raycells.sim.ivf import _assign, _cent_norms, train_centroids_int
from raycells.sim.knn import _gather, _merge_topk

__all__ = ["train_pq_books", "pq_encode", "pq_adc_topk"]


def train_pq_books(
    eq: np.ndarray, m: int, ks: int, n_iters: int = 10
) -> list[np.ndarray]:
    """Per-subspace codebooks over quantized integer vectors: dims split
    into ``m`` contiguous slices, each trained with the shared
    exact-integer Lloyd (content-keyed seeding runs on the SLICE, so a
    subspace's seeds depend only on that subspace's content)."""
    d = eq.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return [
        train_centroids_int(eq[:, j * dsub : (j + 1) * dsub], ks, n_iters)
        for j in range(m)
    ]


def pq_encode(eq: np.ndarray, books: list[np.ndarray]) -> np.ndarray:
    """(N, d) quantized vectors → (N, m) int64 codes (one matmul per
    subspace; the ``_assign`` tie convention: ties → lowest c)."""
    m = len(books)
    dsub = eq.shape[1] // m
    return np.stack(
        [_assign(eq[:, j * dsub : (j + 1) * dsub], books[j]) for j in range(m)],
        axis=1,
    )


def _adc_lut(qq: np.ndarray, books: list[np.ndarray]) -> np.ndarray:
    """(Q, m, ks) ADC lookup: lut[qi, j, c] = dot(q_j, s_{j,c}) / |s_{j,c}|
    (exact int64 dot → double, divided by the sqrt of an exact int)."""
    m = len(books)
    dsub = qq.shape[1] // m
    ks = max(len(b) for b in books)
    lut = np.full((len(qq), m, ks), -np.inf, dtype=np.float64)
    for j, b in enumerate(books):
        dots = (qq[:, j * dsub : (j + 1) * dsub] @ b.T).astype(np.float64)
        lut[:, j, : len(b)] = dots / _cent_norms(b)[None, :]
    return lut


def pq_adc_topk(
    ds,
    query_matrix: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 2,
    ks: int = 8,
    n_iters: int = 10,
    train_rows: int = 2048,
) -> pa.Table:
    """PQ-ADC cosine-style top-k: bounded-sample codebooks, distributed
    encode+score, per-block top-k partials, driver merge. Approximate
    (the score ranks by the code-reconstructed direction, not the exact
    vector); recall pinned in tests/test_sim.py."""
    import ray

    from raycells.text.dedup import quantize_embeddings

    train = np.asarray(
        [r[col] for r in ds.limit(train_rows).select_columns([col]).take_all()],
        dtype=np.float64,
    )
    books = train_pq_books(quantize_embeddings(train), m, ks, n_iters)
    qq = quantize_embeddings(np.asarray(query_matrix, dtype=np.float64))
    lut = _adc_lut(qq, books)

    state_ref = ray.put((books, lut, np.asarray(query_ids, dtype=np.int64)))

    class EncodeScoreTopK:
        """Encode → LUT-gather score → per-batch per-query top-k: the
        block's output is ≤ k·Q narrow rows regardless of block size."""

        def __init__(self, s_ref):
            self.books, self.lut, self.qid = ray.get(s_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            eq = quantize_embeddings(
                np.asarray(batch[col].to_pylist(), dtype=np.float64)
            )
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            codes = pq_encode(eq, self.books)  # (B, m)
            out_q, out_id, out_s = [], [], []
            for qi in range(self.lut.shape[0]):
                # FIXED j-ascending additions — the identical IEEE tree
                # the oracle's (t0 + t1 + …) expression builds
                score = self.lut[qi, 0, codes[:, 0]]
                for j in range(1, codes.shape[1]):
                    score = score + self.lut[qi, j, codes[:, j]]
                order = np.lexsort((ids, -score))[: min(k, score.size)]
                out_q.append(np.full(len(order), self.qid[qi]))
                out_id.append(ids[order])
                out_s.append(score[order])
            if not out_q:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        id_col: pa.array([], batch.schema.field(id_col).type),
                        "sim": pa.array([], pa.float64()),
                    }
                )
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q).astype(np.int64)),
                    id_col: pa.array(np.concatenate(out_id)),
                    "sim": pa.array(np.concatenate(out_s)),
                }
            )

    from raycells.engine.stages import broadcast_task

    # no explicit batch_size: per-block batches keep the task count
    # pinned to the upstream read (CLAUDE.md fusion rule)
    partial = ds.map_batches(
        broadcast_task(EncodeScoreTopK, state_ref),
        batch_format="pyarrow",
    )
    return _merge_topk(_gather(partial), query_ids, id_col, k)
