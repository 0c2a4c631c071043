"""Deduplication operators (exact + near-dup families).

Ray-Data-first shapes (SURVEY.md §2.9 + training-data mandate):

- **exact**: content hash inside ``map_batches`` → coarse-bucket
  shuffle → vectorized min-id-per-hash inside each bucket. The shuffle
  moves (hash, id) pairs, never the payload.
- **MinHash + LSH**: shingle → 64 minhashes → band into (bands × rows)
  buckets inside ``map_batches`` (vectorized universal hashing), ONE
  shuffle to co-locate candidates, exact n-gram Jaccard verify per real
  bucket.
- **SimHash**: 64-bit token-weighted simhash per doc; near-dup pairs =
  same chunk among ``max_hamming + 1`` bit-chunks (pigeonhole — full
  recall for any radius) with blocked-SWAR Hamming verify.
- **embedding cosine**: multi-table sign-LSH buckets + in-bucket cosine.

Every shuffle keys on a COARSE hash bucket (``_coarse_bucket``), never
on the raw high-cardinality key: Ray's sort-based groupby pays
per-distinct-group Python overhead, so real buckets are resolved
vectorized inside each coarse group (CLAUDE.md platform notes). All hash
seeds are fixed constants → deterministic under Ray task retries.
"""

from __future__ import annotations

from typing import Iterable, List

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raycells.engine.shuffle import from_pandas_clean, scaled_buckets

__all__ = [
    "content_hash64",
    "add_content_hash",
    "exact_dedup",
    "char_shingles",
    "minhash_signature",
    "MinHasher",
    "lsh_bands",
    "jaccard",
    "minhash_near_dup_pairs",
    "ngram_jaccard_near_dup_pairs",
    "simhash64",
    "simhash_near_dup_pairs",
    "embedding_near_dup_pairs",
    "dup_window_rows",
    "dup_span_report",
    "paragraph_dedup_manifest",
]

_MERSENNE = (1 << 61) - 1
_RNG_SEED = 0x5EED_C0DE


def content_hash64(texts: Iterable[str]) -> np.ndarray:
    """Deterministic 64-bit content hash per text — the vectorized
    rolling-polynomial kernel (analysis.fingerprint64: chunked ~2 MB
    working sets, reused scratch), carried as the int64 BIT PATTERN so
    Ray groupby stays on native Arrow blocks. Replaces the round-2
    per-row hashlib loop that capped exact-dedup throughput at Python
    speed."""
    from raycells.text.analysis import fingerprint64

    return fingerprint64(list(texts)).view(np.int64)


def add_content_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    h = content_hash64(batch[col].to_pylist())
    return batch.append_column("content_hash", pa.array(h, pa.int64()))


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: hash-partition on content hash, keep the min-id row
    per hash (deterministic winner). Returns the deduplicated Dataset of
    (content_hash, doc_id) — join back on id to recover payloads so the
    shuffle only ever moves 16-byte rows."""
    hashed = ds.map_batches(
        lambda b: pa.table(
            {
                id_col: b[id_col],
                "content_hash": pa.array(
                    content_hash64(b[col].to_pylist()), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def keep_first(group: pa.Table) -> pa.Table:
        df = group.to_pandas().drop(columns=["_cbucket"])
        winners = df.loc[df.groupby("content_hash")[id_col].idxmin()]
        return from_pandas_clean(winners)

    return (
        hashed.map_batches(
            lambda b, nb=scaled_buckets(): _coarse_bucket(b, ["content_hash"], nb),
            batch_format="pyarrow"
        )
        .groupby("_cbucket")
        .map_groups(keep_first, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# shingling + MinHash
# ---------------------------------------------------------------------------

def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-byte shingle hashes of one text (vectorized sliding
    window over the utf-8 payload; |text| < k → one whole-text shingle)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if b.size == 0:
        return np.zeros(1, dtype=np.uint64)
    if b.size < k:
        win = b[None, :]
    else:
        win = np.lib.stride_tricks.sliding_window_view(b, k)
    with np.errstate(over="ignore"):
        pows = np.uint64(1099511628211) ** np.arange(win.shape[1], dtype=np.uint64)
        h = (win.astype(np.uint64) * pows[None, :]).sum(axis=1, dtype=np.uint64)
    return np.unique(h)


_MINHASHERS: dict = {}  # n_perm → MinHasher (reused task workers)


def _minhasher(n_perm: int) -> "MinHasher":
    """Per-worker memoized MinHasher: the permutation table is
    deterministic from ``n_perm``, so task stages can reuse it across
    batches and executions without actor-pool startup."""
    mh = _MINHASHERS.get(n_perm)
    if mh is None:
        mh = _MINHASHERS[n_perm] = MinHasher(n_perm)
    return mh


class MinHasher:
    """n_perm universal-hash MinHash over shingle sets.

    Stateful-stage material: permutation coefficients are built once per
    worker (``_minhasher`` memo for task stages; an actor's ``__init__``
    when used as a pool) from a fixed seed."""

    def __init__(self, n_perm: int = 64, seed: int = _RNG_SEED):
        rng = np.random.default_rng(seed)
        # odd multipliers + offsets in the Mersenne field
        self.a = (rng.integers(1, _MERSENNE, n_perm, dtype=np.int64) | 1).astype(
            np.uint64
        )
        self.b = rng.integers(0, _MERSENNE, n_perm, dtype=np.int64).astype(np.uint64)
        self.n_perm = n_perm

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        """(n_perm,) uint64 signature of one shingle set — one broadcasted
        (S, P) universal-hash matrix, column min."""
        x = shingles.astype(np.uint64)[:, None]
        with np.errstate(over="ignore"):
            hv = (x * self.a[None, :] + self.b[None, :]) % np.uint64(_MERSENNE)
        return hv.min(axis=0)

    # keep each (shingles × n_perm) hash matrix ≈ 4 MB (cache-resident;
    # a whole-batch matrix at ~1k shingles/doc would be hundreds of MB)
    _CHUNK_SHINGLES = 8192

    def batch_signatures(self, texts: List[str], k: int = 5) -> np.ndarray:
        """(n_texts, n_perm) signatures via chunked universal-hash matrix
        passes: docs grouped until ~_CHUNK_SHINGLES shingles, hashed
        (S, P) per group, per-doc segmented column minima via
        ``np.minimum.reduceat`` — no per-doc Python beyond shingling."""
        shingle_sets = [char_shingles(t, k) for t in texts]
        out = np.empty((len(texts), self.n_perm), dtype=np.uint64)
        lo = 0
        while lo < len(texts):
            hi, total = lo, 0
            while hi < len(texts) and (total == 0 or total + shingle_sets[hi].size <= self._CHUNK_SHINGLES):
                total += shingle_sets[hi].size
                hi += 1
            counts = np.array([s.size for s in shingle_sets[lo:hi]], dtype=np.int64)
            flat = np.concatenate(shingle_sets[lo:hi]).astype(np.uint64)
            # hash each DISTINCT shingle once, then gather: the multiply
            # + 64-bit modulo per permutation is the hot loop, and real
            # corpora repeat shingles heavily across documents (this
            # fixture: ~2k unique of 1M — a ~300× cut in modulo work).
            uniq, inv = np.unique(flat, return_inverse=True)
            with np.errstate(over="ignore"):
                hv_u = (uniq[:, None] * self.a[None, :] + self.b[None, :]) % np.uint64(
                    _MERSENNE
                )
            hv = hv_u[inv]
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            out[lo:hi] = np.minimum.reduceat(hv, starts, axis=0)
            lo = hi
        return out


def minhash_signature(text: str, n_perm: int = 64, k: int = 5) -> np.ndarray:
    return MinHasher(n_perm).signature(char_shingles(text, k))


MINHASH_PARAMS_PARQUET = "/tmp/raycells_docs/minhash_params.parquet"


def ensure_minhash_params_parquet(
    path: str = MINHASH_PARAMS_PARQUET, n_perm: int = 64
) -> str:
    """Dump the MinHasher permutation constants (perm index, a, b — all
    < 2^61, int64-safe) once, idempotently: with the constants in a
    table, the ENTIRE MinHash+LSH pipeline — shingle hashing, the 64
    universal-hash minima, band folding, bucket candidate pairs and the
    exact-Jaccard verify — is reproducible in DuckDB SQL (the
    ``minhash_pairs`` oracle)."""
    import os

    import pyarrow.parquet as pq

    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    mh = MinHasher(n_perm)
    tbl = pa.table(
        {
            "perm": pa.array(np.arange(n_perm, dtype=np.int64)),
            "a": pa.array(mh.a.astype(np.int64)),
            "b": pa.array(mh.b.astype(np.int64)),
        }
    )
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path


def lsh_bands(signatures: np.ndarray, bands: int = 16) -> np.ndarray:
    """(n, n_perm) signatures → (n, bands) band-hash matrix. Each band
    hashes rows_per_band signature slots into one uint64 bucket key."""
    n, n_perm = signatures.shape
    r = n_perm // bands
    with np.errstate(over="ignore"):
        mixed = signatures.reshape(n, bands, r) * np.uint64(0x9E3779B97F4A7C15)
        out = np.zeros((n, bands), dtype=np.uint64)
        for j in range(r):  # r is tiny (4); the wide axis stays vectorized
            out = out * np.uint64(31) + mixed[:, :, j]
    return out


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


N_COARSE = 64
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _coarse_bucket(batch: pa.Table, cols, num_buckets: int = N_COARSE) -> pa.Table:
    """Append a coarse shuffle-bucket column derived from ``cols`` (the
    real, possibly high-cardinality key). The groupby shuffles on ~64
    distinct values; real-key boundaries are resolved inside each group."""
    import pandas as pd

    h = np.zeros(batch.num_rows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in cols:
            vals = batch[c].to_numpy(zero_copy_only=False)
            if vals.dtype.kind not in "iuf":
                vals = pd.util.hash_array(np.asarray(vals, dtype=object))
            h = (h ^ vals.astype(np.uint64)) * _GOLD
    return batch.append_column(
        "_cbucket", pa.array(((h >> np.uint64(33)) % num_buckets).astype(np.int64))
    )


def _iter_real_buckets(group: pa.Table, cols):
    """Yield row-index arrays for each real key (≥ 2 members) inside a
    coarse group — one vectorized lexsort, then boundary scan."""
    import pandas as pd

    keys = []
    for c in cols:
        vals = group[c].to_numpy(zero_copy_only=False)
        if vals.dtype.kind not in "iuf":
            vals = pd.util.hash_array(np.asarray(vals, dtype=object))
        keys.append(vals)
    order = np.lexsort(keys[::-1])
    stacked = np.stack([k[order] for k in keys], axis=1)
    change = np.any(stacked[1:] != stacked[:-1], axis=1)
    starts = np.concatenate([[0], np.nonzero(change)[0] + 1, [len(order)]])
    for lo, hi in zip(starts[:-1], starts[1:]):
        if hi - lo >= 2:
            yield order[lo:hi]


def _dedupe_pairs(pairs_ds):
    """Keep one row per (id_a, id_b): coarse-bucket shuffle + vectorized
    pandas drop_duplicates per bucket (pairs collide across bands/tables)."""

    def dedupe(g: pa.Table) -> pa.Table:
        df = g.to_pandas().drop(columns=["_cbucket"])
        df = df.sort_values(["id_a", "id_b"]).drop_duplicates(["id_a", "id_b"])
        return from_pandas_clean(df)

    return (
        pairs_ds.map_batches(
            lambda b, nb=scaled_buckets(): _coarse_bucket(b, ["id_a", "id_b"], nb),
            batch_format="pyarrow"
        )
        .groupby("_cbucket")
        .map_groups(dedupe, batch_format="pyarrow")
    )


def minhash_near_dup_pairs(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    n_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    sink_dir: str | None = None,
):
    """MinHash+LSH near-dup pipeline, two-phase so the exchange never
    carries text:

    **Phase A — candidates.** Task-stage signatures (the MinHasher's
    permutation table is memoized per worker) emit only
    ``(band, band_hash, id)`` rows; the coarse-bucket groupby — THE
    shuffle — therefore moves ``bands`` small ints per document instead
    of ``bands`` copies of the corpus. Real buckets are resolved inside
    each group and deduplicated candidate id pairs come out.

    **Phase B — verify, fully distributed.** Candidate pairs are
    deduplicated with the same coarse-bucket exchange, the DISTINCT
    candidate ids (16 B each — the only driver-side collection, bounded
    by LSH design) broadcast as a semi-join prefilter over the corpus,
    and each pair meets its two texts through TWO co-partitioned
    ``hash_join`` exchanges (engine/joins.py) — pair ⋈ text(id_a) ⋈
    text(id_b) — verified batch-local with exact shingle Jaccard. No
    corpus-derived table is ever ``ray.get``-collected; only the final
    verified pairs (the output) come back to the driver.
    Returns a pyarrow Table (id_a < id_b, jaccard)."""
    import ray

    def signatures(batch: pa.Table) -> pa.Table:
        mh = _minhasher(n_perm)
        texts = batch[col].to_pylist()
        ids = batch[id_col].to_pylist()
        sig = mh.batch_signatures(texts, k)
        bh = lsh_bands(sig, bands)
        n = len(texts)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
                "band_hash": pa.array(bh.reshape(-1).astype(np.int64), pa.int64()),
                id_col: pa.array(np.repeat(ids, bands)),
            }
        )

    def pairs_of(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_pylist()
        a_out, b_out = [], []
        for rows in _iter_real_buckets(group, ["band", "band_hash"]):
            uniq = sorted({ids[r] for r in rows})
            for x in range(len(uniq)):
                for y in range(x + 1, len(uniq)):
                    a_out.append(uniq[x])
                    b_out.append(uniq[y])
        return pa.table(
            {
                "id_a": pa.array(a_out, pa.string()),
                "id_b": pa.array(b_out, pa.string()),
            }
        )

    cand = (
        ds.map_batches(signatures, batch_format="pyarrow")
        .map_batches(
            lambda b, nb=scaled_buckets(): _coarse_bucket(b, ["band", "band_hash"], nb),
            batch_format="pyarrow"
        )
        .groupby("_cbucket")
        .map_groups(pairs_of, batch_format="pyarrow")
    )
    empty = pa.table(
        {
            "id_a": pa.array([], pa.string()),
            "id_b": pa.array([], pa.string()),
            "jaccard": pa.array([], pa.float64()),
        }
    )

    def verify(batch: pa.Table) -> pa.Table:
        # Batched exact Jaccard: shingle each DISTINCT doc once, then
        # ONE lexsort over (pair_row, shingle) of both sides counts
        # every pair's intersection in a single pass — each side is
        # unique within itself (np.unique output), so an adjacent
        # duplicate within a row is exactly one A∩B hit. No per-pair
        # kernel calls (VERDICT r3 #4).
        n = batch.num_rows
        if n == 0:
            return empty
        a_in = batch["id_a"].to_pylist()
        b_in = batch["id_b"].to_pylist()
        ta_in = batch["text_a"].to_pylist()
        tb_in = batch["text_b"].to_pylist()
        cache: dict = {}
        for i, t in zip(a_in + b_in, ta_in + tb_in):
            if i not in cache:
                cache[i] = char_shingles(t, k)
        sha = [cache[i] for i in a_in]
        shb = [cache[i] for i in b_in]
        la = np.fromiter((s.size for s in sha), np.int64, count=n)
        lb = np.fromiter((s.size for s in shb), np.int64, count=n)
        rows = np.concatenate(
            [np.repeat(np.arange(n), la), np.repeat(np.arange(n), lb)]
        )
        hashes = np.concatenate(sha + shb)
        order = np.lexsort((hashes, rows))
        r, h = rows[order], hashes[order]
        dup = (r[1:] == r[:-1]) & (h[1:] == h[:-1])
        inter = np.bincount(r[1:][dup], minlength=n)
        union = la + lb - inter  # ≥ 1: char_shingles never returns empty
        jac = inter / union
        keep = np.nonzero(jac >= threshold)[0]
        idx = pa.array(keep, pa.int64())
        return pa.table(
            {
                "id_a": pc.take(batch["id_a"], idx),
                "id_b": pc.take(batch["id_b"], idx),
                "jaccard": pa.array(jac[keep], pa.float64()),
            }
        )

    out = _verify_join_collect(
        cand, ds, id_col=id_col, payload_col=col,
        payload_names=("text_a", "text_b"), verify_fn=verify,
        id_type=pa.string(), empty=empty, sink_dir=sink_dir,
    )
    if sink_dir is not None:
        # _verify_join_collect owns sink hygiene in every path (incl.
        # zero candidates), so `out` is always the summary dict here
        return out
    if out is None or out.num_rows == 0:
        return empty
    order = np.lexsort(
        (
            np.asarray(out["id_b"].to_pylist(), object),
            np.asarray(out["id_a"].to_pylist(), object),
        )
    )
    return out.take(pa.array(order))


# candidate-touched payload sets at or under this ride the object store
# as broadcast block refs (each worker reads them zero-copy); above it,
# the co-partitioned hash-join path takes over
_VERIFY_BROADCAST_BYTES = 256 << 20


class _AttachPayloads:
    """Broadcast-task stage: append payload_a/payload_b columns to a
    candidate-pair batch from worker-local state built ONCE per worker
    out of the materialized (bounded) payload blocks — plasma reads in
    the workers, nothing through the driver."""

    def __init__(self, _ref0, refs, id_col, payload_col, payload_names):
        # _ref0 is broadcast_task's mandatory lead ref (also refs[0])
        import ray

        from raycells.engine.shuffle import block_tables

        self.names = payload_names
        tabs = [ray.get(r) for r in ref_list(refs)]
        # Ray hands EMPTY blocks through map_batches with the UPSTREAM
        # schema (the UDF never runs), so a rowless documents-read block
        # reaching this concat would carry the wrong columns — filter
        # through block_tables (which also raises on a NON-empty block
        # with a bad schema, a real producer bug).
        tabs = block_tables(tabs, id_col)
        if not tabs:
            # n_cand > 0 guarantees candidate-touched payload rows exist;
            # reaching here means the semi-join prefilter dropped them
            raise ValueError(
                "no candidate-touched payload blocks reached the attach "
                "stage — semi-join prefilter emitted only empty blocks"
            )
        t = pa.concat_tables(tabs)
        # dictionary-index attach: ids as an Arrow value_set, payloads
        # taken by position — no per-row Python (VERDICT r3 #4)
        self.ids = t[id_col].combine_chunks()
        self.vals = t[payload_col].combine_chunks()

    def __call__(self, batch: pa.Table) -> pa.Table:
        name_a, name_b = self.names
        ia = pc.index_in(batch["id_a"], value_set=self.ids)
        ib = pc.index_in(batch["id_b"], value_set=self.ids)
        if ia.null_count or ib.null_count:
            # index_in returns NULL for a missing id — the old dict
            # lookup raised KeyError; a silent null payload here would
            # make verify_fn quietly drop (or mis-score) the pair
            raise KeyError(
                "candidate pair references an id absent from the "
                "candidate-touched payload set"
            )
        return pa.table(
            {
                "id_a": batch["id_a"],
                "id_b": batch["id_b"],
                name_a: pc.take(self.vals, ia),
                name_b: pc.take(self.vals, ib),
            }
        )


def ref_list(refs):
    return list(refs) if isinstance(refs, (list, tuple)) else [refs]


def _union_id_blocks(*tabs) -> np.ndarray:
    """Worker-side union of candidate-pair blocks → one sorted array of
    DISTINCT endpoint ids (runs as a Ray task so the id set never lands
    on the driver)."""
    from raycells.engine.shuffle import block_tables

    arrs = [
        t[c].to_numpy(zero_copy_only=False)
        for t in block_tables(tabs, "id_a")
        for c in ("id_a", "id_b")
    ]
    return np.unique(np.concatenate(arrs)) if arrs else np.empty(0, object)


class _SemiJoinFetch:
    """Broadcast-task stage: semi-join prefilter of the corpus on the
    DISTINCT candidate ids. The sorted-unique id array is produced by
    ONE Ray task (``_union_id_blocks``) and read once per worker as a
    single zero-copy plasma object — the driver never collects the id
    set."""

    def __init__(self, wanted_ref, id_col, payload_col):
        import ray

        self.wanted = ray.get(wanted_ref)
        self.id_col = id_col
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_np = batch[self.id_col].to_numpy(zero_copy_only=False)
        keep = np.isin(ids_np, self.wanted)
        t = pa.table(
            {
                self.id_col: batch[self.id_col],
                self.payload_col: batch[self.payload_col],
            }
        )
        return t.filter(pa.array(keep))


def _verify_join_collect(
    cand_ds, corpus_ds, *, id_col, payload_col, payload_names, verify_fn,
    id_type, empty, sink_dir=None,
):
    """Shared distributed Phase-B skeleton for the near-dup verifiers:

    1. distributed pair dedup (coarse-bucket exchange) + bounded
       materialize — the candidate set is output-sized by LSH design;
    2. DISTINCT candidate ids broadcast as a semi-join prefilter over
       the corpus — as materialized block REFS unioned worker-side
       (no driver collection of the id set);
    3. each pair meets its two payloads — ADAPTIVELY by measured size:
       candidate-touched payloads under ``_VERIFY_BROADCAST_BYTES``
       stay in the object store as materialized blocks whose REFS
       broadcast to the verify workers (zero exchanges; each worker
       reads the blocks zero-copy — nothing is collected on the
       driver); a larger payload set takes the scale path, two
       co-partitioned ``hash_join`` exchanges
       (pair ⋈ payload(id_a) ⋈ payload(id_b));
    4. ``verify_fn`` per batch; only the verified pairs are collected.

    Returns the verified pa.Table (or None when there are no candidates).
    With ``sink_dir`` the verified pairs STREAM to partitioned parquet
    instead (one file per verify block — the pair table never needs one
    heap on a dup-heavy corpus) and a ``{"sink_dir", "n_pairs",
    "n_files"}`` summary comes back.
    """
    import ray
    import ray.data as rd

    from raycells.engine.joins import hash_join
    from raycells.engine.stages import broadcast_task

    cand = _dedupe_pairs(cand_ds).materialize()
    n_cand = cand.count()
    if n_cand == 0:
        if sink_dir is not None:
            # a zero-candidate run must still OWN the sink dir: leaving
            # a previous run's pair parquet behind would contradict the
            # n_pairs=0 summary the caller publishes
            import shutil

            shutil.rmtree(sink_dir, ignore_errors=True)
            os.makedirs(sink_dir, exist_ok=True)
            return {"sink_dir": sink_dir, "n_pairs": 0, "n_files": 0}
        return None

    # DISTINCT candidate ids stay in the object store: ONE Ray task
    # unions cand's materialized pair blocks into a single sorted plasma
    # array that broadcasts to the fetch workers — no extra Dataset
    # execution, and the id set never lands on the driver.
    wanted_ref = ray.remote(num_cpus=1)(_union_id_blocks).remote(
        *cand.to_arrow_refs()
    )

    name_a, name_b = payload_names
    touched = corpus_ds.map_batches(
        broadcast_task(_SemiJoinFetch, wanted_ref, id_col, payload_col),
        batch_format="pyarrow",
    ).materialize()  # bounded: candidate-touched rows only

    if touched.size_bytes() <= _VERIFY_BROADCAST_BYTES:
        refs = tuple(touched.to_arrow_refs())
        # repartition before the attach: cand's post-groupby blocks are
        # many and tiny, so mapping them directly fans the attach stage
        # out to every worker and rebuilds the broadcast dict 32× —
        # measured 0.7 s SLOWER than paying this small exchange
        # (interleaved A/B at sf0.1: 1.54 s vs 2.23 s best-of-6)
        n_blocks = max(1, min(64, n_cand // 2048))
        with_ab = (
            cand.repartition(n_blocks)
            .map_batches(
                broadcast_task(
                    _AttachPayloads, refs[0], refs,
                    id_col, payload_col, payload_names,
                ),
                batch_format="pyarrow",
            )
        )
    else:
        side_a = touched.map_batches(
            lambda b: pa.table({"_pid": b[id_col], name_a: b[payload_col]}),
            batch_format="pyarrow",
        )
        side_b = touched.map_batches(
            lambda b: pa.table({"_pid": b[id_col], name_b: b[payload_col]}),
            batch_format="pyarrow",
        )
        with_a = hash_join(
            cand, side_a,
            key_left="id_a", key_right="_pid",
            keep_left=["id_a", "id_b"], keep_right=[name_a],
        )
        with_ab = hash_join(
            with_a, side_b,
            key_left="id_b", key_right="_pid",
            keep_left=["id_a", "id_b", name_a], keep_right=[name_b],
        )
    verified = with_ab.map_batches(verify_fn, batch_format="pyarrow")
    if sink_dir is not None:
        # streamed sink (VERDICT r3 #9): the pair table goes straight to
        # partitioned parquet; only the summary counts reach the driver
        import shutil

        shutil.rmtree(sink_dir, ignore_errors=True)
        os.makedirs(sink_dir, exist_ok=True)
        verified.write_parquet(sink_dir)
        import pyarrow.parquet as _pq

        files = sorted(glob.glob(os.path.join(sink_dir, "*.parquet")))
        n_pairs = sum(_pq.ParquetFile(f).metadata.num_rows for f in files)
        return {"sink_dir": sink_dir, "n_pairs": int(n_pairs),
                "n_files": len(files)}
    # The concat below builds the function's RETURN VALUE — the verified
    # pair table, output-sized by LSH design. Callers that expect pair
    # lists beyond one heap consume `verified` via the sink_dir mode
    # above. Ray can surface schema-less empty blocks from empty groupby
    # buckets; drop them before the concat (they carry no rows)
    tabs = [ray.get(r) for r in verified.to_arrow_refs()]
    tabs = [t for t in tabs if t.num_rows > 0]
    if not tabs:
        return None
    return pa.concat_tables(tabs)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (size-banded dense set-similarity join)
# ---------------------------------------------------------------------------

# Row-slices per size band: R independent (N/R)×N matmul block tasks per
# band at the cost of (2R+1)× shingle-exchange volume (see
# ngram_jaccard_near_dup_pairs). 4 keeps the biggest sf0.1 band's block
# under ~0.2 s while the slice shuffle stays < 100 MB.
_NGRAM_SLICES = 4


def ngram_jaccard_near_dup_pairs(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    threshold: tuple = (4, 5),
    k: int = 5,
):
    """EXACT n-gram Jaccard join: every pair with J ≥ num/den, recall 1.0
    (vs MinHash+LSH's probabilistic recall), as a size-banded dense
    set-intersection join.

    J ≥ num/den implies the size-ratio bound
    ``den·min(|A|,|B|) ≥ num·max(|A|,|B|)`` (J ≤ min/max), so a qualifying
    pair's set sizes lie within one factor of den/num — banding docs by
    ``⌊log(sz)/log(den/num)⌋`` puts every such pair in the same or
    adjacent bands. Each doc is emitted once to its own band and once as
    a GHOST to the band below; ONE shuffle on the band key; inside each
    band group intersections are computed dense: a local shingle
    vocabulary (np.unique of the group's hashes), a binary N×V float32
    matrix, and a row-chunked ``M @ M.T`` BLAS matmul — exact integers
    (binary dot sums < 2^24), no candidate enumeration at all. The
    integer threshold cut ``den·|A∩B| ≥ num·|A∪B|`` matches the DuckDB
    oracle (pipelines/oracles._ngram_jaccard_sql) bit-for-bit; jaccard
    is the elementwise double quotient of exact ints. Ghost-ghost pairs
    are skipped (they re-appear as native-native in the band above), so
    no pair is emitted twice and no dedupe pass is needed.

    Why not prefix filtering (SSJoin/PPJoin): this synthetic corpus has
    a tiny shingle vocabulary (624 distinct 5-grams at sf0.01, mean set
    size 204), so every shingle is hot and per-shingle candidate
    enumeration degenerates to Σsz² ≈ 3·10⁸ Python-level pair visits
    (66 s at sf0.1); the dense band matmul does the same work as ~0.1 s
    of BLAS. Shingle hashes ride as int64 BIT PATTERNS (CLAUDE.md
    uint64 rule). Returns (id_a, id_b, jaccard), id_a < id_b bytewise,
    lexsorted.

    A dominant band would serialize its matmul in one group task
    (measured 1.7 s of a 2.3 s total concentrated in two bands at
    sf0.1), so each band is split into ``_NGRAM_SLICES`` row-slices —
    the standard blocked-cartesian trade: natives land in ONE slice as
    matrix ROWS (hash of id), and every doc is duplicated to ALL
    slices as matrix COLUMNS (own band, plus the band below as a
    ghost), giving R independent (N/R)×N block tasks per band for
    (2R+1)× exchange volume. Pair (i, j) in one band is emitted only
    where the smaller id is the row; a native row × ghost column is
    emitted unconditionally (the ghost's own band never sees the
    native as a column) — each pair surfaces exactly once, no dedupe
    pass. 2.3 s → 1.3 s at sf0.1/32 CPUs.
    """
    num, den = threshold
    log_ratio = float(np.log(den / num))
    R = _NGRAM_SLICES

    def doc_sets(batch: pa.Table) -> pa.Table:
        import hashlib

        texts = batch[col].to_pylist()
        ids = batch[id_col].to_pylist()
        n_doc = len(texts)
        hs, szs = [], np.empty(n_doc, dtype=np.int64)
        slices = np.empty(n_doc, dtype=np.int64)
        for i, t in enumerate(texts):
            s = char_shingles(t, k)  # sorted distinct uint64
            hs.append(s.view(np.int64))
            szs[i] = s.size
            slices[i] = (
                int.from_bytes(
                    hashlib.blake2b(
                        str(ids[i]).encode(), digest_size=8
                    ).digest(),
                    "little",
                )
                % R
            )
        bands = np.floor(np.log(szs.astype(np.float64)) / log_ratio).astype(
            np.int64
        )
        sh = pa.array(hs, pa.list_(pa.int64()))
        ids_arr = pa.array(ids, pa.string())

        def emit(gkey, isrow, ghost):
            return pa.table(
                {
                    "id": ids_arr,
                    "sz": pa.array(szs),
                    "gkey": pa.array(gkey),
                    "isrow": pa.array(np.full(n_doc, isrow)),
                    "ghost": pa.array(np.full(n_doc, ghost)),
                    "sh": sh,
                }
            )

        parts = [emit(bands * R + slices, True, False)]
        for r in range(R):
            parts.append(emit(bands * R + r, False, False))
            parts.append(emit((bands - 1) * R + r, False, True))
        return pa.concat_tables(parts)

    empty = pa.table(
        {
            "id_a": pa.array([], pa.string()),
            "id_b": pa.array([], pa.string()),
            "jaccard": pa.array([], pa.float64()),
        }
    )

    def band_pairs(group: pa.Table) -> pa.Table:
        isrow = group["isrow"].to_numpy(zero_copy_only=False)
        ghosts = group["ghost"].to_numpy(zero_copy_only=False)
        nr = int(isrow.sum())
        if nr == 0 or group.num_rows == nr:
            return empty
        ids = np.asarray(group["id"].to_pylist(), dtype=object)
        szs = group["sz"].to_numpy(zero_copy_only=False).astype(np.int64)
        lists = group["sh"].combine_chunks()
        values = lists.flatten().to_numpy(zero_copy_only=False)
        counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        vocab, inv = np.unique(values, return_inverse=True)
        rows_of = np.repeat(np.arange(group.num_rows, dtype=np.int64), counts)
        m = np.zeros((group.num_rows, vocab.size), dtype=np.float32)
        m[rows_of, inv] = 1.0
        ridx = np.nonzero(isrow)[0]
        cidx = np.nonzero(~isrow)[0]
        mc = m[cidx]
        sz_c, id_c, ghost_c = szs[cidx], ids[cidx], ghosts[cidx]
        a_out, b_out, j_out = [], [], []
        chunk = max(1, (4 << 20) // max(1, 4 * vocab.size))  # ~4 MB rows
        for lo in range(0, ridx.size, chunk):
            sel = ridx[lo : lo + chunk]
            inter = np.rint(m[sel] @ mc.T).astype(np.int64)
            union = szs[sel, None] + sz_c[None, :] - inter
            ok = den * inter >= num * union
            # same-band column: emit only where the row id is smaller
            # (the symmetric slice emits the other orientation); ghost
            # column: emit always — the ghost's band never sees this
            # row as a column, so the pair has exactly one home.
            id_r = ids[sel]
            ok &= ghost_c[None, :] | (id_c[None, :] > id_r[:, None])
            ok &= id_c[None, :] != id_r[:, None]
            ii, jj = np.nonzero(ok)
            if ii.size == 0:
                continue
            ia, ib = id_r[ii], id_c[jj]
            swap = ia > ib  # bytewise id order, as the oracle's dk < dk
            a_out.append(np.where(swap, ib, ia))
            b_out.append(np.where(swap, ia, ib))
            j_out.append(inter[ii, jj] / union[ii, jj])
        if not a_out:
            return empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(a_out), pa.string()),
                "id_b": pa.array(np.concatenate(b_out), pa.string()),
                "jaccard": pa.array(np.concatenate(j_out)),
            }
        )

    import ray

    pairs = (
        ds.map_batches(doc_sets, batch_format="pyarrow")
        .groupby("gkey")
        .map_groups(band_pairs, batch_format="pyarrow")
    )
    tabs = [ray.get(r) for r in pairs.to_arrow_refs()]
    tabs = [t for t in tabs if t.num_rows > 0]
    if not tabs:
        return empty
    out = pa.concat_tables(tabs)
    order = np.lexsort(
        (
            np.asarray(out["id_b"].to_pylist(), object),
            np.asarray(out["id_a"].to_pylist(), object),
        )
    )
    return out.take(pa.array(order))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_TOKEN_HASHES: dict = {}  # token → uint64 (Zipfian vocab; reused workers)
_TOKEN_HASHES_MAX = 1 << 20


def _token_hashes(tokens: np.ndarray) -> np.ndarray:
    """Per-token 64-bit hash = the rolling polynomial fingerprint
    (text/analysis.fingerprint64) — SQL-expressible, which makes the
    whole SimHash pipeline oracle-checkable (a blake2b here would be a
    black box to DuckDB). Memoized per worker: vocabularies are Zipfian."""
    from raycells.text.analysis import fingerprint64

    out = np.empty(len(tokens), dtype=np.uint64)
    missing = [w for w in tokens if w not in _TOKEN_HASHES]
    if missing:
        if len(_TOKEN_HASHES) + len(missing) >= _TOKEN_HASHES_MAX:
            # Eviction wipes previously-cached tokens this batch still
            # needs — recompute the FULL request, not just `missing`,
            # so the lookup loop below can never KeyError.
            _TOKEN_HASHES.clear()
            missing = list(dict.fromkeys(tokens))
        _TOKEN_HASHES.update(zip(missing, fingerprint64(missing)))
    for k, w in enumerate(tokens):
        out[k] = _TOKEN_HASHES[w]
    return out


def simhash64(texts: List[str]) -> np.ndarray:
    """64-bit token-frequency simhash per text, fully vectorized per row:
    polynomial token hashes (memoized per worker) → ±1 bit matrix →
    weighted column sums → sign bits."""
    out = np.empty(len(texts), dtype=np.uint64)
    bit_idx = np.arange(64, dtype=np.uint64)
    for k, t in enumerate(texts):
        toks = t.split()
        if not toks:
            out[k] = 0
            continue
        uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        th = _token_hashes(uniq)
        bits = (th[:, None] >> bit_idx[None, :]) & np.uint64(1)  # (T, 64)
        v = ((bits.astype(np.int64) * 2 - 1) * counts[:, None]).sum(axis=0)
        out[k] = np.uint64(((v > 0).astype(np.uint64) << bit_idx).sum())
    return out


# SWAR popcount masks (Hacker's Delight 5-2)
_PC_M1 = np.uint64(0x5555555555555555)
_PC_M2 = np.uint64(0x3333333333333333)
_PC_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_PC_H = np.uint64(0x0101010101010101)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Bit-parallel (SWAR) popcount per uint64 → uint8."""
    x = x - ((x >> np.uint64(1)) & _PC_M1)
    x = (x & _PC_M2) + ((x >> np.uint64(2)) & _PC_M2)
    x = (x + (x >> np.uint64(4))) & _PC_M4
    return ((x * _PC_H) >> np.uint64(56)).astype(np.uint8)


_HAM_BLOCK_CELLS = 256 * 1024  # ~2 MB of uint64 temporaries per block


def _hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """popcount(a ^ b) after broadcasting, as uint8. Large 2-D results
    are computed in row blocks of ~2 MB working set: a full-matrix
    uint64 temporary (or the old 64-byte-per-cell LUT gather) is
    allocation-bound on this VM's ~40× first-touch page faults —
    blocked SWAR measured ~100× faster on a 1400² bucket."""
    shape = np.broadcast_shapes(a.shape, b.shape)
    if len(shape) != 2 or int(np.prod(shape)) <= _HAM_BLOCK_CELLS:
        return _popcount64(np.bitwise_xor(a, b))
    a2 = np.broadcast_to(a, shape)
    b2 = np.broadcast_to(b, shape)
    out = np.empty(shape, dtype=np.uint8)
    blk = max(1, _HAM_BLOCK_CELLS // shape[1])
    for lo in range(0, shape[0], blk):
        hi = min(lo + blk, shape[0])
        out[lo:hi] = _popcount64(np.bitwise_xor(a2[lo:hi], b2[lo:hi]))
    return out


def simhash_chunk_params(max_hamming: int):
    """(shift, mask) per pigeonhole chunk: the 64 bits split into
    `max_hamming + 1` near-equal contiguous chunks, so any pair within
    Hamming ≤ max_hamming shares at least one exact chunk. max_hamming=3
    gives the classic four 16-bit chunks. Chunk width shrinks as 64/(r+1):
    beyond r≈8 the 7-bit buckets get dense — use a wider fingerprint
    (128-bit simhash) rather than a larger r at corpus scale."""
    nchunks = max_hamming + 1
    bounds = [(64 * c) // nchunks for c in range(nchunks + 1)]
    return [
        (bounds[c], (1 << (bounds[c + 1] - bounds[c])) - 1) for c in range(nchunks)
    ]


def simhash_near_dup_pairs(ds, col: str = "text", id_col: str = "doc_id", max_hamming: int = 3):
    """SimHash near-dup: bucket by each of `max_hamming + 1` contiguous
    bit-chunks (a pair within Hamming ≤ r of 64 bits shares ≥ 1 exact
    chunk by pigeonhole — full recall for ANY r, not just r ≤ 3),
    groupby(chunk_id, chunk_value), verify Hamming in-bucket."""
    params = simhash_chunk_params(max_hamming)
    nchunks = len(params)

    def add_chunks(batch: pa.Table) -> pa.Table:
        sh = simhash64(batch[col].to_pylist())
        ids = batch[id_col].to_pylist()
        n = len(ids)
        chunk_id = np.tile(np.arange(nchunks, dtype=np.int32), n)
        chunks = np.empty(nchunks * n, dtype=np.int64)
        for c, (shift, mask) in enumerate(params):
            chunks[c::nchunks] = (
                (sh >> np.uint64(shift)) & np.uint64(mask)
            ).astype(np.int64)
        return pa.table(
            {
                "chunk_id": pa.array(chunk_id),
                "chunk_val": pa.array(chunks),
                id_col: pa.array(np.repeat(ids, nchunks)),
                "simhash": pa.array(np.repeat(sh, nchunks).astype(np.int64)),
            }
        )

    shifts = np.array([s for s, _ in params], dtype=np.uint64)
    masks = np.array([m for _, m in params], dtype=np.uint64)

    def verify(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col].to_pylist(), dtype=object)
        sh = group["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        chunk_col = group["chunk_id"].to_numpy(zero_copy_only=False)
        a_out, b_out, d_out = [], [], []
        for rows in _iter_real_buckets(group, ["chunk_id", "chunk_val"]):
            order = rows[np.argsort(ids[rows])]
            c = int(chunk_col[rows[0]])
            # one vectorized pairwise Hamming matrix per real bucket
            sh_o = sh[order]
            ham = _hamming64(sh_o[:, None], sh_o[None, :])
            xs, ys = np.nonzero(np.triu(ham <= max_hamming, k=1))
            if xs.size == 0:
                continue
            ia, ib = order[xs], order[ys]
            sa, sb = sh[ia], sh[ib]
            # emit each pair only from its FIRST matching chunk — the
            # same pair collides in up to nchunks buckets, and dropping
            # the repeats here (vectorized) shrinks the dedup exchange
            # by ~nchunks×
            eq = ((sa[None, :] >> shifts[:, None]) & masks[:, None]) == (
                (sb[None, :] >> shifts[:, None]) & masks[:, None]
            )  # (nchunks, n_pairs)
            keep = (np.argmax(eq, axis=0) == c) & (ids[ia] != ids[ib])
            a_out.append(ids[ia][keep])
            b_out.append(ids[ib][keep])
            d_out.append(ham[xs, ys][keep].astype(np.int64))
        if not a_out:
            return pa.table(
                {
                    "id_a": pa.array([], pa.string()),
                    "id_b": pa.array([], pa.string()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(a_out), pa.string()),
                "id_b": pa.array(np.concatenate(b_out), pa.string()),
                "hamming": pa.array(np.concatenate(d_out), pa.int64()),
            }
        )

    pairs = (
        ds.map_batches(add_chunks, batch_format="pyarrow")
        .map_batches(
            lambda b, nb=scaled_buckets(): _coarse_bucket(b, ["chunk_id", "chunk_val"], nb),
            batch_format="pyarrow",
        )
        .groupby("_cbucket")
        .map_groups(verify, batch_format="pyarrow")
    )
    # no _dedupe_pairs pass: first-matching-chunk emission already
    # guarantees each pair appears exactly once (minhash still needs the
    # dedup exchange — its bands collide independently)
    return pairs


# ---------------------------------------------------------------------------
# 128-bit SimHash (two uint64 lanes — the wide-fingerprint scale path)
# ---------------------------------------------------------------------------


def simhash128(texts: List[str]) -> np.ndarray:
    """128-bit token-frequency simhash per text, as an (n, 2) uint64
    array of lanes [lo, hi]: lane 0 folds the polynomial token hash's 64
    bits (== ``simhash64``), lane 1 folds the murmur3-finalizer remix of
    that hash (sim/hll._hash64 — SQL-reproducible; the HLL oracle
    carries the exact HUGEINT recipe). The wide fingerprint is the scale
    path past max_hamming ≈ 8, where 64-bit pigeonhole chunks shrink to
    ~7 bits and the buckets get dense (simhash_chunk_params docstring)."""
    from raycells.sim.hll import _hash64

    out = np.empty((len(texts), 2), dtype=np.uint64)
    bit_idx = np.arange(64, dtype=np.uint64)
    for k, t in enumerate(texts):
        toks = t.split()
        if not toks:
            out[k] = 0
            continue
        uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        th0 = _token_hashes(uniq)
        for lane, th in enumerate((th0, _hash64(th0))):
            bits = (th[:, None] >> bit_idx[None, :]) & np.uint64(1)
            v = ((bits.astype(np.int64) * 2 - 1) * counts[:, None]).sum(axis=0)
            out[k, lane] = np.uint64(((v > 0).astype(np.uint64) << bit_idx).sum())
    return out


def simhash_chunk_params_wide(max_hamming: int, bits: int = 128):
    """(bit_lo, width) per pigeonhole chunk: the ``bits``-wide
    fingerprint splits into ``max_hamming + 1`` near-equal contiguous
    chunks, so any pair within Hamming ≤ max_hamming shares at least one
    exact chunk — the same guarantee as ``simhash_chunk_params``, over a
    fingerprint wide enough that r=12 still leaves ~9-bit chunks."""
    nchunks = max_hamming + 1
    bounds = [(bits * c) // nchunks for c in range(nchunks + 1)]
    return [(bounds[c], bounds[c + 1] - bounds[c]) for c in range(nchunks)]


def extract_chunk128(lo_lane: np.ndarray, hi_lane: np.ndarray, bit_lo: int, width: int) -> np.ndarray:
    """Bits [bit_lo, bit_lo+width) of the 128-bit word (lo_lane holds
    bits 0-63), vectorized; chunks may straddle the lane boundary."""
    mask = np.uint64((1 << width) - 1)
    if bit_lo >= 64:
        return (hi_lane >> np.uint64(bit_lo - 64)) & mask
    if bit_lo + width <= 64:
        return (lo_lane >> np.uint64(bit_lo)) & mask
    return ((lo_lane >> np.uint64(bit_lo)) | (hi_lane << np.uint64(64 - bit_lo))) & mask


def simhash128_near_dup_pairs(
    ds, col: str = "text", id_col: str = "doc_id", max_hamming: int = 12
):
    """128-bit SimHash near-dup (the r > 8 scale path): bucket by each of
    ``max_hamming + 1`` contiguous bit-chunks of the two-lane
    fingerprint (full recall for any r by pigeonhole), groupby
    (chunk_id, chunk_value), verify Hamming in-bucket as the SUM of the
    per-lane blocked-SWAR popcounts. Same one-exchange shape and
    first-matching-chunk pair emission as ``simhash_near_dup_pairs``."""
    params = simhash_chunk_params_wide(max_hamming)
    nchunks = len(params)

    def add_chunks(batch: pa.Table) -> pa.Table:
        sh = simhash128(batch[col].to_pylist())
        ids = batch[id_col].to_pylist()
        n = len(ids)
        chunk_id = np.tile(np.arange(nchunks, dtype=np.int32), n)
        chunks = np.empty(nchunks * n, dtype=np.int64)
        for c, (lo, w) in enumerate(params):
            chunks[c::nchunks] = extract_chunk128(sh[:, 0], sh[:, 1], lo, w).astype(
                np.int64
            )
        return pa.table(
            {
                "chunk_id": pa.array(chunk_id),
                "chunk_val": pa.array(chunks),
                id_col: pa.array(np.repeat(ids, nchunks)),
                "sh_lo": pa.array(np.repeat(sh[:, 0], nchunks).view(np.int64)),
                "sh_hi": pa.array(np.repeat(sh[:, 1], nchunks).view(np.int64)),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col].to_pylist(), dtype=object)
        sh_lo = group["sh_lo"].to_numpy(zero_copy_only=False).view(np.uint64)
        sh_hi = group["sh_hi"].to_numpy(zero_copy_only=False).view(np.uint64)
        chunk_col = group["chunk_id"].to_numpy(zero_copy_only=False)
        a_out, b_out, d_out = [], [], []
        for rows in _iter_real_buckets(group, ["chunk_id", "chunk_val"]):
            order = rows[np.argsort(ids[rows])]
            c = int(chunk_col[rows[0]])
            lo_o, hi_o = sh_lo[order], sh_hi[order]
            ham = _hamming64(lo_o[:, None], lo_o[None, :]).astype(np.int64)
            ham += _hamming64(hi_o[:, None], hi_o[None, :])
            xs, ys = np.nonzero(np.triu(ham <= max_hamming, k=1))
            if xs.size == 0:
                continue
            ia, ib = order[xs], order[ys]
            # first-matching-chunk emission (vectorized over the ≤ r+1
            # chunk params — same dedup as the 64-bit pipeline)
            eq = np.empty((nchunks, xs.size), dtype=bool)
            for cc, (blo, w) in enumerate(params):
                eq[cc] = extract_chunk128(sh_lo[ia], sh_hi[ia], blo, w) == (
                    extract_chunk128(sh_lo[ib], sh_hi[ib], blo, w)
                )
            keep = (np.argmax(eq, axis=0) == c) & (ids[ia] != ids[ib])
            a_out.append(ids[ia][keep])
            b_out.append(ids[ib][keep])
            d_out.append(ham[xs, ys][keep])
        if not a_out:
            return pa.table(
                {
                    "id_a": pa.array([], pa.string()),
                    "id_b": pa.array([], pa.string()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(a_out), pa.string()),
                "id_b": pa.array(np.concatenate(b_out), pa.string()),
                "hamming": pa.array(np.concatenate(d_out), pa.int64()),
            }
        )

    return (
        ds.map_batches(add_chunks, batch_format="pyarrow")
        .map_batches(
            lambda b, nb=scaled_buckets(): _coarse_bucket(
                b, ["chunk_id", "chunk_val"], nb
            ),
            batch_format="pyarrow",
        )
        .groupby("_cbucket")
        .map_groups(verify, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup (sign-LSH buckets)
# ---------------------------------------------------------------------------

EMB_QUANT = 1 << 20  # embedding quantization scale (exact in float64)


def quantize_embeddings(emb: np.ndarray) -> np.ndarray:
    """floor(x·2^20 + 0.5) per component — the 2^-20-quantized integer
    view of an embedding. Exact in both numpy and SQL (the product and
    floor are identical IEEE doubles), and integer dot products of
    quantized 64-dim vectors stay < 2^47, so every similarity derived
    from them is an exact, engine-independent function."""
    return np.floor(np.asarray(emb, dtype=np.float64) * float(EMB_QUANT) + 0.5).astype(
        np.int64
    )


def lsh_planes_int(dim: int, n_bits: int) -> np.ndarray:
    """Deterministic integer sign-LSH hyperplanes in [−2^20, 2^20]:
    murmur3-finalizer mix of the flat (dim, bit) index. The mixer
    decorrelates planes as well as RNG gaussians (measured: 73k
    in-bucket pairs on the sf0.1 embeddings vs 73k gaussian — a plain
    LCG here left planes as shifted copies of each other and produced
    1.86 M pairs), while staying an exact integer function both numpy
    and the DuckDB oracles evaluate identically."""
    from raycells.sim.hll import _hash64

    key = (
        np.arange(dim, dtype=np.int64)[:, None] * n_bits
        + np.arange(n_bits, dtype=np.int64)[None, :]
    )
    h = _hash64(key.reshape(-1)).reshape(dim, n_bits)
    return (h % np.uint64(2 * EMB_QUANT + 1)).astype(np.int64) - EMB_QUANT


def int_cosine(eq_a: np.ndarray, eq_b: np.ndarray) -> np.ndarray:
    """Cosine of quantized integer vectors: all three dot products are
    exact int64, so dab / (sqrt(na)·sqrt(nb)) is bit-identical across
    engines (quantization error vs the float cosine is ~1e-6 —
    irrelevant for near-dup thresholds, decisive for oracle parity)."""
    dab = (eq_a * eq_b).sum(axis=1).astype(np.float64)
    na = (eq_a * eq_a).sum(axis=1).astype(np.float64)
    nb = (eq_b * eq_b).sum(axis=1).astype(np.float64)
    na[na == 0] = 1.0
    nb[nb == 0] = 1.0
    return dab / (np.sqrt(na) * np.sqrt(nb))


def embedding_near_dup_pairs(
    ds,
    col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 8,
    dim: int = 64,
):
    """Near-duplicate vectors, two-phase so the exchange never carries
    embeddings (mirrors ``minhash_near_dup_pairs``):

    **Phase A — candidates.** Multi-table sign-LSH (``n_tables``
    independent ``n_planes``-plane sets — the banding trick) over the
    2^-20-QUANTIZED integer vectors with deterministic integer planes:
    every bucket bit is exact integer arithmetic, reproducible under
    retries AND by the DuckDB oracle. Emits only ``(bucket, id)`` rows;
    the coarse-bucket groupby resolves real buckets and yields
    deduplicated candidate id pairs.

    **Phase B — verify, fully distributed** (the shared
    ``_verify_join_collect`` skeleton): distributed pair dedup →
    DISTINCT-candidate-id broadcast prefilter → payloads meet pairs
    adaptively (broadcast block refs / co-partitioned hash joins) →
    integer-cosine ≥ threshold per batch. Only the verified pairs reach
    the driver. More tables → higher recall; the candidate set is
    output-sized by LSH design."""
    planes = lsh_planes_int(dim, n_planes * n_tables)

    def add_lsh_bucket(batch: pa.Table) -> pa.Table:
        eq = quantize_embeddings(np.asarray(batch[col].to_pylist(), dtype=np.float64))
        n = len(eq)
        sig = (eq @ planes > 0).astype(np.int64).reshape(n, n_tables, n_planes)
        bucket = np.zeros((n, n_tables), dtype=np.int64)
        for p in range(n_planes):
            bucket = (bucket << 1) | sig[:, :, p]
        # fold the table id into the key so tables never cross-collide
        bucket = bucket * n_tables + np.arange(n_tables, dtype=np.int64)[None, :]
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(bucket.reshape(-1)),
                id_col: pa.array(np.repeat(ids, n_tables)),
            }
        )

    def pairs_of(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        a_out, b_out = [], []
        for rows in _iter_real_buckets(group, ["bucket"]):
            uniq = np.unique(ids[rows])
            iu, ju = np.triu_indices(len(uniq), k=1)
            a_out.append(uniq[iu])
            b_out.append(uniq[ju])
        if not a_out:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(a_out).astype(np.int64)),
                "id_b": pa.array(np.concatenate(b_out).astype(np.int64)),
            }
        )

    cand = (
        ds.map_batches(add_lsh_bucket, batch_format="pyarrow")
        .map_batches(lambda b, nb=scaled_buckets(): _coarse_bucket(b, ["bucket"], nb), batch_format="pyarrow")
        .groupby("_cbucket")
        .map_groups(pairs_of, batch_format="pyarrow")
    )
    empty = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        }
    )

    def verify(batch: pa.Table) -> pa.Table:
        a_in = batch["id_a"].to_numpy(zero_copy_only=False)
        b_in = batch["id_b"].to_numpy(zero_copy_only=False)
        if len(a_in) == 0:
            return empty
        eq_a = quantize_embeddings(np.asarray(batch["vec_a"].to_pylist(), dtype=np.float64))
        eq_b = quantize_embeddings(np.asarray(batch["vec_b"].to_pylist(), dtype=np.float64))
        sims = int_cosine(eq_a, eq_b)
        hit = sims >= threshold
        return pa.table(
            {
                "id_a": pa.array(a_in[hit].astype(np.int64)),
                "id_b": pa.array(b_in[hit].astype(np.int64)),
                "cosine": pa.array(sims[hit]),
            }
        )

    out = _verify_join_collect(
        cand, ds, id_col=id_col, payload_col=col,
        payload_names=("vec_a", "vec_b"), verify_fn=verify,
        id_type=pa.int64(), empty=empty,
    )
    if out is None or out.num_rows == 0:
        return empty
    order = np.lexsort(
        (out["id_b"].to_numpy(zero_copy_only=False),
         out["id_a"].to_numpy(zero_copy_only=False))
    )
    return out.take(pa.array(order))


# ---------------------------------------------------------------------------
# exact duplicated-substring spans (strided rolling windows)
# ---------------------------------------------------------------------------


def dup_window_rows(ds, id_col="doc_id", col="text", w=None, s=None,
                    drop_canonical=False):
    """Front half of the duplicated-substring operators, id-type-generic
    (int doc ids for the tabular table, string doc keys for the
    interleaved corpus): one text scan emitting (wh, id, p) per strided
    window (O(bytes) rolling hash — analysis.strided_window_fps), then a
    hash-bucketed exchange of those narrow rows where each coarse
    bucket keeps windows whose fingerprint repeats anywhere in the
    corpus — all occurrences (span-report shape) or all but the global
    min-(id, p) canonical copy (``drop_canonical``, removal-plan
    shape; all occurrences of a fingerprint land in one bucket, so the
    bucket-local first row after an (wh, id, p) sort IS the global
    canonical). Returns the kept (id, p) Dataset."""
    from raycells.engine.shuffle import add_bucket
    from raycells.text import analysis as ta

    w = ta.SPAN_W if w is None else w
    s = ta.SPAN_S if s is None else s

    def windows(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        id_type = b.schema.field(id_col).type  # typed even when ri is
        # empty: pa.array on an empty object slice would infer NULL and
        # break block-schema stability on string-id corpora
        ri, pos, h = ta.strided_window_fps(b[col].to_pylist(), w, s)
        return pa.table(
            {
                "wh": pa.array(h.view(np.int64), pa.int64()),
                id_col: pa.array(ids[ri], id_type),
                "p": pa.array(pos, pa.int64()),
            }
        )

    nb = scaled_buckets()  # ONCE on the driver (CLAUDE.md)

    def dup_filter(g: pa.Table) -> pa.Table:
        import pandas as pd

        df = g.to_pandas().sort_values(["wh", id_col, "p"], kind="stable")
        sizes = df.groupby("wh", sort=False)["wh"].transform("size")
        keep = sizes.to_numpy() > 1
        if drop_canonical:
            wh = df["wh"].to_numpy()
            first = np.ones(len(wh), bool)
            first[1:] = wh[1:] != wh[:-1]
            keep &= ~first
        df = df.loc[keep, [id_col, "p"]]
        if len(df) == 0:
            return g.select([id_col, "p"]).slice(0, 0)
        return from_pandas_clean(df)

    return (
        ds.map_batches(windows, batch_format="pyarrow")
        .map_batches(
            lambda b, nb=nb: add_bucket(b, "wh", nb), batch_format="pyarrow"
        )
        .groupby("_bucket")
        .map_groups(dup_filter, batch_format="pyarrow")
    )


def _doc_bucket_reduce(kept, id_col, fn):
    """Back half: exchange the kept (id, p) rows on an id bucket so each
    doc's positions land in one group, then run the vectorized
    per-bucket reducer ``fn``."""
    from raycells.engine.shuffle import add_bucket

    nb = scaled_buckets()
    return (
        kept.map_batches(
            lambda b, nb=nb: add_bucket(b, id_col, nb), batch_format="pyarrow"
        )
        .groupby("_bucket")
        .map_groups(fn, batch_format="pyarrow")
    )


def _island_spans(ids: np.ndarray, ps: np.ndarray, id_col: str, w: int, s: int) -> pa.Table:
    """Merge (id, sorted-within-id position) rows into maximal
    stride-contiguous spans. Inputs MUST be sorted by (id, p)."""
    new = np.ones(len(ids), bool)
    new[1:] = (ids[1:] != ids[:-1]) | (ps[1:] - ps[:-1] != s)
    sidx = np.flatnonzero(new)
    ends = np.append(sidx[1:], len(ids))
    return pa.table(
        {
            id_col: pa.array(ids[sidx]),
            "span_start": pa.array(ps[sidx], pa.int64()),
            "span_end": pa.array(ps[ends - 1] + w, pa.int64()),
            "n_windows": pa.array(ends - sidx, pa.int64()),
        }
    )


def dup_span_report(ds, id_col="doc_id", col="text", w=None, s=None,
                    sink_dir=None, combine=False):
    """Duplicated-substring spans over any (id, text) Dataset: windows
    whose fingerprint repeats anywhere merge per doc into maximal
    stride-contiguous spans of (id, span_start, span_end, n_windows).
    Collect path returns the pa.Table sorted by (id, span_start);
    ``sink_dir`` instead STREAMS the span blocks to partitioned parquet
    (checkpoint.sink_to_parquet summary back) — span output is
    duplication-proportional, corpus-scale on a boilerplate-heavy
    crawl, so the 100-TB path never concats it on one driver heap.

    ``combine=True`` is the map-side-combined plan, exploiting two
    batch-local facts (measured on the 600k-doc scaling corpus,
    10.7 M windows):

    1. A window whose hash repeats WITHIN its batch is already proven
       duplicated — only the batch-singletons (5.4%) plus one
       representative row per batch-locally-duplicated hash need the
       global hash exchange (5.9× fewer rows through it).
    2. Every window of a doc lives in ONE batch (docs don't straddle
       batches), so a doc with NO singleton windows (78.8% of docs —
       every window locally proven) island-merges ENTIRELY map-side and
       bypasses the doc exchange (only 31% of window rows route).

    Outputs are bit-identical either way (A/B-pinned in tests and
    equality-asserted on the 553k-span scaling corpus). The direct plan
    is the DEFAULT because on this single-node box it MEASURED FASTER —
    interleaved best-of-3: direct 29.3 s vs combined 36.4 s at 32 CPUs —
    Ray's sort exchange here is per-block-fixed-cost-bound, not
    bytes-bound, so the 3-6× row diet buys nothing while the combined
    plan pays a materialize barrier + a per-batch np.unique sort
    (the CLAUDE.md "exchange-heavy pipelines" lesson, re-confirmed).
    On a multi-node cluster whose exchange is NETWORK-bound the
    combined plan's row diet is the right trade — hence kept, tested,
    and switchable."""
    from raycells.text import analysis as ta

    w = ta.SPAN_W if w is None else w
    s = ta.SPAN_S if s is None else s

    def merge_spans(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values([id_col, "p"], kind="stable")
        return _island_spans(df[id_col].to_numpy(), df["p"].to_numpy(), id_col, w, s)

    if not combine:
        kept = dup_window_rows(ds, id_col, col, w, s, drop_canonical=False)
        spans = _doc_bucket_reduce(kept, id_col, merge_spans)
        return _spans_out(spans, id_col, sink_dir)

    def windows_split(b: pa.Table) -> pa.Table:
        import pandas as pd

        dids = b[id_col].to_numpy(zero_copy_only=False)
        ri, pos, h = ta.strided_window_fps(b[col].to_pylist(), w, s)
        if len(ri) == 0:
            return pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "wh": pa.array([], pa.int64()),
                    id_col: b[id_col].slice(0, 0),
                    "p": pa.array([], pa.int64()),
                    "pe": pa.array([], pa.int64()),
                    "nw": pa.array([], pa.int64()),
                }
            )
        vals, inv, cnt = np.unique(h, return_inverse=True, return_counts=True)
        localdup = cnt[inv] > 1
        # docs with >=1 singleton window must route through the exchanges
        routed_docs = np.zeros(len(dids), bool)
        routed_docs[np.unique(ri[~localdup])] = True
        routed = routed_docs[ri]
        hi = h.view(np.int64)
        ids_w = dids[ri]
        parts = []
        # k=0: singleton occurrences (all belong to routed docs)
        m0 = ~localdup
        # k=1: confirmed occurrences of routed docs
        m1 = localdup & routed
        for k, m, whv in ((0, m0, hi[m0]), (1, m1, np.zeros(int(m1.sum()), np.int64))):
            if m.any():
                n = int(m.sum())
                parts.append(
                    pa.table(
                        {
                            "k": pa.array(np.full(n, k, np.int64)),
                            "wh": pa.array(whv, pa.int64()),
                            id_col: pa.array(ids_w[m]),
                            "p": pa.array(pos[m], pa.int64()),
                            "pe": pa.array(np.full(n, -1, np.int64)),
                            "nw": pa.array(np.full(n, -1, np.int64)),
                        }
                    )
                )
        # k=2: one representative per distinct locally-dup hash (so other
        # batches' singletons can match it) — never an occurrence (p=-1)
        rep_wh = vals[cnt > 1].view(np.int64)
        if len(rep_wh):
            parts.append(
                pa.table(
                    {
                        "k": pa.array(np.full(len(rep_wh), 2, np.int64)),
                        "wh": pa.array(rep_wh, pa.int64()),
                        id_col: pa.array(np.repeat(ids_w[:1], len(rep_wh))),
                        "p": pa.array(np.full(len(rep_wh), -1, np.int64)),
                        "pe": pa.array(np.full(len(rep_wh), -1, np.int64)),
                        "nw": pa.array(np.full(len(rep_wh), -1, np.int64)),
                    }
                )
            )
        # k=3: non-routed docs island-merge map-side (bypass both exchanges)
        m3 = localdup & ~routed
        if m3.any():
            sp = _island_spans(ids_w[m3], pos[m3], id_col, w, s)
            parts.append(
                pa.table(
                    {
                        "k": pa.array(np.full(sp.num_rows, 3, np.int64)),
                        "wh": pa.array(np.zeros(sp.num_rows, np.int64)),
                        id_col: sp[id_col],
                        "p": sp["span_start"],
                        "pe": sp["span_end"],
                        "nw": sp["n_windows"],
                    }
                )
            )
        return pa.concat_tables(parts, promote_options="none")

    wtab = ds.map_batches(windows_split, batch_format="pyarrow").materialize()

    def _empty_wtab(b: pa.Table) -> pa.Table:
        # typed empty in the wtab schema; an EMPTY block passes through
        # map_batches with the UPSTREAM (id, text) schema (the
        # block_tables lesson) — id_col is present there, so the id type
        # is preserved from the block itself
        e = pa.array([], pa.int64())
        return pa.table(
            {
                "k": e, "wh": e,
                id_col: b[id_col].slice(0, 0),
                "p": e, "pe": e, "nw": e,
            }
        )

    def pick(ks):
        def fn(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "k" not in b.column_names:
                return _empty_wtab(b)
            keep = pc.is_in(b["k"], value_set=pa.array(ks, pa.int64()))
            return b.filter(keep)
        return fn

    nb = scaled_buckets()
    from raycells.engine.shuffle import add_bucket

    def singleton_dups(g: pa.Table) -> pa.Table:
        import pandas as pd

        df = g.to_pandas()
        sizes = df.groupby("wh", sort=False)["wh"].transform("size")
        out = df.loc[(sizes.to_numpy() > 1) & (df["k"].to_numpy() == 0),
                     [id_col, "p"]]
        if len(out) == 0:
            return g.select([id_col, "p"]).slice(0, 0)
        return from_pandas_clean(out)

    ex1 = (
        wtab.map_batches(pick([0, 2]), batch_format="pyarrow")
        .map_batches(lambda b, nb=nb: add_bucket(b, "wh", nb),
                     batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(singleton_dups, batch_format="pyarrow")
    )
    confirmed = wtab.map_batches(
        lambda b: pick([1])(b).select([id_col, "p"]), batch_format="pyarrow"
    )
    spans_ex = _doc_bucket_reduce(confirmed.union(ex1), id_col, merge_spans)
    spans_direct = wtab.map_batches(
        lambda b: pick([3])(b)
        .select([id_col, "p", "pe", "nw"])
        .rename_columns([id_col, "span_start", "span_end", "n_windows"]),
        batch_format="pyarrow",
    )
    return _spans_out(spans_direct.union(spans_ex), id_col, sink_dir)


def _spans_out(spans, id_col: str, sink_dir):
    if sink_dir is not None:
        from raycells.engine.checkpoint import sink_to_parquet

        return sink_to_parquet(spans, sink_dir)
    import ray

    tabs = [t for t in (ray.get(r) for r in spans.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return None
    t = pa.concat_tables(tabs, promote_options="none")
    df = t.to_pandas().sort_values([id_col, "span_start"], kind="stable")
    return from_pandas_clean(df)


PARA_W = 8  # words per word-aligned "paragraph" segment


def paragraph_dedup_manifest(
    ds,
    id_col: str = "doc_id",
    col: str = "text",
    w: int = PARA_W,
    num_buckets: int | None = None,
    sink_dir: str | None = None,
):
    """C4-style PARAGRAPH-level exact dedup manifest (Raffel et al. C4:
    'discard all but one of any span occurring more than once'): each
    document splits into word-aligned ``w``-word segments, any segment
    occurring elsewhere in the corpus keeps only its FIRST (id, seg_idx)
    occurrence (id order = the id column's natural order — int ids sort
    numerically, string keys lexicographically), and the result is the
    per-document cleaning manifest ``(id_col, n_segs, n_kept,
    n_removed, chars_removed)``.

    Shape at scale: segmentation is map-side; exchange 1 hash-buckets
    (segment, id, idx) rows on a coarse bucket of the segment STRING
    (equal strings co-locate by construction) and each bucket reduces
    with ONE vectorized first-occurrence pass that immediately collapses
    to per-doc PARTIALS, so exchange 2 moves only O(buckets × docs)
    partial rows. Carrying segment text through exchange 1 costs
    ≈ corpus bytes ONCE and buys exact string identity (the
    fingerprint-keyed sibling is shuffle.exact_dedup_winners). The
    manifest itself is corpus-sized (one row per doc): ``sink_dir``
    streams it to partitioned parquet and returns the
    ``checkpoint.sink_to_parquet`` summary — the 100-TB path; without
    it the manifest Dataset is returned (still streaming — callers
    collect only at gate scales)."""
    import pandas as pd

    from raycells.engine import shuffle as shuffle_mod

    if num_buckets is None:
        num_buckets = shuffle_mod.scaled_buckets()  # ONCE on the driver

    def segment(b: pa.Table) -> pa.Table:
        segs: list = []
        ids: list = []
        idxs: list = []
        id_vals = b[id_col].to_numpy(zero_copy_only=False)
        for did, text in zip(id_vals, b[col].to_pylist()):
            words = text.split(" ")
            n = max(1, -(-len(words) // w))
            segs.extend(" ".join(words[i * w : (i + 1) * w]) for i in range(n))
            ids.extend([did] * n)
            idxs.append(np.arange(n, dtype=np.int64))
        return pa.table(
            {
                "seg": pa.array(segs, pa.string()),
                id_col: pa.array(ids, b.schema.field(id_col).type),
                "seg_idx": pa.array(
                    np.concatenate(idxs) if idxs else np.empty(0, np.int64)
                ),
            }
        )

    def mark(g: pa.Table) -> pa.Table:
        df = g.to_pandas().drop(columns=["_bucket"])
        df = df.sort_values(["seg", id_col, "seg_idx"], kind="stable")
        dup = (df.groupby("seg", sort=False).cumcount() > 0).to_numpy()
        nch = df["seg"].str.len().to_numpy().astype(np.int64)
        part = (
            pd.DataFrame(
                {
                    id_col: df[id_col].to_numpy(),
                    "n_segs": np.ones(len(df), np.int64),
                    "n_removed": dup.astype(np.int64),
                    "chars_removed": np.where(dup, nch, 0),
                }
            )
            .groupby(id_col, sort=False)
            .sum()
            .reset_index()
        )
        return from_pandas_clean(part)

    def fold(g: pa.Table) -> pa.Table:
        df = g.to_pandas().drop(columns=["_bucket"])
        out = df.groupby(id_col, sort=False).sum().reset_index()
        out["n_kept"] = out["n_segs"] - out["n_removed"]
        return from_pandas_clean(
            out[[id_col, "n_segs", "n_kept", "n_removed", "chars_removed"]]
        )

    parts = (
        ds.map_batches(segment, batch_format="pyarrow")
        .map_batches(
            lambda b, nb=num_buckets: shuffle_mod.add_bucket(b, "seg", nb),
            batch_format="pyarrow",
        )
        .groupby("_bucket")
        .map_groups(mark, batch_format="pyarrow")
    )
    manifest = (
        parts.map_batches(
            lambda b, nb=num_buckets: shuffle_mod.add_bucket(b, id_col, nb),
            batch_format="pyarrow",
        )
        .groupby("_bucket")
        .map_groups(fold, batch_format="pyarrow")
    )
    if sink_dir is not None:
        from raycells.engine.checkpoint import sink_to_parquet

        return sink_to_parquet(manifest, sink_dir)
    return manifest
