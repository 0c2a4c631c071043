"""Text-analysis batch kernels over the ``documents`` table.

Every function is a ``map_batches(batch_format="pyarrow")`` body:
Arrow in → Arrow out, vectorized via ``pyarrow.compute`` / numpy; no
per-row Python in the hot path. The token / marker-count semantics are
deliberately mirrorable in ANSI SQL (DuckDB ``string_split`` +
``list_filter``) so the driver's oracle can verify them value-for-value
(`__ray_entry__.oracle_sql`).

The reference (`/root/reference`) has no string operators at all
(SURVEY.md §2.8); these are graft operators required by the
training-data-pipeline mandate (lang-ID, quality scoring, token
counting, fingerprinting).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "token_counts",
    "word_hits",
    "char_metrics",
    "quality_metrics",
    "LANG_MARKERS",
    "lang_scores",
    "lang_id",
    "fingerprint64",
    "add_fingerprints",
    "regex_token_counts",
    "chunk_fingerprints",
    "CHUNK_W",
    "CHUNK_S",
]

# quality stopwords (word-boundary exact tokens; SQL: list_filter(split, =w))
STOPWORDS = ("the", "a", "of", "and", "to")

# marker words per language for the n-gram/marker-count heuristic.
# Declaration order is the deterministic tie-break (first wins).
LANG_MARKERS: Dict[str, Tuple[str, ...]] = {
    "en": ("the", "a", "fast"),
    "de": ("agg", "hash", "join"),
    "zh": ("window", "batch", "big"),
    "fr": ("query", "order", "small"),
    "es": ("data", "row", "stream"),
}


def _split(text: pa.ChunkedArray):
    """text → (list_array, flat_tokens, parent_indices). Empty string → 1
    empty token (matches DuckDB string_split semantics)."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lst = pc.split_pattern(text, " ")
    parent = pc.list_parent_indices(lst).to_numpy(zero_copy_only=False)
    return lst, lst.flatten(), parent


def token_counts(text: pa.ChunkedArray) -> np.ndarray:
    """Whitespace token count per row; '' → 0.

    SQL mirror: CASE WHEN length(text)=0 THEN 0
                ELSE length(text) - length(replace(text,' ','')) + 1 END
    (exact for single-spaced text; multi-space runs count empty tokens on
    both sides identically because split keeps empties).
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = pc.count_substring(text, " ").to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(pc.utf8_length(text), 0).to_numpy(zero_copy_only=False)
    return np.where(nonempty, n + 1, 0).astype(np.int64)


def word_hits(text: pa.ChunkedArray, word: str) -> np.ndarray:
    """Per-row count of exact-token occurrences of ``word``.

    SQL mirror: len(list_filter(string_split(text,' '), x -> x = word)).
    """
    lst, flat, parent = _split(text)
    eq = pc.equal(flat, word).to_numpy(zero_copy_only=False)
    n = len(lst)
    return np.bincount(parent[eq], minlength=n).astype(np.int64)


def char_metrics(text: pa.ChunkedArray) -> Dict[str, np.ndarray]:
    """Vectorized per-row character stats (ASCII-oriented, regex-based so
    the DuckDB regexp_replace mirror is exact)."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
    n_alpha = (
        pc.count_substring_regex(text, "[a-zA-Z]").to_numpy(zero_copy_only=False).astype(np.int64)
    )
    n_digit = (
        pc.count_substring_regex(text, "[0-9]").to_numpy(zero_copy_only=False).astype(np.int64)
    )
    n_space = pc.count_substring(text, " ").to_numpy(zero_copy_only=False).astype(np.int64)
    return {
        "n_chars": n_chars,
        "n_alpha": n_alpha,
        "n_digit": n_digit,
        "n_space": n_space,
        "n_other": n_chars - n_alpha - n_digit - n_space,
    }


def quality_metrics(batch: pa.Table, col: str = "text") -> pa.Table:
    """Quality-scoring stage: token count, char-class counts, stopword
    hits, and the derived pass/fail flag.

    quality_ok ≔ n_tokens ≥ 5 AND alpha-ratio ≥ 0.5 AND stopword hits ≥ 1
    (a length/punct/stopword-ratio filter in the C4/Gopher style, reduced
    to SQL-mirrorable integer predicates)."""
    text = batch[col]
    m = char_metrics(text)
    toks = token_counts(text)
    stop = np.zeros(len(batch), dtype=np.int64)
    for w in STOPWORDS:
        stop += word_hits(text, w)
    ok = (toks >= 5) & (m["n_alpha"] * 2 >= m["n_chars"]) & (stop >= 1)
    out = dict(zip(batch.column_names, batch.columns))
    out.update(
        {
            "n_tokens": pa.array(toks),
            "n_alpha": pa.array(m["n_alpha"]),
            "n_other": pa.array(m["n_other"]),
            "stopword_hits": pa.array(stop),
            "quality_ok": pa.array(ok),
        }
    )
    return pa.table(out)


def lang_scores(text: pa.ChunkedArray) -> Dict[str, np.ndarray]:
    """Marker-word score per language (sum of exact-token hit counts)."""
    return {
        lang: sum(word_hits(text, w) for w in words)
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(batch: pa.Table, col: str = "text") -> pa.Table:
    """Language-ID stage: detected = argmax of marker scores, ties broken
    by LANG_MARKERS declaration order, all-zero → 'und'."""
    scores = lang_scores(batch[col])
    langs = list(scores)
    mat = np.stack([scores[l] for l in langs])  # (L, n)
    best = np.argmax(mat, axis=0)  # first max wins (declaration order)
    any_hit = mat.max(axis=0) > 0
    detected = np.where(any_hit, np.array(langs, dtype=object)[best], "und")
    out = dict(zip(batch.column_names, batch.columns))
    out["lang_detected"] = pa.array(list(detected), pa.string())
    for l in langs:
        out[f"score_{l}"] = pa.array(scores[l])
    return pa.table(out)


# ---------------------------------------------------------------------------
# document fingerprinting (rolling polynomial hash)
# ---------------------------------------------------------------------------

_FP_BASE = np.uint64(1099511628211)  # FNV-ish multiplier
_FP_SEED = np.uint64(14695981039346656037)


CHUNK_W = 200  # training-chunk window (chars)
CHUNK_S = 150  # stride (25% overlap — the standard pretraining shape)


def chunk_fingerprints(
    batch: pa.Table,
    id_col: str = "doc_id",
    col: str = "text",
    w: int = CHUNK_W,
    s: int = CHUNK_S,
) -> pa.Table:
    """Fixed ``w``-char windows at stride ``s`` per document, each chunk
    fingerprinted with the rolling polynomial hash — the map-side
    chunker shared by ``q_chunk_docs`` and the driver's chunk-dedup job.

    LENGTH-UNBOUNDED vectorized window offsets (VERDICT r4 #1): windows
    start at 0, s, 2s, … < n — ``ceil(n/s)`` chunks, min 1 (one empty
    chunk for an empty doc). Hash carried as the int64 bit pattern; the
    chunk_docs oracle re-derives it byte-for-byte in HUGEINT."""
    dks = pc.cast(batch[id_col], pa.string())
    texts = batch[col].to_pylist()
    n_docs = len(texts)
    lens = np.fromiter((len(t) for t in texts), np.int64, count=n_docs)
    n_chunks = np.maximum(1, -(-lens // s))
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_chunks)
    first = np.concatenate([[0], np.cumsum(n_chunks)[:-1]]).astype(np.int64)
    idx = np.arange(doc_of.size, dtype=np.int64) - first[doc_of]
    start = idx * s
    clen = np.minimum(w, lens[doc_of] - start)
    chunks = [texts[d][st : st + w] for d, st in zip(doc_of, start)]
    h = fingerprint64(chunks).view(np.int64)
    return pa.table(
        {
            "doc_key": pc.take(dks, pa.array(doc_of)),
            "chunk_idx": pa.array(idx, pa.int64()),
            "chunk_start": pa.array(start, pa.int64()),
            "chunk_len": pa.array(clen, pa.int64()),
            "chunk_hash": pa.array(h),
        }
    )


def fingerprint64(texts: Sequence[str]) -> np.ndarray:
    """64-bit rolling polynomial hash per text (deterministic content
    fingerprint; identical text ⇒ identical fingerprint).

    h = seed·B^n + Σ byte[i]·B^(n-1-i)  (mod 2^64) — evaluated with one
    vectorized power table + dot product per row, not a per-byte loop.
    """
    n_rows = len(texts)
    out = np.full(n_rows, _FP_SEED, dtype=np.uint64)
    if n_rows == 0:
        return out
    enc = [t.encode("utf-8") for t in texts]
    lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=n_rows)
    # Chunk rows so each vectorized working set stays ~2 MB and lands in
    # REUSED module scratch: this platform's first-touch page faults are
    # ~40× (one flat 6 M-element pass measured 15× slower than a per-row
    # loop purely from fresh-allocation faults — see CLAUDE.md).
    cum = np.cumsum(lens)
    row = 0
    while row < n_rows:
        base = cum[row - 1] if row else 0
        end = int(np.searchsorted(cum, base + _FP_CHUNK_BYTES, side="right"))
        end = max(end, row + 1)
        _fp_chunk(enc[row:end], lens[row:end], out[row:end])
        row = end
    return out


_FP_CHUNK_BYTES = 1 << 21  # ~2 MB of utf-8 bytes per vectorized chunk
_FP_SCRATCH: dict[str, np.ndarray] = {}


def _fp_scratch(name: str, n: int, dtype) -> np.ndarray:
    buf = _FP_SCRATCH.get(name)
    if buf is None or buf.size < n:
        buf = np.empty(max(n, 1 << 15), dtype)
        if name == "ar":
            # Fill BEFORE publishing to the cache: Ray cancels straggler
            # tasks with an ASYNC exception, and a kill between a
            # store-then-init pair leaves a permanently uninitialized
            # buffer in the reused warm worker — every later
            # fingerprint64 call in that worker then reads heap garbage
            # (observed: two queries failing with pointer-like np.take
            # indexes, same pid). Store-after-init is crash-safe: a
            # cancellation mid-fill just drops the local buffer.
            buf[:] = np.arange(buf.size, dtype=np.int64)
        _FP_SCRATCH[name] = buf
    return buf[:n]


def _fp_chunk(enc: list[bytes], lens: np.ndarray, out: np.ndarray) -> None:
    """Vectorized fingerprint of one row chunk, writing into ``out``
    (pre-seeded with the empty-text value). All large temporaries live in
    reused scratch; sums wrap mod 2^64 like the scalar definition."""
    total = int(lens.sum())
    if total == 0:
        return
    max_len = int(lens.max())
    pows = _fp_scratch("pows", max_len + 1, np.uint64)
    base_fill = _fp_scratch("basefill", max_len, np.uint64)
    base_fill[:] = _FP_BASE
    pows[0] = np.uint64(1)
    with np.errstate(over="ignore"):
        np.multiply.accumulate(base_fill, out=pows[1 : max_len + 1])
        starts = cum_starts = np.cumsum(lens) - lens
        flat = _fp_scratch("flat", total, np.uint64)
        np.copyto(flat, np.frombuffer(b"".join(enc), dtype=np.uint8))
        # exponent of byte i in its row = row_end - 1 - i
        ends_rep = np.repeat(cum_starts + lens, lens)  # allocator-reused size
        exps = _fp_scratch("exps", total, np.int64)
        np.subtract(ends_rep, 1, out=exps)
        np.subtract(exps, _fp_scratch("ar", total, np.int64), out=exps)
        terms = _fp_scratch("terms", total, np.uint64)
        np.take(pows, exps, out=terms)
        np.multiply(terms, flat, out=terms)
        nonempty = lens > 0
        acc = np.add.reduceat(terms, starts[nonempty], dtype=np.uint64)
        out[nonempty] = np.uint64(_FP_SEED) * pows[lens[nonempty]] + acc


def add_fingerprints(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append an int64 ``fingerprint`` column (bit pattern of the uint64
    hash — int64 keeps Ray 2.49 groupby/shuffle on native Arrow blocks;
    uint64 keys > 2^63 fall back to pickled object blocks)."""
    fps = fingerprint64(batch[col].to_pylist()).view(np.int64)
    return batch.append_column("fingerprint", pa.array(fps, pa.int64()))


# ---------------------------------------------------------------------------
# strided window fingerprints (exact duplicated-substring spans)
# ---------------------------------------------------------------------------

SPAN_W = 40  # duplicated-span window (chars)
SPAN_S = 8  # stride

# B is odd, hence invertible mod 2^64 — the rolling-prefix trick below
# hashes EVERY strided window of a whole batch in O(total_bytes) instead
# of O(windows × W): pref[j] = Σ_{i<j} byte[i]·B^{-i_local}, and the
# window at local pos p is B^{W-1+p}·(pref[p+W] − pref[p]) + seed·B^W.
_FP_BASE_INV = np.uint64(pow(int(_FP_BASE), -1, 1 << 64))


def _fp_pow_table(name: str, base: np.uint64, n: int) -> np.ndarray:
    """Grow-on-demand power table (base^0..base^{n-1} mod 2^64) in the
    reused module scratch. Built FULLY before publishing to the cache —
    Ray cancels stragglers with an async exception and a kill between a
    store-then-init pair would leave a permanently garbage table in the
    reused warm worker (the fp-scratch crash-safety lesson)."""
    buf = _FP_SCRATCH.get(name)
    if buf is None or buf.size < n:
        size = max(n, 1 << 12)
        fresh = np.empty(size, np.uint64)
        fresh[0] = np.uint64(1)
        fresh[1:] = base
        with np.errstate(over="ignore"):
            np.multiply.accumulate(fresh, out=fresh)
        _FP_SCRATCH[name] = buf = fresh
    return buf


def strided_window_fps(
    texts: Sequence[str], w: int = SPAN_W, s: int = SPAN_S
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fingerprint of every ``w``-char window at stride ``s`` of every
    text: returns ``(row_idx, pos, h)`` flat arrays where ``h[i] ==
    fingerprint64([texts[row_idx[i]][pos[i]:pos[i]+w]])`` (the identity
    is pinned by a test). Windows never straddle texts, so one GLOBAL
    wrap-cumsum over the concatenated bytes serves every row: the
    prefix difference inside a row only spans that row's terms. ASCII
    corpora only (char == utf-8 byte), like the fingerprint oracles."""
    n_rows = len(texts)
    empty = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.uint64))
    if n_rows == 0:
        return empty
    enc = [t.encode("utf-8") for t in texts]
    lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=n_rows)
    total = int(lens.sum())
    n_win = np.maximum(lens - w, -s) // s + 1  # 0 when len < w
    total_w = int(n_win.sum())
    if total_w == 0:
        return empty
    max_len = int(lens.max())
    binv = _fp_pow_table("binv_pows", _FP_BASE_INV, max_len + 1)
    bpow = _fp_pow_table("b_pows", _FP_BASE, max_len + w + 1)
    starts = np.cumsum(lens) - lens
    with np.errstate(over="ignore"):
        flat = _fp_scratch("flat", total, np.uint64)
        np.copyto(flat, np.frombuffer(b"".join(enc), dtype=np.uint8))
        local = _fp_scratch("exps", total, np.int64)
        np.subtract(_fp_scratch("ar", total, np.int64), np.repeat(starts, lens), out=local)
        terms = _fp_scratch("terms", total, np.uint64)
        np.take(binv, local, out=terms)
        np.multiply(terms, flat, out=terms)
        pref = np.empty(total + 1, np.uint64)
        pref[0] = np.uint64(0)
        np.cumsum(terms, out=pref[1:])
        # enumerate (row, p) for every window
        wstarts = np.cumsum(n_win) - n_win
        row_idx = np.repeat(np.arange(n_rows, dtype=np.int64), n_win)
        pos = (np.arange(total_w, dtype=np.int64) - np.repeat(wstarts, n_win)) * s
        g = np.repeat(starts, n_win) + pos
        h = pref[g + w] - pref[g]
        np.multiply(h, bpow[pos + (w - 1)], out=h)
        h += np.uint64(_FP_SEED) * bpow[w]
    return row_idx, pos, h


# ---------------------------------------------------------------------------
# benchmark decontamination (token-window hashing)
# ---------------------------------------------------------------------------

_WIN_BASE = np.uint64(31)


def window_hashes(text: str, w: int = 8) -> np.ndarray:
    """64-bit hash per w-token window: Σ token_fp(tok[s+i])·31^i mod 2^64
    (token fingerprints = the SQL-expressible rolling polynomial, memoized
    per worker via dedup._token_hashes). < w tokens → no windows."""
    from raycells.text.dedup import _token_hashes

    toks = text.split(" ")
    if len(toks) < w:
        return np.empty(0, dtype=np.uint64)
    th = _token_hashes(np.asarray(toks, dtype=object))
    win = np.lib.stride_tricks.sliding_window_view(th, w)
    with np.errstate(over="ignore"):
        pows = _WIN_BASE ** np.arange(w, dtype=np.uint64)
        return (win * pows[None, :]).sum(axis=1, dtype=np.uint64)


def window_hashes_batch(
    texts: Sequence[str], w: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """Batch variant of :func:`window_hashes`: ONE vectorized window pass
    over the whole batch's concatenated token stream (tokenization stays
    per-doc, the hash kernel doesn't). Windows never cross doc
    boundaries — a flat start index is valid iff its first and last
    token share a row id. Returns ``(hashes uint64, row_index int64)``
    with rows in batch order; hash values are identical to the per-doc
    kernel."""
    from raycells.text.dedup import _token_hashes

    n = len(texts)
    empty = (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64))
    if n == 0:
        return empty
    tok_lists = [t.split(" ") for t in texts]
    lens = np.fromiter((len(tl) for tl in tok_lists), dtype=np.int64, count=n)
    total = int(lens.sum())
    if total < w:
        return empty
    flat = np.empty(total, dtype=object)
    pos = 0
    for tl in tok_lists:
        flat[pos : pos + len(tl)] = tl
        pos += len(tl)
    th = _token_hashes(flat)
    rowid = np.repeat(np.arange(n, dtype=np.int64), lens)
    win = np.lib.stride_tricks.sliding_window_view(th, w)  # (total-w+1, w)
    valid = rowid[: total - w + 1] == rowid[w - 1 :]
    with np.errstate(over="ignore"):
        pows = _WIN_BASE ** np.arange(w, dtype=np.uint64)
        h = (win[valid] * pows[None, :]).sum(axis=1, dtype=np.uint64)
    return h, rowid[: total - w + 1][valid]


# ---------------------------------------------------------------------------
# BPE-ish regex tokenization (run decomposition)
# ---------------------------------------------------------------------------


def regex_token_counts(text: pa.ChunkedArray) -> Dict[str, np.ndarray]:
    """Per-row token counts under the BPE-ish pattern
    ``[a-z]+|[0-9]+|[^a-z0-9 ]`` (letter runs, digit runs, every other
    non-space char its own token — the simplified GPT-2-style pretoken
    split for this lowercase-ASCII corpus).

    Vectorized as byte-class RUN COUNTING directly on the Arrow string
    buffer: a token count is the number of class-run starts, found with
    one shifted comparison over the whole data buffer plus a fix-up at
    string starts — no per-row Python, no materialized match lists. The
    decomposition is exactly what RE2's leftmost-longest scan of the
    alternation produces, so DuckDB ``regexp_extract_all`` lengths match
    integer-for-integer. Falls back to a compiled re scan if a batch
    contains non-ASCII bytes (where byte-class != char-class).

    Returns {"tokens", "alpha", "digit", "punct"} int64 arrays.
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    if pa.types.is_large_string(text.type):
        text = text.cast(pa.string())
    n = len(text)
    off = np.frombuffer(text.buffers()[1], np.int32)[
        text.offset : text.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(text.buffers()[2], np.uint8)
    seg = data[off[0] : off[-1]]
    if seg.size and (seg >= 128).any():  # non-ASCII → exact re fallback
        import re

        pat = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9 ]")
        al = re.compile(r"[a-z]+")
        dg = re.compile(r"[0-9]+")
        pu = re.compile(r"[^a-z0-9 ]")
        rows = text.to_pylist()
        return {
            "tokens": np.array([len(pat.findall(s)) for s in rows], np.int64),
            "alpha": np.array([len(al.findall(s)) for s in rows], np.int64),
            "digit": np.array([len(dg.findall(s)) for s in rows], np.int64),
            "punct": np.array([len(pu.findall(s)) for s in rows], np.int64),
        }
    letter = (data >= 97) & (data <= 122)
    digit = (data >= 48) & (data <= 57)
    punct = ~(letter | digit | (data == 32))
    letter_start = letter.copy()
    digit_start = digit.copy()
    letter_start[1:] &= ~letter[:-1]
    digit_start[1:] &= ~digit[:-1]
    first = off[:-1][off[:-1] < off[1:]]  # first byte of each non-empty row
    letter_start[first] = letter[first]
    digit_start[first] = digit[first]

    def row_sums(flags: np.ndarray) -> np.ndarray:
        cum = np.concatenate(([0], np.cumsum(flags, dtype=np.int64)))
        return cum[off][1:] - cum[off][:-1]

    alpha = row_sums(letter_start)
    dig = row_sums(digit_start)
    pun = row_sums(punct)
    return {"tokens": alpha + dig + pun, "alpha": alpha, "digit": dig, "punct": pun}


def lev1_pairs_mask(A: np.ndarray, B: np.ndarray, width: int = 16) -> np.ndarray:
    """Exact Levenshtein ≤ 1 for aligned candidate pairs, fully
    vectorized (no DP): lev(a,b) ≤ 1 ⟺ |la−lb| ≤ 1 AND longest common
    prefix + longest common suffix ≥ max(la,lb) − 1. The two overlap
    lengths come from fixed-width char matrices (left-aligned for the
    prefix, right-aligned for the suffix, '\\x01' fill — never a token
    char), each capped at min(la,lb). Property-tested against a
    reference DP (tests/test_text.py). Words longer than ``width``
    raise rather than silently truncate."""
    a, b = A.astype(str), B.astype(str)
    la, lb = np.char.str_len(a), np.char.str_len(b)
    if len(a) and max(int(la.max()), int(lb.max())) > width:
        raise ValueError(f"token longer than width={width}")
    lmin = np.minimum(la, lb)
    al = a.astype(f"U{width}").view("U1").reshape(len(a), width)
    bl = b.astype(f"U{width}").view("U1").reshape(len(b), width)
    p = np.minimum((al == bl).cumprod(axis=1).sum(axis=1), lmin)
    ar = np.char.rjust(a, width, "\x01").astype(f"U{width}").view("U1")
    br = np.char.rjust(b, width, "\x01").astype(f"U{width}").view("U1")
    ar = ar.reshape(len(a), width)
    br = br.reshape(len(b), width)
    s = np.minimum((ar == br)[:, ::-1].cumprod(axis=1).sum(axis=1), lmin)
    return (np.abs(la - lb) <= 1) & (p + s >= np.maximum(la, lb) - 1)
