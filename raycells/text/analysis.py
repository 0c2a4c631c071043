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


def fingerprint64(texts: Sequence[str]) -> np.ndarray:
    """64-bit rolling polynomial hash per text (deterministic content
    fingerprint; identical text ⇒ identical fingerprint).

    h = seed·B^n + Σ byte[i]·B^(n-1-i)  (mod 2^64) — evaluated with one
    vectorized power table + dot product per row, not a per-byte loop.
    """
    out = np.empty(len(texts), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k, t in enumerate(texts):
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
            n = b.size
            if n == 0:
                out[k] = _FP_SEED
                continue
            pows = np.empty(n, dtype=np.uint64)
            pows[0] = np.uint64(1)
            if n > 1:
                np.multiply.accumulate(
                    np.full(n - 1, _FP_BASE, dtype=np.uint64), out=pows[1:]
                )
            acc = (b * pows[::-1]).sum(dtype=np.uint64)
            seed_term = np.uint64(_FP_SEED) * np.uint64(pow(int(_FP_BASE), n, 1 << 64))
            out[k] = seed_term + acc
    return out


def add_fingerprints(batch: pa.Table, col: str = "text") -> pa.Table:
    fps = fingerprint64(batch[col].to_pylist())
    return batch.append_column("fingerprint", pa.array(fps, pa.uint64()))
