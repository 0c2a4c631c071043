"""Mergeable Bloom filter — approximate-membership semi-join sketch.

The scale story mirrors the HLL sketch (sim/hll.py): per-batch PARTIAL
bitmaps merge with bitwise OR (order-free, retry-safe), so building the
filter over N keys moves only ``blocks × m/8`` bytes — never a key — and
probing is a broadcast of one bitmap. Bit indices come from k
SQL-reproducible integer mixes, so the DuckDB oracle reconstructs the
exact bit set and the exact bloom verdict per probe (false positives
included — the oracle pins the FP behavior, not just the true matches).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "BLOOM_M",
    "BLOOM_K",
    "MAX_BLOOM_KEY",
    "bloom_bit_indices",
    "partial_bloom",
    "bloom_probe",
]

BLOOM_M = 65536  # bits (8 KB bitmap)
BLOOM_K = 4  # hash functions
_MIX_A = 2654435761
_MIX_B = 40503
_MIX_MOD = 1000003


# key·_MIX_A must stay inside int64 for numpy/DuckDB BIGINT parity:
# numpy would wrap silently where DuckDB throws, and negative keys flip
# the % sign convention between the two engines (ADVICE r3). Callers
# with 64-bit content hashes must fold them into this range first
# (e.g. ``h >> 33``), not pass the raw int64 bit pattern.
MAX_BLOOM_KEY = (2**63 - 1) // _MIX_A


def bloom_bit_indices(keys: np.ndarray) -> np.ndarray:
    """(n, BLOOM_K) int64 bit indices: ((key·A + (j+1)·B) % 1000003)
    % 65536 — plain BIGINT arithmetic, mirrored verbatim in SQL.
    Keys must lie in [0, MAX_BLOOM_KEY]."""
    keys = np.asarray(keys, dtype=np.int64)
    if keys.size and (
        int(keys.min()) < 0 or int(keys.max()) > MAX_BLOOM_KEY
    ):
        raise ValueError(
            f"bloom keys must be in [0, {MAX_BLOOM_KEY}] for exact "
            "BIGINT parity with the SQL mix (negative keys differ in % "
            "semantics; larger keys overflow int64 silently in numpy)"
        )
    keys = keys[:, None]
    j = np.arange(1, BLOOM_K + 1, dtype=np.int64)[None, :]
    return ((keys * _MIX_A + j * _MIX_B) % _MIX_MOD) % BLOOM_M


def partial_bloom(keys: np.ndarray) -> np.ndarray:
    """One batch of keys → bool bitmap (BLOOM_M,). OR-mergeable."""
    bm = np.zeros(BLOOM_M, dtype=bool)
    if len(keys):
        bm[bloom_bit_indices(keys).ravel()] = True
    return bm


def bloom_probe(bitmap: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """bool per probe key: ALL k bits set (bloom-positive)."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    idx = bloom_bit_indices(keys)
    return bitmap[idx].all(axis=1)
