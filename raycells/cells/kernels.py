"""Vectorized numpy kernels for erased-cell buffer operations.

These are the hot-path kernels used inside ``Dataset.map_batches`` stages;
they operate on whole numpy arrays (one tile = one 1-D array) and preserve
the reference semantics exactly:

- ``convert``: widening-only whole-buffer cast (buffer.rs:150-167).
- binary ``+ - * /``: computed in float64, result cell type is ALWAYS
  Float64 (value.rs:196-222 via buffer.rs:321-344); length-mismatched
  operands silently truncate to the shorter (zip semantics,
  buffer.rs:327).
- ``neg``: sign-promoting (u8→i16, u16→i32, u32/u64→f64; value.rs:224-240).
- ``min_max``: fold seeded with inverted sentinels ``(max_value,
  min_value)`` so an empty (or fully masked) buffer returns them
  (buffer.rs:169-173, masked_buffer.rs:208-217); float comparison is IEEE
  total order (value.rs:260-261) so a positive NaN wins max.
- nodata→mask and mask→nodata round-trips with NaN-aware equality
  (masked_buffer.rs:62-71,137-152).
- masked binary ops compute on ALL cells (masked payloads included) and
  AND the masks (masked_buffer.rs:323-350).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from raycells.cells.ctype import (
    CellType,
    CellValue,
    NarrowingError,
    NoData,
)

__all__ = [
    "convert",
    "binop",
    "binop_masked",
    "neg",
    "total_order_key",
    "min_max",
    "mask_from_nodata",
    "to_nodata",
    "pack_mask",
    "unpack_mask",
]


def convert(arr: np.ndarray, dst: CellType) -> np.ndarray:
    """Widening-only whole-buffer conversion; raises NarrowingError otherwise."""
    src = CellType.from_dtype(arr.dtype)
    if src is dst:
        return arr
    if not src.can_fit_into(dst):
        raise NarrowingError(src, dst)
    return arr.astype(dst.dtype)


_BINOPS = {
    "add": np.add,
    "sub": np.subtract,
    "mul": np.multiply,
    "div": np.true_divide,
    "+": np.add,
    "-": np.subtract,
    "*": np.multiply,
    "/": np.true_divide,
}


def binop(a: np.ndarray, b, op: str) -> np.ndarray:
    """Elementwise op; output is always float64 (the reference promotes every
    math op to f64 — value.rs:196-207). ``b`` may be an array or a scalar.
    Length-mismatched arrays truncate to the shorter operand (zip
    semantics, buffer.rs:327)."""
    f = _BINOPS[op]
    if isinstance(b, np.ndarray):
        n = min(a.shape[0], b.shape[0])
        a, b = a[:n], b[:n]
        b = b.astype(np.float64, copy=False)
    elif isinstance(b, CellValue):
        b = float(b.value)
    with np.errstate(divide="ignore", invalid="ignore"):
        return f(a.astype(np.float64, copy=False), b)


def binop_masked(
    a: np.ndarray,
    amask: np.ndarray,
    b,
    bmask: Optional[np.ndarray],
    op: str,
) -> Tuple[np.ndarray, np.ndarray]:
    """Masked binary op: data computed on all cells (garbage in, garbage
    preserved — masked_buffer.rs:329-334); result mask = lmask & rmask for
    buffer⊗buffer, unchanged for buffer⊗scalar (masked_buffer.rs:351-364)."""
    out = binop(a, b, op)
    if bmask is None:
        # copy: the result must own its mask, not alias the operand's
        mask = amask[: out.shape[0]].copy()
    else:
        n = out.shape[0]
        mask = amask[:n] & bmask[:n]
    return out, mask


def neg(arr: np.ndarray) -> np.ndarray:
    """Sign-promoting elementwise negation (value.rs:224-240)."""
    from raycells.cells.ctype import NEG_TYPE

    src = CellType.from_dtype(arr.dtype)
    dst = NEG_TYPE[src.value]
    return -arr.astype(dst.dtype, copy=False)


def total_order_key(arr: np.ndarray) -> np.ndarray:
    """IEEE-754 totalOrder sort key for a float array; identity for ints.

    -NaN < -inf < ... < -0 < +0 < ... < +inf < +NaN. Returned as unsigned
    ints of the same width that sort in that order.
    """
    if arr.dtype.kind in "ui":
        return arr
    if arr.dtype == np.float32:
        u = arr.view(np.uint32)
        sign = np.uint32(1) << np.uint32(31)
    else:
        u = arr.view(np.uint64)
        sign = np.uint64(1) << np.uint64(63)
    neg_mask = (u & sign) != 0
    return np.where(neg_mask, ~u, u | sign)


def min_max(
    arr: np.ndarray, mask: Optional[np.ndarray] = None
) -> Tuple[CellValue, CellValue]:
    """Reference ``min_max`` fold: seeded with ``(ct.max_value, ct.min_value)``
    sentinels which PARTICIPATE in the comparison (buffer.rs:169-173) — an
    empty/all-masked buffer returns the inverted sentinels, and e.g. +inf
    cannot beat the f32 finite MAX sentinel for min. Floats use total
    order: positive NaN wins max. Masked cells are skipped
    (masked_buffer.rs:208-217)."""
    ct = CellType.from_dtype(arr.dtype)
    if mask is not None:
        arr = arr[mask]
    lo_sent, hi_sent = ct.max_value(), ct.min_value()  # inverted seeds
    if arr.size == 0:
        return lo_sent, hi_sent
    if ct.is_integral:
        amin, amax = arr.min(), arr.max()
    else:
        keys = total_order_key(arr)
        amin = arr[np.argmin(keys)]
        amax = arr[np.argmax(keys)]
    vmin = CellValue(ct, amin).min(lo_sent)
    vmax = CellValue(ct, amax).max(hi_sent)
    return vmin, vmax


def _nodata_eq(arr: np.ndarray, sentinel) -> np.ndarray:
    """value == sentinel with NaN == NaN true (total-order equality)."""
    if arr.dtype.kind == "f" and np.isnan(sentinel):
        return np.isnan(arr)
    return arr == sentinel


def mask_from_nodata(arr: np.ndarray, nodata: NoData) -> np.ndarray:
    """mask[i] = not is_nodata(arr[i]) (masked_buffer.rs:62-71)."""
    ct = CellType.from_dtype(arr.dtype)
    sent = nodata.value(ct)
    if sent is None:
        return np.ones(arr.shape[0], dtype=bool)
    return ~_nodata_eq(arr, sent)


def to_nodata(
    arr: np.ndarray, mask: np.ndarray, nodata: NoData, dst: CellType
) -> np.ndarray:
    """``to_vec_with_nodata``: convert (widening-only) then substitute the
    sentinel where masked; ``NoData.none()`` leaks the raw payload through
    (masked_buffer.rs:137-152)."""
    out = convert(arr, dst)
    sent = nodata.value(dst)
    if sent is None:
        return out
    return np.where(mask, out, dst.dtype.type(sent))


def pack_mask(mask: np.ndarray) -> bytes:
    """Bit-pack a bool validity array (little-endian bit order, Arrow-style)."""
    return np.packbits(mask.astype(np.uint8), bitorder="little").tobytes()


def unpack_mask(buf: bytes, n: int) -> np.ndarray:
    return np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8), count=n, bitorder="little"
    ).astype(bool)
