"""Minimal baseline-TIFF reader — the GDAL-free raster source.

Plays ``RasterBandEx::read_cells`` / ``read_cells_masked``
(`/root/reference/src/gdal/rasterband.rs:37-126`) for real raster files:
single-band striped baseline TIFF, uncompressed, either byte order,
integer or float samples, honoring the ``GDAL_NODATA`` ASCII tag
(42113). That covers the reference's bundled Landsat chips
(`testkit/data/*.tiff` — 186×169 uint16, strip layout, nodata '0'), so
the reference's own NDVI golden statistics are reproduced against the
reference's own data with no GDAL in the environment
(tests/test_tiff_golden.py).

Deliberately NOT a general TIFF library: no compression, tiles,
palettes, or multi-sample pixels — unsupported layouts raise.
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

import numpy as np

from raycells.cells.buffer import CellBuffer, Mask, MaskedCellBuffer
from raycells.cells.ctype import NoData

__all__ = ["read_tiff", "read_cells", "read_cells_masked"]

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}


def _read_tag_values(data: bytes, bo: str, typ: int, count: int, raw: bytes):
    size = _TYPE_SIZES.get(typ, 1) * count
    if size <= 4:
        payload = raw[:size]
    else:
        off = struct.unpack(bo + "I", raw)[0]
        payload = data[off : off + size]
    if typ == 2:  # ASCII
        return payload.rstrip(b"\x00").decode("ascii")
    if typ == 7:  # UNDEFINED: opaque bytes
        return payload
    if typ in (5, 10):  # (S)RATIONAL: numerator/denominator pairs
        fmt = "II" if typ == 5 else "ii"
        flat = struct.unpack(bo + fmt * count, payload)
        return [(flat[2 * i], flat[2 * i + 1]) for i in range(count)]
    fmt = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}.get(typ)
    if fmt is None:  # unknown/BigTIFF-only type: keep raw, never crash the IFD walk
        return payload
    return list(struct.unpack(bo + fmt * count, payload))


def _parse_ifd(data: bytes) -> Tuple[dict, str]:
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    if struct.unpack(bo + "H", data[2:4])[0] != 42:
        raise ValueError("not a TIFF (bad magic)")
    off = struct.unpack(bo + "I", data[4:8])[0]
    n = struct.unpack(bo + "H", data[off : off + 2])[0]
    tags = {}
    for i in range(n):
        e = data[off + 2 + i * 12 : off + 14 + i * 12]
        tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
        tags[tag] = _read_tag_values(data, bo, typ, cnt, e[8:12])
    return tags, bo


def read_tiff(path: str) -> Tuple[np.ndarray, Optional[float]]:
    """→ (2-D array, nodata value or None)."""
    data = open(path, "rb").read()
    tags, bo = _parse_ifd(data)
    width, height = tags[256][0], tags[257][0]
    bps = tags.get(258, [1])[0]
    if tags.get(259, [1])[0] != 1:
        raise ValueError("compressed TIFF not supported")
    if tags.get(277, [1])[0] != 1:
        raise ValueError("multi-sample TIFF not supported")
    if 322 in tags or 324 in tags:
        raise ValueError("tiled TIFF not supported")
    fmt = tags.get(339, [1])[0]  # 1 unsigned, 2 signed, 3 float
    dtype = np.dtype(
        {1: f"u{bps // 8}", 2: f"i{bps // 8}", 3: f"f{bps // 8}"}[fmt]
    ).newbyteorder(bo)
    offsets = tags[273]
    counts = tags[279]
    rows_per_strip = tags.get(278, [height])[0]
    rows = []
    for k, (o, c) in enumerate(zip(offsets, counts)):
        n_rows = min(rows_per_strip, height - k * rows_per_strip)
        strip = np.frombuffer(data, dtype=dtype, count=n_rows * width, offset=o)
        rows.append(strip.reshape(n_rows, width))
    arr = np.vstack(rows).astype(dtype.newbyteorder("="))
    nodata = None
    if 42113 in tags:  # GDAL_NODATA ascii tag
        try:
            nodata = float(tags[42113].strip())
        except ValueError:
            pass
    return arr, nodata


def _windowed(arr: np.ndarray, window, window_size, out_size, resample="nearest") -> np.ndarray:
    """Windowed resampled read — the full ``read_cells(window,
    window_size, size, e_resample_alg)`` semantics
    (/root/reference/src/gdal/rasterband.rs:37-43,82-103).

    ``nearest`` (GDAL default): source index floor((dst + 0.5) · w / ow),
    same mapping as ``tilestore.window_indices``. ``bilinear``
    (GRA_Bilinear): src = (dst + 0.5) · scale − 0.5 with edge-replicate
    clamping. ``cubic`` (GRA_Cubic): 4×4 cubic convolution over the
    same src mapping (weights in ``_cubic_weights``). ``cubic_spline``
    (GRIORA_CubicSpline): 4×4 cubic B-spline smoothing over the same
    taps. ``lanczos`` (GRIORA_Lanczos): 6×6 windowed sinc (a = 3),
    weights normalized per output. ``average``
    (GRA_Average): exact box mean per output cell (integer scale
    factors only). ``rms`` (GRIORA_RMS): sqrt of the box mean of
    squares (integer factors only). ``mode`` (GRIORA_Mode): the box's
    most frequent value, smallest-on-tie (a deterministic refinement of
    GDAL's unspecified tie order), keeping the source dtype like
    ``nearest``. The interpolating
    variants return float64 (interpolation is float math — callers
    convert back through the cell lattice if an integer buffer is
    wanted, which is where our API deviates from GDAL's silent
    round-to-band-type)."""
    (c0, r0), (w, h), (ow, oh) = window, window_size, out_size
    if resample == "nearest":
        cols = c0 + np.floor((np.arange(ow) + 0.5) * w / ow).astype(np.int64)
        rows = r0 + np.floor((np.arange(oh) + 0.5) * h / oh).astype(np.int64)
        return arr[rows[:, None], cols[None, :]].reshape(-1)
    if resample == "bilinear":
        sx = (np.arange(ow) + 0.5) * w / ow - 0.5
        sy = (np.arange(oh) + 0.5) * h / oh - 0.5
        x0f = np.floor(sx).astype(np.int64)
        y0f = np.floor(sy).astype(np.int64)
        fx = sx - x0f
        fy = sy - y0f
        x0 = c0 + np.clip(x0f, 0, w - 1)
        x1 = c0 + np.clip(x0f + 1, 0, w - 1)
        y0 = r0 + np.clip(y0f, 0, h - 1)
        y1 = r0 + np.clip(y0f + 1, 0, h - 1)
        a = arr.astype(np.float64)
        top = (1.0 - fx)[None, :] * a[y0[:, None], x0[None, :]] + fx[None, :] * a[
            y0[:, None], x1[None, :]
        ]
        bot = (1.0 - fx)[None, :] * a[y1[:, None], x0[None, :]] + fx[None, :] * a[
            y1[:, None], x1[None, :]
        ]
        return ((1.0 - fy)[:, None] * top + fy[:, None] * bot).reshape(-1)
    if resample in ("cubic", "cubic_spline", "lanczos"):
        wfn, rad = {
            "cubic": (_cubic_weights, 1),
            "cubic_spline": (_bspline_weights, 1),
            "lanczos": (_lanczos_weights, 2),
        }[resample]
        taps = 2 * rad + 2
        sx = (np.arange(ow) + 0.5) * w / ow - 0.5
        sy = (np.arange(oh) + 0.5) * h / oh - 0.5
        x0f = np.floor(sx).astype(np.int64)
        y0f = np.floor(sy).astype(np.int64)
        wx = wfn(sx - x0f)  # (taps, ow)
        wy = wfn(sy - y0f)  # (taps, oh)
        a = arr.astype(np.float64)
        out = np.zeros((oh, ow))
        for dy in range(taps):
            yy = r0 + np.clip(y0f + dy - rad, 0, h - 1)
            row = np.zeros((oh, ow))
            for dx in range(taps):
                xx = c0 + np.clip(x0f + dx - rad, 0, w - 1)
                row += wx[dx][None, :] * a[yy[:, None], xx[None, :]]
            out += wy[dy][:, None] * row
        return out.reshape(-1)
    if resample in ("average", "rms", "mode"):
        # Box-reduction algorithms, integer-ratio case: each output
        # cell reduces its exact fx×fy source block. GDAL's general
        # case weights fractional edge coverage; we support the
        # exact-tiling ratios (ow | w and oh | h) and reject the rest
        # loudly rather than approximate.
        if w % ow or h % oh:
            raise ValueError(
                f"{resample} resample needs integer scale factors "
                f"(window {w}x{h} -> out {ow}x{oh})"
            )
        fx, fy = w // ow, h // oh
        win = arr[r0 : r0 + h, c0 : c0 + w]
        if resample == "average":
            a = win.astype(np.float64)
            return a.reshape(oh, fy, ow, fx).mean(axis=(1, 3)).reshape(-1)
        if resample == "rms":
            a = win.astype(np.float64)
            return np.sqrt(
                (a * a).reshape(oh, fy, ow, fx).mean(axis=(1, 3))
            ).reshape(-1)
        # mode: sort each block, count runs of equal values; argmax of
        # run length lands on the FIRST (= smallest) tied value.
        k = fy * fx
        blocks = (
            win.reshape(oh, fy, ow, fx).transpose(0, 2, 1, 3).reshape(oh, ow, k)
        )
        return _block_mode(blocks).reshape(-1)
    raise ValueError(f"unsupported resample algorithm: {resample!r}")


def _block_mode(blocks: np.ndarray) -> np.ndarray:
    """Mode along the last axis of ``blocks`` (…, k), smallest value on
    a count tie. Vectorized: sort, assign run ids to equal-value runs,
    count run lengths by one-hot sum, argmax over positions (first hit
    in sorted order = smallest tied value). Rows are processed in ~2 MB
    chunks: the (rows, k, k) one-hot temporary was ~65 MB for a full
    task batch, and this platform's allocation/first-touch costs made
    the whole-batch pass 2-3× slower than chunked (CLAUDE.md)."""
    k = blocks.shape[-1]
    flat = blocks.reshape(-1, k)
    n = flat.shape[0]
    step = max(1, (1 << 21) // max(1, k * k * 8))
    out = np.empty(n, dtype=blocks.dtype)
    for lo in range(0, n, step):
        s = np.sort(flat[lo : lo + step], axis=-1)
        rid = np.zeros(s.shape, dtype=np.int64)
        np.cumsum(s[..., 1:] != s[..., :-1], axis=-1, out=rid[..., 1:])
        counts = (rid[..., :, None] == np.arange(k)).sum(axis=-2)  # per run
        per_elem = np.take_along_axis(counts, rid, axis=-1)
        best = np.argmax(per_elem, axis=-1)
        out[lo : lo + step] = np.take_along_axis(s, best[..., None], axis=-1)[
            ..., 0
        ]
    return out.reshape(blocks.shape[:-1])


def _cubic_weights(t: np.ndarray) -> np.ndarray:
    """(4, n) GDAL GRA_Cubic tap weights (4-point cubic convolution,
    Keys kernel with A = −0.5 — Catmull-Rom) for fractional offsets
    ``t`` ∈ [0, 1); taps sit at floor−1 … floor+2, edge-replicated.
    At t = 0.5 (exact 2× downscale) the weights are exactly
    (−1, 9, 9, −1)/16, so 256·out is an integer combination of the 16
    source pixels — the property the DuckDB oracle exploits."""
    return np.stack(
        [
            ((-0.5 * t + 1.0) * t - 0.5) * t,
            (1.5 * t - 2.5) * t * t + 1.0,
            ((-1.5 * t + 2.0) * t + 0.5) * t,
            (0.5 * t - 0.5) * t * t,
        ]
    )


def _bspline_weights(t: np.ndarray) -> np.ndarray:
    """(4, n) GRIORA_CubicSpline tap weights: the cubic B-spline basis
    B₃ evaluated at tap distances (1+t, t, 1−t, 2−t), taps at
    floor−1 … floor+2. B-splines partition unity, so no normalization.
    At t = 0.5 (exact 2× downscale) the weights are exactly
    (1, 23, 23, 1)/48 as rationals, so 2304·out is an integer
    combination of the 16 source pixels — not binary-exact in float,
    but the accumulated error is ~1e-7 of the 0.5 rint margin, which
    is how the DuckDB oracle recovers the exact integers."""
    u = 1.0 - t
    return np.stack(
        [
            u * u * u / 6.0,
            (4.0 - 6.0 * t * t + 3.0 * t * t * t) / 6.0,
            (4.0 - 6.0 * u * u + 3.0 * u * u * u) / 6.0,
            t * t * t / 6.0,
        ]
    )


def _lanczos_weights(t: np.ndarray) -> np.ndarray:
    """(6, n) GRIORA_Lanczos (a = 3) tap weights at distances
    (2+t, 1+t, t, 1−t, 2−t, 3−t), taps at floor−2 … floor+3,
    normalized to sum 1 per output (the windowed sinc does not
    partition unity). Transcendental weights — oracle-checked anyway
    (resample_lanczos): DuckDB's sin is bit-identical to numpy's on
    this platform, so the oracle mirrors this exact expression tree."""

    def lz(d: np.ndarray) -> np.ndarray:
        d = np.abs(d)
        out = np.where(
            d < 1e-12,
            1.0,
            np.sinc(d) * np.sinc(d / 3.0),
        )
        return np.where(d >= 3.0, 0.0, out)

    w = np.stack([lz(t + 2), lz(t + 1), lz(t), lz(1 - t), lz(2 - t), lz(3 - t)])
    return w / w.sum(axis=0, keepdims=True)


def read_cells(
    path: str, window=None, window_size=None, out_size=None, resample="nearest"
) -> CellBuffer:
    """``read_cells``: full raster by default; pass (window, window_size,
    out_size) for a windowed resampled read (``resample`` = "nearest",
    "bilinear", "cubic", "cubic_spline", "lanczos", "average", "rms" or
    "mode" — the full RasterIO ``e_resample_alg`` set the reference
    passes through, minus overview-only Gauss; the float-math variants
    yield a Float64 buffer, "mode" keeps the band dtype)."""
    arr, _ = read_tiff(path)
    if window is None:
        return CellBuffer(arr.reshape(-1))
    return CellBuffer(_windowed(arr, window, window_size, out_size, resample))


def read_cells_masked(
    path: str, window=None, window_size=None, out_size=None, resample="nearest"
) -> MaskedCellBuffer:
    """``read_cells_masked``: band nodata (GDAL_NODATA tag) → mask via
    ``from_vec_with_nodata``; no tag → all-valid mask. Bilinear reads
    interpolate the RAW band (nodata participates, as GDAL does without
    a mask) and mask outputs that exactly equal the nodata value."""
    arr, nodata = read_tiff(path)
    flat = (
        arr.reshape(-1)
        if window is None
        else _windowed(arr, window, window_size, out_size, resample)
    )
    if nodata is None:
        return MaskedCellBuffer(CellBuffer(flat), Mask.fill(flat.size, True))
    typed = np.array(nodata).astype(flat.dtype)
    return MaskedCellBuffer.from_vec_with_nodata(flat, NoData.of(typed))
