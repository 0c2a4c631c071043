"""The reference's OWN golden NDVI workload against its OWN bundled
data (no GDAL needed): `/root/reference/src/gdal/rasterband.rs:138-191`
asserts gdal_calc.py statistics over `testkit/data/*.tiff`; the minimal
TIFF reader (raycells/io/tiffreader.py) reproduces them bit-for-bit
through the erased-cell kernel path."""

import os

import numpy as np
import pytest

from raycells.io.tiffreader import read_cells, read_cells_masked

DATA = "/root/reference/testkit/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference testkit data not present"
)

# gdal_calc.py statistics pinned in rasterband.rs:151-159
GOLD_MIN = -0.1248899911993
GOLD_MAX = 0.66998345719859
GOLD_MEAN = 0.45559234941397
GOLD_STD = 0.10447748270797


def test_read_cells_golden_ndvi():
    red = read_cells(f"{DATA}/L8-Elkton-VA-B4.tiff")
    nir = read_cells(f"{DATA}/L8-Elkton-VA-B5.tiff")
    assert len(red) == 31434  # 186 × 169 (rasterband.rs / testkit)
    assert str(red.cell_type) == "UInt16"
    ndvi = (nir - red) / (nir + red)
    lo, hi = ndvi.min_max()
    assert abs(lo.to_f64() - GOLD_MIN) < 1e-8
    assert abs(hi.to_f64() - GOLD_MAX) < 1e-8
    vals = ndvi.to_vec("Float64")
    assert abs(vals.mean() - GOLD_MEAN) < 1e-8
    assert abs(vals.std() - GOLD_STD) < 1e-8


def test_read_cells_masked_golden_ndvi():
    """rasterband.rs:166-191: the nd variant's 4 nodata cells propagate
    through the band math; min/max unchanged."""
    red = read_cells_masked(f"{DATA}/L8-Elkton-VA-B4.tiff")
    nir = read_cells_masked(f"{DATA}/L8-Elkton-VA-B5-nd.tiff")
    nir_data, nir_nodata = nir.counts()
    assert nir_nodata == 4
    ndvi = (nir - red) / (nir + red)
    assert ndvi.counts() == (nir_data, nir_nodata)
    lo, hi = ndvi.min_max()
    assert abs(lo.to_f64() - GOLD_MIN) < 1e-8
    assert abs(hi.to_f64() - GOLD_MAX) < 1e-8


def test_tiff_reader_rejects_unsupported():

    from raycells.io.tiffreader import _parse_ifd

    with pytest.raises(ValueError):
        _parse_ifd(b"XX\x2a\x00garbage")


def test_windowed_resampled_read():
    """read_cells with a window/out-size mismatch resamples by nearest
    neighbor (rasterband.rs:37-43 semantics) on the real raster."""
    full = read_cells(f"{DATA}/L8-Elkton-VA-B4.tiff").data.reshape(169, 186)
    win = read_cells(
        f"{DATA}/L8-Elkton-VA-B4.tiff",
        window=(10, 20), window_size=(100, 80), out_size=(25, 20),
    ).data
    cols = 10 + np.floor((np.arange(25) + 0.5) * 100 / 25).astype(int)
    rows = 20 + np.floor((np.arange(20) + 0.5) * 80 / 20).astype(int)
    assert (win == full[rows][:, cols].reshape(-1)).all()
    ident = read_cells(
        f"{DATA}/L8-Elkton-VA-B4.tiff",
        window=(0, 0), window_size=(186, 169), out_size=(186, 169),
    ).data
    assert (ident == full.reshape(-1)).all()

    m = read_cells_masked(
        f"{DATA}/L8-Elkton-VA-B5-nd.tiff",
        window=(0, 0), window_size=(186, 169), out_size=(186, 169),
    )
    assert m.counts()[1] == 4


def test_read_cells_bilinear_window():
    """Bilinear windowed read over the reference's real chip: at exactly
    2× downscale every weight is 0.5, so each output must equal the mean
    of its 2×2 source block; a fractional (non-integer-scale) read is
    checked against a direct hand-evaluated interpolation."""
    import numpy as np

    from raycells.io.tiffreader import read_tiff
    from raycells.cells.ctype import CellType

    arr, _ = read_tiff(f"{DATA}/L8-Elkton-VA-B4.tiff")
    # 2x downscale of a 32x32 window at (8, 8)
    out = read_cells(
        f"{DATA}/L8-Elkton-VA-B4.tiff",
        window=(8, 8), window_size=(32, 32), out_size=(16, 16),
        resample="bilinear",
    )
    assert out.cell_type is CellType.Float64
    got = out.to_vec(CellType.Float64).reshape(16, 16)
    win = arr[8:40, 8:40].astype(np.float64)
    want = (win[0::2, 0::2] + win[0::2, 1::2] + win[1::2, 0::2] + win[1::2, 1::2]) / 4
    assert np.array_equal(got, want)
    # fractional scale (32 → 10): hand-evaluate one output cell
    out2 = read_cells(
        f"{DATA}/L8-Elkton-VA-B4.tiff",
        window=(8, 8), window_size=(32, 32), out_size=(10, 10),
        resample="bilinear",
    ).to_vec(CellType.Float64).reshape(10, 10)
    d = 3
    s = (d + 0.5) * 32 / 10 - 0.5  # same src coord in both axes
    x0 = int(np.floor(s)); f = s - x0
    a = arr.astype(np.float64)
    v = (1 - f) * ((1 - f) * a[8 + x0, 8 + x0] + f * a[8 + x0, 8 + x0 + 1]) + f * (
        (1 - f) * a[8 + x0 + 1, 8 + x0] + f * a[8 + x0 + 1, 8 + x0 + 1]
    )
    assert out2[d, d] == v


def test_read_cells_cubic_window():
    """Cubic (GRA_Cubic, Keys A=−0.5) windowed read over the reference's
    real chip: at exactly 2× downscale the 1-D tap weights are
    (−1, 9, 9, −1)/16, so 256·out is an integer combination of the 16
    source pixels — checked against a direct hand evaluation including
    the edge-replicated border taps."""
    import numpy as np

    from raycells.io.tiffreader import read_tiff
    from raycells.cells.ctype import CellType

    arr, _ = read_tiff(f"{DATA}/L8-Elkton-VA-B4.tiff")
    out = read_cells(
        f"{DATA}/L8-Elkton-VA-B4.tiff",
        window=(8, 8), window_size=(32, 32), out_size=(16, 16),
        resample="cubic",
    )
    assert out.cell_type is CellType.Float64
    got = out.to_vec(CellType.Float64).reshape(16, 16)
    a = arr.astype(np.int64)
    w1d = np.array([-1, 9, 9, -1], dtype=np.int64)
    for rr, cc in [(0, 0), (0, 7), (7, 0), (5, 9), (15, 15)]:
        ys = np.clip(2 * rr + np.arange(4) - 1, 0, 31) + 8
        xs = np.clip(2 * cc + np.arange(4) - 1, 0, 31) + 8
        want256 = (w1d[:, None] * w1d[None, :] * a[np.ix_(ys, xs)]).sum()
        assert got[rr, cc] * 256 == want256


def test_synth_cubic_matches_tiff_kernel():
    """The tile-store synthetic cubic read must apply the SAME kernel as
    the real-raster reader: evaluate one synthetic tile both ways."""
    import numpy as np

    from raycells.io import tilestore
    from raycells.io.tiffreader import _windowed

    seed = 4242
    arr = tilestore.synth_band_values(np.array([seed]), band=4)[0].reshape(64, 64)
    direct = _windowed(arr, (16, 16), (32, 32), (16, 16), resample="cubic")
    synth = tilestore.synth_band_window_cubic(
        np.array([seed]), 4, (16, 16), (32, 32), (16, 16)
    )[0]
    assert np.array_equal(direct, synth)


def test_read_cells_average_window():
    """Average (GRA_Average, integer-ratio) windowed read over the
    reference's real chip: each output cell must equal the exact box
    mean of its fx×fy source block; non-integer factors are rejected."""
    import numpy as np
    import pytest as _pytest

    from raycells.io.tiffreader import read_tiff
    from raycells.cells.ctype import CellType

    arr, _ = read_tiff(f"{DATA}/L8-Elkton-VA-B4.tiff")
    out = read_cells(
        f"{DATA}/L8-Elkton-VA-B4.tiff",
        window=(8, 8), window_size=(32, 32), out_size=(8, 16),
        resample="average",
    )
    assert out.cell_type is CellType.Float64
    got = out.to_vec(CellType.Float64).reshape(16, 8)
    win = arr[8:40, 8:40].astype(np.float64)
    want = win.reshape(16, 2, 8, 4).mean(axis=(1, 3))
    assert np.array_equal(got, want)
    with _pytest.raises(ValueError):
        read_cells(
            f"{DATA}/L8-Elkton-VA-B4.tiff",
            window=(8, 8), window_size=(32, 32), out_size=(10, 10),
            resample="average",
        )


def test_synth_average_matches_tiff_kernel():
    """The tile-store synthetic average read must apply the SAME kernel
    as the real-raster reader: evaluate one synthetic tile both ways."""
    import numpy as np

    from raycells.io import tilestore
    from raycells.io.tiffreader import _windowed

    seed = 4242
    arr = tilestore.synth_band_values(np.array([seed]), band=4)[0].reshape(64, 64)
    direct = _windowed(arr, (16, 16), (32, 32), (8, 16), resample="average")
    synth = tilestore.synth_band_window_average(
        np.array([seed]), 4, (16, 16), (32, 32), (8, 16)
    )[0]
    assert np.array_equal(direct, synth)


def test_read_cells_rms_and_mode_window():
    """RMS and Mode box resamples over the reference's real chip,
    checked against direct per-block evaluations (mode tie rule:
    smallest of the tied most-frequent values)."""
    import collections

    import numpy as np

    from raycells.io.tiffreader import read_tiff
    from raycells.cells.ctype import CellType

    arr, _ = read_tiff(f"{DATA}/L8-Elkton-VA-B4.tiff")
    win = arr[8:40, 8:40].astype(np.int64)
    rms = read_cells(
        f"{DATA}/L8-Elkton-VA-B4.tiff",
        window=(8, 8), window_size=(32, 32), out_size=(8, 16),
        resample="rms",
    )
    assert rms.cell_type is CellType.Float64
    got = rms.to_vec(CellType.Float64).reshape(16, 8)
    ssq = (win * win).reshape(16, 2, 8, 4).sum(axis=(1, 3))
    assert np.array_equal(got, np.sqrt(ssq / 8.0))

    mode = read_cells(
        f"{DATA}/L8-Elkton-VA-B4.tiff",
        window=(8, 8), window_size=(32, 32), out_size=(8, 16),
        resample="mode",
    )
    got_m = mode.to_vec(CellType.Float64).reshape(16, 8).astype(np.int64)
    for rr in range(16):
        for cc in range(8):
            block = win[2 * rr : 2 * rr + 2, 4 * cc : 4 * cc + 4].ravel()
            cnt = collections.Counter(block.tolist())
            top = max(cnt.values())
            want = min(v for v, c in cnt.items() if c == top)
            assert got_m[rr, cc] == want, (rr, cc)


def test_synth_rms_mode_match_tiff_kernel():
    """The tile-store synthetic RMS/Mode reads must apply the SAME
    kernels as the real-raster reader on one synthetic tile."""
    import numpy as np

    from raycells.io import tilestore
    from raycells.io.tiffreader import _windowed

    seed = 4242
    arr = tilestore.synth_band_values(np.array([seed]), band=4)[0].reshape(64, 64)
    for alg, fn in (
        ("rms", tilestore.synth_band_window_rms),
        ("mode", tilestore.synth_band_window_mode),
    ):
        direct = _windowed(arr, (16, 16), (32, 32), (8, 16), resample=alg)
        synth = fn(np.array([seed]), 4, (16, 16), (32, 32), (8, 16))[0]
        assert np.array_equal(direct, synth), alg


def test_read_cells_cubicspline_window():
    """Cubic B-spline (GRIORA_CubicSpline) windowed read over the
    reference's real chip: at exactly 2× downscale the 1-D tap weights
    are (1, 23, 23, 1)/48, so 2304·out must round to the integer
    combination of the 16 source pixels."""
    import numpy as np

    from raycells.io.tiffreader import read_tiff
    from raycells.cells.ctype import CellType

    arr, _ = read_tiff(f"{DATA}/L8-Elkton-VA-B4.tiff")
    out = read_cells(
        f"{DATA}/L8-Elkton-VA-B4.tiff",
        window=(8, 8), window_size=(32, 32), out_size=(16, 16),
        resample="cubic_spline",
    )
    assert out.cell_type is CellType.Float64
    got = out.to_vec(CellType.Float64).reshape(16, 16)
    a = arr.astype(np.int64)
    w1d = np.array([1, 23, 23, 1], dtype=np.int64)
    for rr, cc in [(0, 0), (0, 7), (7, 0), (5, 9), (15, 15)]:
        ys = np.clip(2 * rr + np.arange(4) - 1, 0, 31) + 8
        xs = np.clip(2 * cc + np.arange(4) - 1, 0, 31) + 8
        want2304 = (w1d[:, None] * w1d[None, :] * a[np.ix_(ys, xs)]).sum()
        assert np.rint(got[rr, cc] * 2304) == want2304


def test_read_cells_lanczos_window():
    """Lanczos (GRIORA_Lanczos, a=3) windowed read over the reference's
    real chip: checked against a direct normalized windowed-sinc
    evaluation at a few output cells, including edge-replicated taps."""
    import numpy as np

    from raycells.io.tiffreader import read_tiff
    from raycells.cells.ctype import CellType

    arr, _ = read_tiff(f"{DATA}/L8-Elkton-VA-B4.tiff")
    out = read_cells(
        f"{DATA}/L8-Elkton-VA-B4.tiff",
        window=(8, 8), window_size=(32, 32), out_size=(16, 16),
        resample="lanczos",
    )
    assert out.cell_type is CellType.Float64
    got = out.to_vec(CellType.Float64).reshape(16, 16)
    a = arr.astype(np.float64)

    def lz(d):
        d = abs(d)
        if d >= 3.0:
            return 0.0
        if d < 1e-12:
            return 1.0
        return np.sinc(d) * np.sinc(d / 3.0)

    for rr, cc in [(0, 0), (7, 3), (15, 15)]:
        s = 2 * rr + 0.5  # src coord, same formula both axes at 2x
        t = 2 * cc + 0.5
        wy = np.array([lz(s - (np.floor(s) + dy - 2)) for dy in range(6)])
        wx = np.array([lz(t - (np.floor(t) + dx - 2)) for dx in range(6)])
        wy /= wy.sum()
        wx /= wx.sum()
        ys = np.clip(int(np.floor(s)) + np.arange(6) - 2, 0, 31) + 8
        xs = np.clip(int(np.floor(t)) + np.arange(6) - 2, 0, 31) + 8
        want = (wy[:, None] * wx[None, :] * a[np.ix_(ys, xs)]).sum()
        assert abs(got[rr, cc] - want) < 1e-9


def test_synth_cubicspline_matches_tiff_kernel():
    """The tile-store synthetic cubic-B-spline read must apply the SAME
    kernel as the real-raster reader (bit-exact: identical weight
    construction; accumulation differs only by order, and the 2×-scale
    rint recovery is pinned through the oracle parity test)."""
    import numpy as np

    from raycells.io import tilestore
    from raycells.io.tiffreader import _windowed

    seed = 4242
    arr = tilestore.synth_band_values(np.array([seed]), band=4)[0].reshape(64, 64)
    direct = _windowed(arr, (16, 16), (32, 32), (16, 16), resample="cubic_spline")
    synth = tilestore.synth_band_window_cubicspline(
        np.array([seed]), 4, (16, 16), (32, 32), (16, 16)
    )[0]
    assert np.allclose(direct, synth, rtol=0, atol=1e-9)
    assert np.array_equal(np.rint(direct * 2304), np.rint(synth * 2304))


def test_read_cells_rejects_unknown_resample():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_cells(
            f"{DATA}/L8-Elkton-VA-B4.tiff",
            window=(0, 0), window_size=(8, 8), out_size=(4, 4),
            resample="gauss",  # overview-only in GDAL; not supported here
        )
