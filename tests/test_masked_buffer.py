"""Mirror of MaskedCellBuffer tests
(/root/reference/src/masked/masked_buffer.rs:386-541) + the NDVI golden
workload (src/gdal/rasterband.rs:138-191) over synthetic bands."""

import numpy as np
import pytest

from raycells import (
    CellBuffer,
    CellType,
    CellValue,
    Mask,
    MaskedCellBuffer,
    NoData,
)
from raycells.cells import kernels

CT = CellType


def test_doc_example():
    # masked_buffer.rs:13-38 doc example
    buf = MaskedCellBuffer.fill_with_mask_via(4, lambda i: (np.float64(i), i % 2 == 0))
    assert buf.mask == Mask([True, False, True, False])
    assert buf.counts() == (2, 2)
    ones = MaskedCellBuffer.from_vec(np.ones(4, dtype=np.float64))
    r = (buf + ones) * 2.0
    expected = MaskedCellBuffer(
        CellBuffer.from_vec(np.array([2.0, 4.0, 6.0, 8.0])),
        Mask([True, False, True, False]),
    )
    assert r == expected


def test_length_mismatch_raises():
    with pytest.raises(ValueError):
        MaskedCellBuffer(CellBuffer.from_vec(np.zeros(3)), Mask([True]))


def test_from_vec_with_nodata():
    # masked_buffer.rs:413-425
    m = MaskedCellBuffer.from_vec_with_nodata(
        np.array([1.0, np.nan, 3.0, np.nan]), NoData.default()
    )
    assert list(m.mask) == [True, False, True, False]
    m2 = MaskedCellBuffer.from_vec_with_nodata(
        np.array([1.0, np.nan, 3.0, np.nan]), NoData.of(3.0)
    )
    assert list(m2.mask) == [True, True, False, True]
    # u8: default sentinel is 0
    m3 = MaskedCellBuffer.from_vec_with_nodata(
        np.array([0, 1, 2], dtype=np.uint8), NoData.default()
    )
    assert list(m3.mask) == [False, True, True]


def test_get_put_with_mask():
    m = MaskedCellBuffer.from_vec(np.arange(4, dtype=np.uint8))
    assert m.get_masked(0) == CellValue(CT.UInt8, 0)
    m.put_with_mask(1, CellValue(CT.UInt8, 9), False)
    assert m.get_masked(1) is None
    assert m.get_with_mask(1) == (CellValue(CT.UInt8, 9), False)
    # get/put ignore the mask (masked_buffer.rs:192-198)
    assert m.get(1) == CellValue(CT.UInt8, 9)


def test_to_vec_with_nodata_neg_roundtrip():
    # masked_buffer.rs:465-479: neg(u8, even-masked) → i16 with MIN sentinel
    m = MaskedCellBuffer.fill_with_mask_via(9, lambda i: (np.uint8(i), i % 2 == 0))
    n = -m
    assert n.cell_type is CT.Int16
    out = n.to_vec_with_nodata(CT.Int16, NoData.default())
    expect = [0 if i == 0 else (-i if i % 2 == 0 else -32768) for i in range(9)]
    assert list(out) == expect


def test_to_vec_with_nodata_none_leaks_payload():
    # masked_buffer.rs:143-151: NoData.none() → raw payload passes through
    m = MaskedCellBuffer(
        CellBuffer.from_vec(np.array([7, 8], dtype=np.uint8)), Mask([True, False])
    )
    out = m.to_vec_with_nodata(CT.UInt8, NoData.none())
    assert list(out) == [7, 8]
    out2 = m.to_vec_with_nodata(CT.UInt8, NoData.of(0))
    assert list(out2) == [7, 0]


def test_binary_op_mask_and_garbage_preserved():
    # masked_buffer.rs:323-350: data computed on ALL cells; mask = l & r
    l = MaskedCellBuffer(
        CellBuffer.from_vec(np.array([1.0, 100.0, 3.0])), Mask([True, False, True])
    )
    r = MaskedCellBuffer(
        CellBuffer.from_vec(np.array([1.0, 1.0, 1.0])), Mask([True, True, False])
    )
    s = l + r
    assert list(s.mask) == [True, False, False]
    # masked payload still computed: 100 + 1 = 101 under the masked slot
    assert s.buffer.data[1] == 101.0


def test_scalar_op_preserves_mask():
    m = MaskedCellBuffer(
        CellBuffer.from_vec(np.array([1.0, 2.0])), Mask([True, False])
    )
    r = m * 2.0
    assert list(r.mask) == [True, False]
    assert list(r.buffer.data) == [2.0, 4.0]


def test_convert_keeps_mask():
    m = MaskedCellBuffer(
        CellBuffer.from_vec(np.array([1, 2], dtype=np.uint8)), Mask([True, False])
    )
    c = m.convert(CT.Float64)
    assert c.cell_type is CT.Float64
    assert list(c.mask) == [True, False]


def test_masked_min_max_skips_masked():
    # masked_buffer.rs:208-217
    m = MaskedCellBuffer(
        CellBuffer.from_vec(np.array([5, 1, 9], dtype=np.uint16)),
        Mask([True, False, True]),
    )
    lo, hi = m.min_max()
    assert lo == CellValue(CT.UInt16, 5)
    assert hi == CellValue(CT.UInt16, 9)
    # all-masked → inverted sentinels
    allm = MaskedCellBuffer(
        CellBuffer.from_vec(np.array([5, 1], dtype=np.uint16)), Mask([False, False])
    )
    lo, hi = allm.min_max()
    assert lo == CT.UInt16.max_value()
    assert hi == CT.UInt16.min_value()


def test_equality_includes_masked_payload():
    # masked_buffer.rs:39 (derived PartialEq): payload under mask participates
    a = MaskedCellBuffer(
        CellBuffer.from_vec(np.array([1, 2], dtype=np.uint8)), Mask([True, False])
    )
    b = MaskedCellBuffer(
        CellBuffer.from_vec(np.array([1, 3], dtype=np.uint8)), Mask([True, False])
    )
    assert a != b  # differs only under the masked slot


def test_neg_keeps_mask():
    m = MaskedCellBuffer(
        CellBuffer.from_vec(np.array([1, 2], dtype=np.uint8)), Mask([True, False])
    )
    n = -m
    assert list(n.mask) == [True, False]
    assert n.cell_type is CT.Int16


def test_repr():
    m = MaskedCellBuffer.from_vec(np.array([1], dtype=np.uint8))
    assert repr(m).startswith("UInt8MaskedCellBuffer(")


# ---- NDVI golden workload (rasterband.rs:138-191 analogue, FIXTURES.md §5) ----

def _synth_band(seed: int, shape=(186, 169)) -> np.ndarray:
    """Deterministic uint16 Landsat-chip-like band."""
    n = shape[0] * shape[1]
    i = np.arange(n, dtype=np.int64)
    v = 1 + (seed * 2654435761 + i * 40503) % 20000
    return v.astype(np.uint16)


def test_ndvi_golden():
    red = CellBuffer.from_vec(_synth_band(4))
    nir = CellBuffer.from_vec(_synth_band(5))
    ndvi = (nir - red) / (nir + red)
    assert ndvi.cell_type is CT.Float64
    lo, hi = ndvi.min_max()
    # oracle: straight-line numpy
    r = _synth_band(4).astype(np.float64)
    n = _synth_band(5).astype(np.float64)
    expect = (n - r) / (n + r)
    assert abs(lo.to_f64() - expect.min()) < 1e-12
    assert abs(hi.to_f64() - expect.max()) < 1e-12


def test_ndvi_masked_golden():
    """Masked variant: 4 nodata cells in NIR propagate through the band math
    (rasterband.rs:166-191)."""
    red_arr = _synth_band(4)
    nir_arr = _synth_band(5).copy()
    nir_arr[[10, 500, 7000, 31000]] = 0  # 4 nodata cells, sentinel 0
    red = MaskedCellBuffer.from_vec_with_nodata(red_arr, NoData.of(0))
    nir = MaskedCellBuffer.from_vec_with_nodata(nir_arr, NoData.of(0))
    nir_data, nir_nodata = nir.counts()
    assert nir_nodata == 4

    ndvi = (nir - red) / (nir + red)
    ndvi_data, ndvi_nodata = ndvi.counts()
    assert (nir_data, nir_nodata) == (ndvi_data, ndvi_nodata)

    lo, hi = ndvi.min_max()
    valid = nir_arr != 0
    r = red_arr.astype(np.float64)[valid]
    n = nir_arr.astype(np.float64)[valid]
    expect = (n - r) / (n + r)
    assert abs(lo.to_f64() - expect.min()) < 1e-12
    assert abs(hi.to_f64() - expect.max()) < 1e-12


def test_from_buffer_and_pair_collectors():
    """From<CellBuffer> (all-true mask), FromIterator<(C,bool)> and
    Extend<(C,bool)> parity (masked_buffer.rs:250-287)."""
    import numpy as np

    from raycells import CellBuffer, MaskedCellBuffer

    m = MaskedCellBuffer.from_buffer(CellBuffer(np.array([1, 2], np.uint8)))
    assert m.counts() == (2, 0)
    p = MaskedCellBuffer.from_pairs([(np.uint8(1), True), (np.uint8(2), False)])
    assert p.counts() == (1, 1)
    p.extend_pairs([(np.uint8(3), True)])
    assert len(p) == 3 and p.counts() == (2, 1)
    assert p.get_with_mask(2) == (p.get(2), True)


def test_scalar_binop_result_owns_its_mask():
    """buffer⊗scalar must COPY the operand mask (the reference result
    owns its mask): mutating the result's mask may not leak into the
    operand (kernels.binop_masked scalar path)."""
    import numpy as np

    from raycells import CellBuffer, Mask, MaskedCellBuffer

    m = MaskedCellBuffer(
        CellBuffer(np.array([1.0, 2.0, 3.0])), Mask(np.array([True, True, False]))
    )
    r = m + 1.0
    assert not np.shares_memory(r.mask.data, m.mask.data)
    r.mask.put(0, False)
    assert m.mask.get(0) is True or m.mask.get(0) == True  # operand untouched
