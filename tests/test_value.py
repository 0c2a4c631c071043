"""Mirror of the reference CellValue tests (/root/reference/src/value.rs:276-392)
plus pins for the semantic traps in SURVEY.md §2.2."""

import numpy as np
import pytest

from raycells import CellType, CellValue
from raycells.cells.ctype import CELL_TYPES, NarrowingError

CT = CellType


def test_cell_type():
    for ct in CELL_TYPES:
        assert CellValue(ct, 0).cell_type is ct


def test_new_from_numpy_scalar():
    assert CellValue.new(np.uint8(3)).cell_type is CT.UInt8
    assert CellValue.new(np.float32(3)).cell_type is CT.Float32
    assert CellValue.new(3.0).cell_type is CT.Float64
    assert CellValue.new(3).cell_type is CT.Int64


def test_get():
    # value.rs:294-310: get as own type and as f64 always works
    for ct in CELL_TYPES:
        cv = CellValue(ct, 0)
        assert cv.get(ct) == 0
        assert cv.get(CT.Float64) == 0.0


def test_convert():
    # value.rs:313-329
    assert CellValue(CT.UInt8, 43).convert(CT.Int16).value == 43
    assert CellValue(CT.UInt8, 43).convert(CT.Int16).cell_type is CT.Int16
    with pytest.raises(NarrowingError):
        CellValue(CT.Float32, 3.11111).convert(CT.Int32)
    same = CellValue(CT.Float32, 3.11111).convert(CT.Float32)
    assert same.cell_type is CT.Float32
    r = CellValue(CT.UInt16, 33).convert(CT.Float32)
    assert r.cell_type is CT.Float32 and r.value == 33.0


def test_unify():
    a = CellValue(CT.UInt8, 1)
    b = CellValue(CT.Float32, 2.0)
    ua, ub = a.unify(b)
    assert ua.cell_type is CT.Float32 and ub.cell_type is CT.Float32


def test_unary_neg_promotion():
    # value.rs:338-346 + the Neg table value.rs:224-240
    r = -CellValue(CT.UInt8, 1)
    assert r.cell_type is CT.Int16 and r.value == -1
    r = -CellValue(CT.UInt16, 1)
    assert r.cell_type is CT.Int32 and r.value == -1
    r = -CellValue(CT.UInt32, 1)
    assert r.cell_type is CT.Float64 and r.value == -1.0
    r = -CellValue(CT.UInt64, 1)
    assert r.cell_type is CT.Float64 and r.value == -1.0
    r = -CellValue(CT.Int8, 1)
    assert r.cell_type is CT.Int8 and r.value == -1
    r = -CellValue(CT.Int16, 1)
    assert r.cell_type is CT.Int16 and r.value == -1
    r = -CellValue(CT.Float64, 1.0)
    assert r.cell_type is CT.Float64 and r.value == -1.0
    r = -CellValue(CT.Float32, 1.0)
    assert r.cell_type is CT.Float32 and r.value == -1.0


def test_binops():
    # value.rs:349-391 — and the trap: results are ALWAYS Float64 variants
    l, r = CellValue(CT.UInt8, 1), CellValue(CT.UInt8, 2)
    assert (l + r) == CellValue(CT.Float64, 3.0)
    assert (l + r).cell_type is CT.Float64
    assert (l + 2) == CellValue(CT.Float64, 3.0)
    assert (l - r) == CellValue(CT.Float64, -1.0)
    assert (r - l) == CellValue(CT.Float64, 1.0)
    assert (l * r) == CellValue(CT.Float64, 2.0)
    assert (l / r) == CellValue(CT.Float64, 0.5)
    assert (r / l) == CellValue(CT.Float64, 2.0)

    l, r = CellValue(CT.Float32, 1.0), CellValue(CT.Float32, 2.0)
    # f32 op f32 == f32 value — true via cross-type value equality, but the
    # result *variant* is Float64 (value.rs:196-207 + SURVEY §2.2 trap a)
    assert (l + r) == CellValue(CT.Float32, 3.0)
    assert (l + r).cell_type is CT.Float64


def test_cross_type_value_equality():
    # value.rs:267-273: Eq via Ord after unify
    assert CellValue(CT.Float64, 3.0) == CellValue(CT.Float32, 3.0)
    assert CellValue(CT.UInt8, 3) == CellValue(CT.Int64, 3)
    assert CellValue(CT.UInt8, 3) != CellValue(CT.Int64, 4)


def test_total_order_floats():
    nan = CellValue(CT.Float64, np.nan)
    neg_nan_bits = np.uint64(0xFFF8000000000000)  # sign-bit-set quiet NaN
    neg_nan = CellValue(CT.Float64, neg_nan_bits.view(np.float64))
    inf = CellValue(CT.Float64, np.inf)
    ninf = CellValue(CT.Float64, -np.inf)
    # NaN == NaN under total order
    assert nan == CellValue(CT.Float64, np.nan)
    # +NaN > +inf
    assert nan > inf
    # -NaN < -inf
    assert neg_nan < ninf
    # -0.0 < +0.0 under total order
    assert CellValue(CT.Float64, -0.0) < CellValue(CT.Float64, 0.0)


def test_zero_one_constants():
    assert CellValue(CT.UInt8, 0).is_zero()
    assert not CellValue(CT.UInt8, 1).is_zero()


def test_to_u64_and_zero_one_constants():
    """ToPrimitive to_u64 (num-traits parity: fractional floats truncate
    toward zero, None on negative/overflow/NaN) and the Zero/One impls
    returning UInt8 constants (value.rs:118-184)."""
    import numpy as np

    from raycells.cells.ctype import CellType, CellValue

    assert CellValue.zero() == CellValue.new(np.uint8(0))
    assert CellValue.one().cell_type == CellType.UInt8
    assert CellValue.new(np.int8(-1)).to_u64() is None
    assert CellValue.new(np.uint64(2**63)).to_u64() == 2**63
    # num-traits truncates toward zero: (3.5).to_u64() == Some(3),
    # (-0.5).to_u64() == Some(0), (-1.0).to_u64() == None
    assert CellValue.new(np.float64(3.5)).to_u64() == 3
    assert CellValue.new(np.float64(-0.5)).to_u64() == 0
    assert CellValue.new(np.float64(-1.0)).to_u64() is None
    assert CellValue.new(np.float64(3.0)).to_u64() == 3
    assert CellValue.new(np.float64(2.0**64)).to_u64() is None
    assert CellValue.new(np.float64(float("nan"))).to_u64() is None
    assert CellValue.new(np.float64(float("inf"))).to_u64() is None
