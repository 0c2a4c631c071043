"""Mirror of the reference CellBuffer tests (/root/reference/src/buffer.rs:453-673):
exhaustive 10-type ctor/get/put/convert matrices, the 100-pair binary-op
matrix, NaN/total-order pins, cross-type buffer ordering, debug elision."""

import numpy as np
import pytest

from raycells import CellBuffer, CellType, CellValue
from raycells.cells.ctype import CELL_TYPES, NarrowingError

CT = CellType


def bigger(ct: CT):
    """All cell types that `ct` can widen into (buffer.rs:457-459 helper)."""
    return [o for o in CELL_TYPES if ct.can_fit_into(o)]


def test_ctor_matrix():
    for ct in CELL_TYPES:
        buf = CellBuffer.with_defaults(3, ct)
        assert len(buf) == 3
        assert buf.cell_type is ct
        assert buf.get(0) == ct.zero()

        filled = CellBuffer.fill(4, ct.one())
        assert len(filled) == 4
        assert filled.get(3) == ct.one()

        via = CellBuffer.fill_via(3, lambda i: ct.dtype.type(i))
        assert via.cell_type is ct
        assert via.get(2) == CellValue(ct, 2)

        empty = CellBuffer.with_defaults(0, ct)
        assert empty.is_empty


def test_get_put_matrix():
    for ct in CELL_TYPES:
        buf = CellBuffer.with_defaults(3, ct)
        buf.put(1, ct.one())
        assert buf.get(1) == ct.one()
        assert buf.get(0) == ct.zero()
    # narrowing put fails
    buf = CellBuffer.with_defaults(3, CT.UInt8)
    with pytest.raises(NarrowingError):
        buf.put(0, CellValue(CT.Float64, 3.5))


def test_convert_widening_only_matrix():
    # buffer.rs:566-578: convert succeeds iff union(src,dst)==dst
    for src in CELL_TYPES:
        buf = CellBuffer.fill(3, src.one())
        for dst in CELL_TYPES:
            if src.can_fit_into(dst):
                out = buf.convert(dst)
                assert out.cell_type is dst
                assert out.get(0) == CellValue(dst, 1)
            else:
                with pytest.raises(NarrowingError):
                    buf.convert(dst)


def test_binary_op_matrix_all_100_pairs():
    # buffer.rs:594-614: all (lhs,rhs) pairs × 4 ops; operands fill(3, 1) and
    # fill(3, 2); expected = f64 math; result cell type always Float64.
    for lct in CELL_TYPES:
        l = CellBuffer.fill(3, lct.one())
        for rct in CELL_TYPES:
            two = CellValue(rct, 2)
            r = CellBuffer.fill(3, two)
            for op, expect in (("+", 3.0), ("-", -1.0), ("*", 2.0), ("/", 0.5)):
                got = {"+": l + r, "-": l - r, "*": l * r, "/": l / r}[op]
                assert got.cell_type is CT.Float64, (lct, rct, op)
                assert got.get(0) == CellValue(CT.Float64, expect), (lct, rct, op)


def test_scalar_rhs_ops():
    l = CellBuffer.fill(3, CT.UInt8.one())
    r = l * CellValue(CT.UInt8, 2)
    assert r.cell_type is CT.Float64
    assert r.get(2) == CellValue(CT.Float64, 2.0)


def test_zip_truncation():
    # buffer.rs:327: length-mismatched ops silently truncate to the shorter
    a = CellBuffer.from_vec(np.arange(5, dtype=np.uint8))
    b = CellBuffer.from_vec(np.arange(3, dtype=np.uint8))
    r = a + b
    assert len(r) == 3
    assert r.get(2) == CellValue(CT.Float64, 4.0)


def test_min_max():
    buf = CellBuffer.from_vec(np.array([3, 1, 2], dtype=np.uint16))
    lo, hi = buf.min_max()
    assert lo == CellValue(CT.UInt16, 1) and hi == CellValue(CT.UInt16, 3)
    assert lo.cell_type is CT.UInt16


def test_min_max_empty_inverted_sentinels():
    # buffer.rs:169-173: empty buffer returns (max_value, min_value)
    buf = CellBuffer.with_defaults(0, CT.UInt8)
    lo, hi = buf.min_max()
    assert lo == CT.UInt8.max_value()
    assert hi == CT.UInt8.min_value()


def test_min_max_nan_total_order():
    # buffer.rs:623-646: positive NaN wins max under total order
    buf = CellBuffer.from_vec(np.array([1.0, np.nan, 3.0], dtype=np.float64))
    lo, hi = buf.min_max()
    assert lo == CellValue(CT.Float64, 1.0)
    assert np.isnan(hi.value)
    # sentinel participation: a buffer holding only +inf (f32) — the finite
    # f32 MAX sentinel is smaller than +inf in total order, so min is MAX
    only_inf = CellBuffer.from_vec(np.array([np.inf], dtype=np.float32))
    lo, hi = only_inf.min_max()
    assert lo == CT.Float32.max_value()
    assert hi.value == np.float32(np.inf)


def test_neg_sign_promotion():
    buf = CellBuffer.from_vec(np.array([1, 2], dtype=np.uint8))
    r = -buf
    assert r.cell_type is CT.Int16
    assert r.get(0) == CellValue(CT.Int16, -1)
    r = -CellBuffer.from_vec(np.array([1], dtype=np.uint32))
    assert r.cell_type is CT.Float64
    r = -CellBuffer.from_vec(np.array([1.5], dtype=np.float32))
    assert r.cell_type is CT.Float32


def test_from_cell_values_first_element_rule():
    # buffer.rs:229-250
    vals = [CellValue(CT.UInt16, 5), CellValue(CT.UInt8, 3)]
    buf = CellBuffer.from_cell_values(vals)
    assert buf.cell_type is CT.UInt16
    empty = CellBuffer.from_cell_values([])
    assert empty.cell_type is CT.UInt8 and empty.is_empty
    # later element not convertible to first's type → error
    with pytest.raises(NarrowingError):
        CellBuffer.from_cell_values([CellValue(CT.UInt8, 1), CellValue(CT.Float64, 1.5)])


def test_extend():
    """Extend uses num-traits ``to_<prim>`` (buffer.rs:205-221), which is
    NOT the widening-only ``convert``: fractional floats truncate toward
    zero ((1.5f64).to_u8() == Some(1)), the exclusive float range is
    (MIN−1, MAX+1), and integer checks are exact above 2^53."""
    buf = CellBuffer.from_vec(np.array([1, 2], dtype=np.uint8))
    buf.extend([np.uint8(3), np.uint8(4)])
    assert len(buf) == 4 and buf.get(3) == CellValue(CT.UInt8, 4)
    buf.extend([np.float64(1.5), np.float64(-0.5)])  # truncate toward zero
    assert buf.get(4) == CellValue(CT.UInt8, 1)
    assert buf.get(5) == CellValue(CT.UInt8, 0)
    with pytest.raises(NarrowingError):
        buf.extend([np.float64(-1.0)])  # not > MIN−1 = −1.0
    with pytest.raises(NarrowingError):
        buf.extend([np.float64(256.0)])
    with pytest.raises(NarrowingError):
        buf.extend([np.float64(float("nan"))])
    with pytest.raises(NarrowingError):
        buf.extend([np.int16(-5)])


def test_extend_exact_above_2p53():
    """int64/uint64 extends must range-check in the INTEGER domain: an
    f64 round trip would silently corrupt or mis-judge values >= 2^53
    (r1 advice pin)."""
    big = 2**62 + 12345678901
    buf = CellBuffer.from_vec(np.array([1], dtype=np.int64))
    buf.extend([np.uint64(big)])
    assert int(buf.data[1]) == big  # exact, not the f64 rounding
    with pytest.raises(NarrowingError):
        buf.extend([np.uint64(2**63)])  # one past i64::MAX
    u = CellBuffer.from_vec(np.array([1], dtype=np.uint64))
    u.extend([np.uint64(2**64 - 1)])
    assert int(u.data[1]) == 2**64 - 1
    with pytest.raises(NarrowingError):
        u.extend([np.int64(-1)])


def test_to_vec_round_trip():
    for ct in CELL_TYPES:
        buf = CellBuffer.fill(3, ct.one())
        v = buf.to_vec(CT.Float64)
        assert v.dtype == np.float64 and list(v) == [1.0, 1.0, 1.0]


def test_cross_type_buffer_ordering():
    # buffer.rs:373-436: cell-type TAG compared first, declaration order —
    # any UInt8 buffer < any Float32 buffer regardless of values
    a = CellBuffer.from_vec(np.array([255], dtype=np.uint8))
    b = CellBuffer.from_vec(np.array([0.0], dtype=np.float32))
    assert a < b
    # same type: elementwise, then length
    c = CellBuffer.from_vec(np.array([1, 2], dtype=np.uint8))
    d = CellBuffer.from_vec(np.array([1, 3], dtype=np.uint8))
    assert c < d
    e = CellBuffer.from_vec(np.array([1, 2, 0], dtype=np.uint8))
    assert c < e  # prefix equal, shorter < longer
    assert c == CellBuffer.from_vec(np.array([1, 2], dtype=np.uint8))


def test_nan_buffer_equality_total_order():
    a = CellBuffer.from_vec(np.array([np.nan], dtype=np.float64))
    b = CellBuffer.from_vec(np.array([np.nan], dtype=np.float64))
    assert a == b  # NaN == NaN under total_cmp


def test_debug_elision():
    # lib.rs:196-207: >10 elements elide to 5 head + 5 tail
    buf = CellBuffer.from_vec(np.arange(12, dtype=np.uint8))
    s = repr(buf)
    assert s.startswith("UInt8CellBuffer(")
    assert "..." in s
    short = CellBuffer.from_vec(np.arange(3, dtype=np.uint8))
    assert "..." not in repr(short)


def test_zero_copy_wrap():
    arr = np.arange(4, dtype=np.uint16)
    buf = CellBuffer.from_vec(arr)
    assert buf.data is arr or buf.data.base is arr  # no copy
    # danger::cast equivalent: reinterpret view
    assert buf.data.view(np.uint8).shape[0] == 8
