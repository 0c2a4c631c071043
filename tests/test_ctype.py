"""Mirror of the reference CellType tests (/root/reference/src/ctype.rs:182-279)
plus the full union-lattice golden table from SURVEY.md §2.1."""

import numpy as np
import pytest

from raycells import CellType, CellValue
from raycells.cells.ctype import CELL_TYPES, CellTypeParseError, UNION_TABLE

CT = CellType

# The full 10x10 union lattice (SURVEY.md §2.1), derived from ctype.rs:99-126.
# Rows/cols in declaration order.
_L = {
    "U8": CT.UInt8, "U16": CT.UInt16, "U32": CT.UInt32, "U64": CT.UInt64,
    "I8": CT.Int8, "I16": CT.Int16, "I32": CT.Int32, "I64": CT.Int64,
    "F32": CT.Float32, "F64": CT.Float64,
}
GOLDEN = [
    # vs:    U8    U16   U32   U64   I8    I16   I32   I64   F32   F64
    ("U8", ["U8", "U16", "U32", "U64", "I16", "I16", "I32", "I64", "F32", "F64"]),
    ("U16", ["U16", "U16", "U32", "U64", "I32", "I32", "I32", "I64", "F32", "F64"]),
    ("U32", ["U32", "U32", "U32", "U64", "I64", "I64", "I64", "I64", "F64", "F64"]),
    ("U64", ["U64", "U64", "U64", "U64", "F64", "F64", "F64", "F64", "F64", "F64"]),
    ("I8", ["I16", "I32", "I64", "F64", "I8", "I16", "I32", "I64", "F32", "F64"]),
    ("I16", ["I16", "I32", "I64", "F64", "I16", "I16", "I32", "I64", "F32", "F64"]),
    ("I32", ["I32", "I32", "I64", "F64", "I32", "I32", "I32", "I64", "F64", "F64"]),
    ("I64", ["I64", "I64", "I64", "F64", "I64", "I64", "I64", "I64", "F64", "F64"]),
    ("F32", ["F32", "F32", "F64", "F64", "F32", "F32", "F64", "F64", "F32", "F64"]),
    ("F64", ["F64", "F64", "F64", "F64", "F64", "F64", "F64", "F64", "F64", "F64"]),
]


def test_union_lattice_full_table():
    for row_name, row in GOLDEN:
        a = _L[row_name]
        for b, expect in zip(CELL_TYPES, row):
            assert a.union(b) is _L[expect], f"{a}∪{b}"


def test_can_union_reference_assertions():
    # ctype.rs:188-207
    assert CT.UInt8.union(CT.UInt8) is CT.UInt8
    assert CT.UInt16.union(CT.UInt16) is CT.UInt16
    assert CT.Float32.union(CT.Float32) is CT.Float32
    assert CT.Float64.union(CT.Float64) is CT.Float64
    assert CT.Int16.union(CT.Float32) is CT.Float32
    assert CT.Float32.union(CT.Int16) is CT.Float32
    assert CT.UInt8.union(CT.UInt16) is CT.UInt16
    assert CT.Int32.union(CT.Float32) is CT.Float64


def test_union_symmetry_and_reflexivity():
    for a in CELL_TYPES:
        assert a.union(a) is a
        for b in CELL_TYPES:
            assert a.union(b) is b.union(a)


def test_can_fit_into():
    # ctype.rs:129-131: widening permitted iff union is the destination
    assert CT.UInt8.can_fit_into(CT.Int16)
    assert not CT.Int16.can_fit_into(CT.UInt8)
    assert not CT.Float64.can_fit_into(CT.Float32)
    assert CT.Float32.can_fit_into(CT.Float64)
    assert not CT.Int32.can_fit_into(CT.Float32)  # i32 → f32 loses precision
    assert CT.Int16.can_fit_into(CT.Float32)


def test_is_integral():
    assert CT.UInt8.is_integral
    assert CT.UInt16.is_integral
    assert not CT.Float32.is_integral
    assert not CT.Float64.is_integral


def test_is_signed():
    for ct in (CT.UInt8, CT.UInt16, CT.UInt32, CT.UInt64):
        assert not ct.is_signed
    for ct in (CT.Int8, CT.Int16, CT.Int32, CT.Int64, CT.Float32, CT.Float64):
        assert ct.is_signed  # floats count as signed (ctype.rs:71-84)


def test_size():
    sizes = {
        CT.Int8: 1, CT.UInt8: 1, CT.Int16: 2, CT.UInt16: 2,
        CT.Int32: 4, CT.UInt32: 4, CT.Int64: 8, CT.UInt64: 8,
        CT.Float32: 4, CT.Float64: 8,
    }
    for ct, s in sizes.items():
        assert ct.size_of == s


def test_has_min_max():
    assert CT.UInt8.min_value().value == 0
    assert CT.UInt8.max_value().value == 255
    assert CT.Int16.min_value().value == -32768
    assert CT.Int64.max_value().value == 2**63 - 1
    # floats: finite MIN, not -inf
    assert CT.Float32.min_value().value == np.finfo(np.float32).min
    assert CT.Float32.max_value().value == np.finfo(np.float32).max
    assert np.isfinite(CT.Float64.min_value().value)


def test_can_string():
    for ct in CELL_TYPES:
        assert str(ct) == ct.name
        assert CT.from_str(str(ct)) is ct
    with pytest.raises(CellTypeParseError):
        CT.from_str("UInt57")


def test_zero_one():
    for ct in CELL_TYPES:
        zero, one = ct.zero(), ct.one()
        assert (one + zero) == one  # value-based eq across types (result is f64)
        assert zero.is_zero()
        assert not one.is_zero()


def test_iter_order():
    names = [ct.name for ct in CellType.iter()]
    assert names == [
        "UInt8", "UInt16", "UInt32", "UInt64",
        "Int8", "Int16", "Int32", "Int64", "Float32", "Float64",
    ]


def test_dtype_round_trip():
    for ct in CELL_TYPES:
        assert CellType.from_dtype(ct.dtype) is ct
        assert ct.arrow_type.bit_width == ct.size_of * 8


def test_gdal_subset_and_bridges():
    """GDAL-compat narrowing (gdal/mod.rs:12-70): 7 supported types,
    unsupported raise, nodata sentinel conversion is checked."""
    from raycells.cells.ctype import (
        GDAL_CELL_TYPES,
        NoData,
        NoDataConversionError,
        UnsupportedCellTypeError,
        gdal_cell_type,
        gdal_nodata,
    )

    assert len(GDAL_CELL_TYPES) == 7
    assert {ct.name for ct in GDAL_CELL_TYPES} == {
        "UInt8", "UInt16", "UInt32", "Int16", "Int32", "Float32", "Float64",
    }
    assert gdal_cell_type("UInt16").name == "UInt16"
    for bad in ("UInt64", "Int8", "Int64"):
        with pytest.raises(UnsupportedCellTypeError):
            gdal_cell_type(bad)
    assert gdal_nodata(None, "UInt8") == NoData.default()
    assert gdal_nodata(0.0, "UInt16").value(CellType.UInt16) == 0
    with pytest.raises(NoDataConversionError):
        gdal_nodata(-1.0, "UInt16")  # unrepresentable in the band type
    with pytest.raises(NoDataConversionError):
        gdal_nodata(70000.0, "UInt16")


def test_gdal_nodata_float_saturates_like_num_traits():
    """num-traits f64→f32 always converts, saturating to ±inf (Rust `as`
    cast, gdal/mod.rs:47-70): an overflowing Float32 sentinel becomes
    inf, and a non-representable one is stored f32-rounded."""
    import math

    from raycells.cells.ctype import CellType, gdal_nodata

    nd = gdal_nodata(1e300, "Float32")
    assert math.isinf(nd.value(CellType.Float32))
    nd2 = gdal_nodata(0.1, "Float32")
    assert nd2.value(CellType.Float32) == float(np.float32(0.1))
