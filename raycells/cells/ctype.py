"""The erased-cell type system: ``CellType``, ``CellValue``, ``NoData``.

Semantic parity with the reference (`/root/reference/src/ctype.rs`,
`src/value.rs`, `src/masked/nodata.rs`), re-expressed for numpy/Arrow:

- 10 fixed-width numeric cell types, ``UInt8 .. Float64``, with the exact
  reference spellings for ``str()``/``from_str`` round-trips
  (ctype.rs:23-43).
- The type-union lattice (ctype.rs:99-126) — NOT numpy promotion; a
  precomputed 10x10 table derived from the reference algorithm.
- Scalar ``CellValue`` with cross-type value equality, IEEE *total-order*
  float comparison (value.rs:248-273), widening-only ``convert``
  (value.rs:74-98), arithmetic that always yields Float64
  (value.rs:196-222), and sign-promoting negation (value.rs:224-240).
- ``NoData`` sentinels: None / Default / Value, Default = MIN for the 8
  integer types and NaN for floats (nodata.rs:27-38) — so the default
  nodata for UInt8 is 0.
"""

from __future__ import annotations

import enum
import math
from dataclasses import dataclass
from typing import Optional, Union

import numpy as np
import pyarrow as pa


class NarrowingError(ValueError):
    """Conversion to a narrower cell type was requested (value.rs:52-55)."""

    def __init__(self, src: "CellType", dst: "CellType"):
        super().__init__(f"NarrowingError: cannot convert {src} to {dst}")
        self.src = src
        self.dst = dst


class CellTypeParseError(ValueError):
    pass


class CellType(enum.Enum):
    """The 10 cell types, in reference declaration order (ctype.rs:11-20)."""

    UInt8 = 0
    UInt16 = 1
    UInt32 = 2
    UInt64 = 3
    Int8 = 4
    Int16 = 5
    Int32 = 6
    Int64 = 7
    Float32 = 8
    Float64 = 9

    # ---- string round-trip (ctype.rs:23-43) ----
    def __str__(self) -> str:
        return self.name

    @staticmethod
    def from_str(s: str) -> "CellType":
        try:
            return CellType[s]
        except KeyError:
            raise CellTypeParseError(f"Unable to parse {s!r} as CellType") from None

    @staticmethod
    def iter():
        """All 10 variants in declaration order (ctype.rs:47-52)."""
        return iter(CELL_TYPES)

    # ---- classification (ctype.rs:55-96) ----
    @property
    def is_integral(self) -> bool:
        return self.value <= 7

    @property
    def is_signed(self) -> bool:
        # floats count as signed (ctype.rs:71-84)
        return self.value >= 4

    @property
    def size_of(self) -> int:
        return _SIZES[self.value]

    @property
    def dtype(self) -> np.dtype:
        return _NP_DTYPES[self.value]

    @property
    def arrow_type(self) -> pa.DataType:
        return _PA_TYPES[self.value]

    @staticmethod
    def from_dtype(dt: Union[np.dtype, type]) -> "CellType":
        ct = _FROM_NP.get(np.dtype(dt).name)
        if ct is None:
            raise CellTypeParseError(f"Unsupported dtype {dt!r} for CellType")
        return ct

    @staticmethod
    def of(x) -> "CellType":
        """Coerce a CellType-like: CellType, reference spelling ("UInt8"),
        numpy dtype, or numpy scalar type."""
        if isinstance(x, CellType):
            return x
        if isinstance(x, str):
            return CellType.from_str(x)
        return CellType.from_dtype(x)

    # ---- the union lattice (ctype.rs:99-131) ----
    def union(self, other: "CellType") -> "CellType":
        return UNION_TABLE[self.value][other.value]

    def can_fit_into(self, other: "CellType") -> bool:
        return UNION_TABLE[self.value][other.value] is other

    # ---- typed constants (ctype.rs:134-179) ----
    def zero(self) -> "CellValue":
        return CellValue(self, self.dtype.type(0))

    def one(self) -> "CellValue":
        return CellValue(self, self.dtype.type(1))

    def min_value(self) -> "CellValue":
        # floats: finite MIN (-3.4e38 for f32), not -inf (ctype.rs:158-167)
        return CellValue(self, _MINS[self.value])

    def max_value(self) -> "CellValue":
        return CellValue(self, _MAXS[self.value])

    def default_nodata(self):
        """Default NoData sentinel: MIN for ints, NaN for floats (nodata.rs:27-38)."""
        if self.is_integral:
            return _MINS[self.value]
        return self.dtype.type(np.nan)


CELL_TYPES = tuple(CellType)

_NP_DTYPES = tuple(
    np.dtype(n)
    for n in (
        "uint8", "uint16", "uint32", "uint64",
        "int8", "int16", "int32", "int64",
        "float32", "float64",
    )
)
_PA_TYPES = (
    pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64(),
    pa.int8(), pa.int16(), pa.int32(), pa.int64(),
    pa.float32(), pa.float64(),
)
_SIZES = tuple(dt.itemsize for dt in _NP_DTYPES)
_FROM_NP = {dt.name: ct for dt, ct in zip(_NP_DTYPES, CELL_TYPES)}
_MINS = tuple(
    np.iinfo(dt).min if dt.kind in "ui" else np.finfo(dt).min for dt in _NP_DTYPES
)
_MAXS = tuple(
    np.iinfo(dt).max if dt.kind in "ui" else np.finfo(dt).max for dt in _NP_DTYPES
)
# keep numpy scalar types
_MINS = tuple(dt.type(v) for dt, v in zip(_NP_DTYPES, _MINS))
_MAXS = tuple(dt.type(v) for dt, v in zip(_NP_DTYPES, _MAXS))


def _union(a: CellType, b: CellType) -> CellType:
    """The reference union algorithm (ctype.rs:99-126), reimplemented."""
    if a.is_integral and not b.is_integral:
        min_bytes = max(b.size_of, 2 * a.size_of)
    elif not a.is_integral and b.is_integral:
        min_bytes = max(a.size_of, 2 * b.size_of)
    elif a.is_signed and not b.is_signed:
        min_bytes = max(a.size_of, 2 * b.size_of)
    elif not a.is_signed and b.is_signed:
        min_bytes = max(b.size_of, 2 * a.size_of)
    else:
        min_bytes = max(a.size_of, b.size_of)
    signed = a.is_signed or b.is_signed
    integral = a.is_integral and b.is_integral
    key = (min_bytes, signed, integral)
    table = {
        (1, False, True): CellType.UInt8,
        (1, True, True): CellType.Int8,
        (2, False, True): CellType.UInt16,
        (2, True, True): CellType.Int16,
        (4, False, True): CellType.UInt32,
        (4, True, True): CellType.Int32,
        (4, False, False): CellType.Float32,
        (4, True, False): CellType.Float32,
        (8, False, True): CellType.UInt64,
        (8, True, True): CellType.Int64,
    }
    return table.get(key, CellType.Float64)


UNION_TABLE: tuple = tuple(
    tuple(_union(a, b) for b in CELL_TYPES) for a in CELL_TYPES
)


# ---------------------------------------------------------------------------
# total-order float comparison (value.rs:260-261: f32/f64 total_cmp)
# ---------------------------------------------------------------------------

def _total_order_scalar_key(v) -> int:
    """IEEE-754 totalOrder key for a float scalar: -NaN < -inf < ... < +inf < +NaN.

    Maps the float's bit pattern to an unsigned integer that sorts in total
    order: sign-bit-set patterns are bit-flipped, others get the sign bit
    set. (Vectorized variant: kernels.total_order_key.)
    """
    a = np.asarray(v)
    if a.dtype.kind in "ui":
        return int(a)
    width = 32 if a.dtype == np.float32 else 64
    mask = (1 << width) - 1
    u = int(a.view(np.uint32 if width == 32 else np.uint64))
    if u >> (width - 1):  # sign bit set
        return mask - u  # = ~u
    return u + (1 << (width - 1))


class CellValue:
    """A typed scalar cell value (value.rs:12-20).

    Equality is *value-based across types* (value.rs:267-273):
    ``Float64(3.0) == Float32(3.0)``. Comparison unifies both operands
    via the lattice then compares; floats use IEEE total order, so
    ``NaN == NaN`` is true and +NaN is greater than +inf.
    """

    __slots__ = ("cell_type", "value")

    def __init__(self, cell_type: CellType, value):
        self.cell_type = cell_type
        self.value = cell_type.dtype.type(value)

    @staticmethod
    def new(value) -> "CellValue":
        """Wrap a numpy scalar (or python int→Int64 / float→Float64)."""
        if isinstance(value, CellValue):
            return value
        if isinstance(value, (bool, np.bool_)):
            raise CellTypeParseError("bool is not a cell type")
        if isinstance(value, np.generic):
            return CellValue(CellType.from_dtype(value.dtype), value)
        if isinstance(value, int):
            return CellValue(CellType.Int64, value)
        if isinstance(value, float):
            return CellValue(CellType.Float64, value)
        raise CellTypeParseError(f"Cannot wrap {type(value)} as CellValue")

    def convert(self, cell_type: CellType) -> "CellValue":
        """Widening-only conversion (value.rs:74-98); raises NarrowingError."""
        if not self.cell_type.can_fit_into(cell_type):
            raise NarrowingError(self.cell_type, cell_type)
        if cell_type is self.cell_type:
            return self
        return CellValue(cell_type, cell_type.dtype.type(self.value))

    def get(self, cell_type: CellType):
        """Extract as the given type; Ok iff widening (value.rs:51-67)."""
        return self.convert(cell_type).value

    def unify(self, other: "CellValue"):
        dest = self.cell_type.union(other.cell_type)
        return self.convert(dest), other.convert(dest)

    def to_f64(self) -> float:
        return float(self.value)

    def to_i64(self) -> Optional[int]:
        if self.cell_type.is_integral:
            v = int(self.value)
            return v if -(2**63) <= v < 2**63 else None
        f = float(self.value)
        if math.isnan(f) or math.isinf(f) or f != int(f):
            i = int(f) if not (math.isnan(f) or math.isinf(f)) else None
        else:
            i = int(f)
        return i if i is not None and -(2**63) <= i < 2**63 else None

    def to_u64(self) -> Optional[int]:
        """num-traits ``to_u64`` parity (value.rs:118-157): fractional
        floats truncate toward zero ((3.5).to_u64() == Some(3),
        (-0.5).to_u64() == Some(0), matching ``to_i64``); None on
        NaN/inf or outside the exclusive range (-1, 2**64)."""
        if self.cell_type.is_integral:
            v = int(self.value)
            return v if 0 <= v < 2**64 else None
        f = float(self.value)
        if math.isnan(f) or math.isinf(f):
            return None
        i = int(f)  # int() truncates toward zero, matching num-traits
        return i if 0 <= i < 2**64 else None

    def to_primitive(self, dst: "CellType"):
        """num-traits ``to_<prim>`` conversion (value.rs ToPrimitive /
        buffer.rs:205-221 Extend): integer→integer checks the EXACT
        integer range (no f64 round trip, so int64 values above 2^53
        convert exactly); float→integer truncates toward zero within the
        exclusive float range (MIN − 1, MAX + 1) — num-traits'
        ``impl_to_primitive_float_to_*`` rule; →float is the
        lossy-allowed ``as`` cast. Returns None when unrepresentable."""
        if dst.is_integral:
            info = np.iinfo(dst.dtype)
            if self.cell_type.is_integral:
                i = int(self.value)
            else:
                f = float(self.value)
                if math.isnan(f) or math.isinf(f):
                    return None
                # same IEEE bound expressions as the Rust macro
                if not (float(info.min) - 1.0 < f < float(info.max) + 1.0):
                    return None
                i = int(f)  # truncates toward zero
            if not (info.min <= i <= info.max):
                return None
            return dst.dtype.type(i)
        return dst.dtype.type(self.value)

    @staticmethod
    def zero() -> "CellValue":
        """``Zero`` impl parity: ``UInt8(0)`` (value.rs:159-184)."""
        return CellValue.new(np.uint8(0))

    @staticmethod
    def one() -> "CellValue":
        """``One`` impl parity: ``UInt8(1)`` (value.rs:159-184)."""
        return CellValue.new(np.uint8(1))

    def is_zero(self) -> bool:
        return self.value == 0

    # ---- comparison: unify then total order ----
    def _compare(self, other) -> int:
        other = CellValue.new(other)
        l, r = self.unify(other)
        if l.cell_type.is_integral:
            a, b = int(l.value), int(r.value)
            return (a > b) - (a < b)
        ka = _total_order_scalar_key(l.value)
        kb = _total_order_scalar_key(r.value)
        return (ka > kb) - (ka < kb)

    def __eq__(self, other) -> bool:
        if not isinstance(other, (CellValue, np.generic, int, float)):
            return NotImplemented
        return self._compare(other) == 0

    def __lt__(self, other):
        return self._compare(other) < 0

    def __le__(self, other):
        return self._compare(other) <= 0

    def __gt__(self, other):
        return self._compare(other) > 0

    def __ge__(self, other):
        return self._compare(other) >= 0

    def __hash__(self):
        # hash on the unified f64 total-order key so eq ⇒ same hash
        return hash(_total_order_scalar_key(np.float64(self.value)))

    def min(self, other: "CellValue") -> "CellValue":
        return self if self._compare(other) <= 0 else CellValue.new(other)

    def max(self, other: "CellValue") -> "CellValue":
        return self if self._compare(other) >= 0 else CellValue.new(other)

    # ---- arithmetic: unify → f64 → result is ALWAYS Float64 (value.rs:196-222) ----
    def _binop(self, other, op) -> "CellValue":
        other = CellValue.new(other)
        with np.errstate(divide="ignore", invalid="ignore"):
            return CellValue(CellType.Float64, op(float(self.value), float(other.value)))

    def __add__(self, other):
        return self._binop(other, lambda a, b: a + b)

    def __sub__(self, other):
        return self._binop(other, lambda a, b: a - b)

    def __mul__(self, other):
        return self._binop(other, lambda a, b: a * b)

    def __truediv__(self, other):
        return self._binop(other, lambda a, b: np.float64(a) / np.float64(b))

    def __neg__(self) -> "CellValue":
        """Sign-promoting negation (value.rs:224-240)."""
        ct = NEG_TYPE[self.cell_type.value]
        return CellValue(ct, -ct.dtype.type(self.value))

    def __repr__(self):
        return f"CellValue.{self.cell_type.name}({self.value})"


# Neg promotion table: u8→i16, u16→i32, u32→f64, u64→f64; rest keep type
NEG_TYPE = (
    CellType.Int16, CellType.Int32, CellType.Float64, CellType.Float64,
    CellType.Int8, CellType.Int16, CellType.Int32, CellType.Int64,
    CellType.Float32, CellType.Float64,
)


# ---------------------------------------------------------------------------
# NoData (nodata.rs:9-49)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class NoData:
    """NoData sentinel spec: ``NoData.none()``, ``NoData.default()``, ``NoData.of(v)``.

    ``default`` resolves to MIN for integral cell types and NaN for floats
    (nodata.rs:27-38). ``is_nodata`` uses CellValue equality, which is
    total-order on floats, so NaN matches the float default sentinel
    (nodata.rs:93-95).
    """

    kind: str  # "none" | "default" | "value"
    raw: Optional[float] = None

    @staticmethod
    def none() -> "NoData":
        return NoData("none")

    @staticmethod
    def default() -> "NoData":
        return NoData("default")

    @staticmethod
    def of(value) -> "NoData":
        return NoData("value", value)

    def value(self, cell_type: CellType):
        """The sentinel as a numpy scalar of ``cell_type``, or None."""
        if self.kind == "none":
            return None
        if self.kind == "default":
            return cell_type.default_nodata()
        return cell_type.dtype.type(self.raw)

    def is_nodata(self, value: CellValue, cell_type: Optional[CellType] = None) -> bool:
        ct = cell_type if cell_type is not None else value.cell_type
        nd = self.value(ct)
        if nd is None:
            return False
        return CellValue(ct, nd) == value


# ---------------------------------------------------------------------------
# GDAL-compat subset (gdal/mod.rs:12-44)
# ---------------------------------------------------------------------------

# The reference's GDAL connector supports only 7 of the 10 cell types
# (UInt64, Int8, Int64 dropped for pre-3.5/3.7 GDAL compat —
# gdal/mod.rs:14-27, footnote lib.rs:39-40).
GDAL_CELL_TYPES = tuple(
    ct for ct in CELL_TYPES
    if ct not in (CellType.UInt64, CellType.Int8, CellType.Int64)
)


class UnsupportedCellTypeError(ValueError):
    """Cell type outside the GDAL-compat subset (gdal/mod.rs:30-44)."""


class NoDataConversionError(ValueError):
    """Band nodata not representable in the band cell type (gdal/mod.rs:47-70)."""


def gdal_cell_type(name_or_ct) -> "CellType":
    """Bridge a dtype-like into the GDAL-compat subset; raises
    UnsupportedCellTypeError outside it (TryFrom<GdalDataType>,
    gdal/mod.rs:30-44)."""
    ct = CellType.of(name_or_ct)
    if ct not in GDAL_CELL_TYPES:
        raise UnsupportedCellTypeError(f"{ct.name} is not GDAL-compatible")
    return ct


def gdal_nodata(value, cell_type) -> "NoData":
    """Band nodata (an optional f64) → typed NoData (GdalND conversion,
    gdal/mod.rs:47-70). Integral sentinels are checked — an f64 that does
    not round-trip through the band's integer type raises (num-traits
    ``to_iN`` returns None out of range). Float sentinels follow
    num-traits' float→float semantics: ALWAYS convert, saturating to
    ±inf beyond the target range (Rust ``as`` cast) — so the stored
    sentinel is the band-typed value, not the raw f64. None →
    NoData.default()."""
    ct = gdal_cell_type(cell_type)
    if value is None:
        return NoData.default()
    with np.errstate(over="ignore"):  # saturation is the documented behavior
        typed = ct.dtype.type(value)
    if not ct.is_integral:
        return NoData.of(float(typed))
    if float(typed) != float(value):
        raise NoDataConversionError(
            f"nodata {value!r} is not representable in {ct.name}"
        )
    return NoData.of(typed)
