"""``CellBuffer`` / ``Mask`` / ``MaskedCellBuffer`` — thin wrappers over numpy
arrays giving API parity with the reference for the conformance test suite.

The hot path in the Ray engine never allocates these objects per row — the
pipeline stages call the vectorized kernels in
:mod:`raycells.cells.kernels` directly on Arrow-backed numpy views. These
classes exist so the reference's own unit tests (buffer.rs:453-673,
mask.rs:179-243, masked_buffer.rs:386-541) can be mirrored 1:1 in pytest.

Zero-copy: ``CellBuffer.from_numpy`` wraps without copying; the erased
representation *is* the raw memory, like ``danger::cast``
(buffer.rs:439-451) — exposed here as ``.view(dtype)``.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import numpy as np

from raycells.cells import kernels
from raycells.cells.ctype import CellType, CellValue, NarrowingError, NoData


def _elide(values, limit=10, keep=5) -> str:
    """Debug elision: >10 elements shows 5 head + '...' + 5 tail (lib.rs:165-194)."""
    vals = list(values)
    if len(vals) > limit:
        shown = vals[:keep] + ["..."] + vals[-keep:]
    else:
        shown = vals
    return ", ".join(str(v) for v in shown)


class CellBuffer:
    """A contiguous typed column of cells, erased behind a runtime CellType tag
    (buffer.rs:12-55). Wraps a 1-D numpy array; construction is zero-copy."""

    __slots__ = ("data",)

    def __init__(self, data: np.ndarray):
        data = np.asarray(data)
        CellType.from_dtype(data.dtype)  # validate supported
        self.data = data.ravel()

    # ---- constructors ----
    @staticmethod
    def from_vec(values, cell_type: Optional[CellType] = None) -> "CellBuffer":
        if cell_type is not None:
            return CellBuffer(np.asarray(values, dtype=cell_type.dtype))
        arr = np.asarray(values)
        if arr.dtype.kind not in "uif":
            raise NarrowingError(CellType.Float64, CellType.Float64)
        return CellBuffer(arr)

    from_numpy = from_vec

    @staticmethod
    def with_defaults(length: int, ct: CellType) -> "CellBuffer":
        return CellBuffer(np.zeros(length, dtype=ct.dtype))

    @staticmethod
    def fill(length: int, value: CellValue) -> "CellBuffer":
        return CellBuffer(np.full(length, value.value, dtype=value.cell_type.dtype))

    @staticmethod
    def fill_via(length: int, f: Callable[[int], object]) -> "CellBuffer":
        vals = [f(i) for i in range(length)]
        return CellBuffer(np.asarray(vals))

    @staticmethod
    def from_cell_values(values: Iterable[CellValue]) -> "CellBuffer":
        """FromIterator<CellValue>: cell type = FIRST element's; later
        elements must widen into it; empty → empty UInt8 (buffer.rs:229-250)."""
        vals = list(values)
        if not vals:
            return CellBuffer.with_defaults(0, CellType.UInt8)
        ct = vals[0].cell_type
        return CellBuffer(np.array([v.get(ct) for v in vals], dtype=ct.dtype))

    # ---- core ops (BufferOps, lib.rs:104-163) ----
    def __len__(self) -> int:
        return self.data.shape[0]

    @property
    def is_empty(self) -> bool:
        return len(self) == 0

    @property
    def cell_type(self) -> CellType:
        return CellType.from_dtype(self.data.dtype)

    def get(self, i: int) -> CellValue:
        return CellValue(self.cell_type, self.data[i])

    def put(self, i: int, value: CellValue) -> None:
        v = value.convert(self.cell_type)  # NarrowingError if lossy
        self.data[i] = v.value

    def convert(self, ct: CellType) -> "CellBuffer":
        ct = CellType.of(ct)
        if ct is self.cell_type:
            return CellBuffer(self.data.copy())
        return CellBuffer(kernels.convert(self.data, ct))

    def min_max(self) -> Tuple[CellValue, CellValue]:
        return kernels.min_max(self.data)

    def to_vec(self, ct: CellType) -> np.ndarray:
        ct = CellType.of(ct)
        return kernels.convert(self.data, ct)

    def extend(self, values: Iterable) -> None:
        """Append, converting each element to the buffer's type via exact
        num-traits ``to_<prim>`` semantics (buffer.rs:205-221 —
        ``.unwrap()`` panics on unrepresentable): integer range checks
        run in the integer domain (values above 2^53 convert exactly,
        never through an f64 round trip) and fractional floats truncate
        toward zero, matching ``to_i64``/``to_u64``."""
        ct = self.cell_type
        new = []
        for v in values:
            cv = CellValue.new(v)
            t = cv.to_primitive(ct)
            if t is None:
                raise NarrowingError(cv.cell_type, ct)
            new.append(t)
        self.data = np.concatenate([self.data, np.array(new, dtype=ct.dtype)])

    def __iter__(self):
        ct = self.cell_type
        return (CellValue(ct, v) for v in self.data)

    # ---- arithmetic: always Float64 out; zip-truncation on len mismatch ----
    def _binop(self, other, op) -> "CellBuffer":
        rhs = other.data if isinstance(other, CellBuffer) else CellValue.new(other)
        return CellBuffer(kernels.binop(self.data, rhs, op))

    def __add__(self, other):
        return self._binop(other, "add")

    def __sub__(self, other):
        return self._binop(other, "sub")

    def __mul__(self, other):
        return self._binop(other, "mul")

    def __truediv__(self, other):
        return self._binop(other, "div")

    def __neg__(self) -> "CellBuffer":
        return CellBuffer(kernels.neg(self.data))

    # ---- ordering: tag first (declaration order!), then elements, then length
    #      (buffer.rs:373-436) ----
    def _cmp(self, other: "CellBuffer") -> int:
        a, b = self.cell_type.value, other.cell_type.value
        if a != b:
            return (a > b) - (a < b)
        ka = kernels.total_order_key(self.data)
        kb = kernels.total_order_key(other.data)
        n = min(len(ka), len(kb))
        if n:
            neq = np.nonzero(ka[:n] != kb[:n])[0]
            if neq.size:
                i = neq[0]
                return 1 if ka[i] > kb[i] else -1
        la, lb = len(ka), len(kb)
        return (la > lb) - (la < lb)

    def __eq__(self, other):
        if not isinstance(other, CellBuffer):
            return NotImplemented
        return self._cmp(other) == 0

    def __lt__(self, other):
        return self._cmp(other) < 0

    def __le__(self, other):
        return self._cmp(other) <= 0

    def __gt__(self, other):
        return self._cmp(other) > 0

    def __ge__(self, other):
        return self._cmp(other) >= 0

    def __hash__(self):
        return hash((self.cell_type, self.data.tobytes()))

    def __repr__(self):
        return f"{self.cell_type}CellBuffer({_elide(self.data)})"


class Mask:
    """Validity bitmap: True = valid (mask.rs:12). Wraps np.bool_ array."""

    __slots__ = ("data",)

    def __init__(self, values):
        self.data = np.asarray(values, dtype=bool).ravel()

    @staticmethod
    def fill(length: int, value: bool) -> "Mask":
        return Mask(np.full(length, value, dtype=bool))

    @staticmethod
    def fill_via(length: int, f: Callable[[int], bool]) -> "Mask":
        return Mask(np.array([f(i) for i in range(length)], dtype=bool))

    def __len__(self):
        return self.data.shape[0]

    def get(self, i: int) -> bool:
        return bool(self.data[i])

    def put(self, i: int, v: bool) -> None:
        self.data[i] = v

    def all(self, value: bool) -> bool:
        return bool(np.all(self.data == value))

    def counts(self) -> Tuple[int, int]:
        """(n_valid, n_invalid) (mask.rs:72-80)."""
        n_valid = int(np.count_nonzero(self.data))
        return n_valid, self.data.shape[0] - n_valid

    def __invert__(self) -> "Mask":
        return Mask(~self.data)

    def __and__(self, other: "Mask") -> "Mask":
        n = min(len(self), len(other))
        return Mask(self.data[:n] & other.data[:n])

    def __or__(self, other: "Mask") -> "Mask":
        n = min(len(self), len(other))
        return Mask(self.data[:n] | other.data[:n])

    def __eq__(self, other):
        if not isinstance(other, Mask):
            return NotImplemented
        return len(self) == len(other) and bool(np.all(self.data == other.data))

    def __hash__(self):
        return hash(self.data.tobytes())

    def __iter__(self):
        return (bool(v) for v in self.data)

    def __repr__(self):
        return f"Mask({_elide(self.data)})"


class MaskedCellBuffer:
    """A ``CellBuffer`` plus companion ``Mask`` (masked_buffer.rs:41).

    Equality is *derived* on the pair — payload values under masked slots DO
    participate (masked_buffer.rs:39)."""

    __slots__ = ("buffer", "mask")

    def __init__(self, buffer: CellBuffer, mask: Mask):
        if len(buffer) != len(mask):
            raise ValueError("Mask and buffer must have the same length.")
        self.buffer = buffer
        self.mask = mask

    # ---- constructors ----
    @staticmethod
    def from_vec(values, cell_type: Optional[CellType] = None) -> "MaskedCellBuffer":
        buf = CellBuffer.from_vec(values, cell_type)
        return MaskedCellBuffer(buf, Mask.fill(len(buf), True))

    @staticmethod
    def from_vec_with_nodata(values, nodata: NoData, cell_type=None) -> "MaskedCellBuffer":
        buf = CellBuffer.from_vec(values, cell_type)
        return MaskedCellBuffer(buf, Mask(kernels.mask_from_nodata(buf.data, nodata)))

    @staticmethod
    def fill_with_mask_via(length: int, f: Callable[[int], Tuple[object, bool]]):
        pairs = [f(i) for i in range(length)]
        buf = CellBuffer(np.asarray([p[0] for p in pairs]))
        return MaskedCellBuffer(buf, Mask([p[1] for p in pairs]))

    @staticmethod
    def with_defaults(length: int, ct: CellType) -> "MaskedCellBuffer":
        return MaskedCellBuffer(CellBuffer.with_defaults(length, ct), Mask.fill(length, True))

    @staticmethod
    def from_buffer(buffer: CellBuffer) -> "MaskedCellBuffer":
        """``From<CellBuffer>`` parity: all-true mask
        (masked_buffer.rs:250-255)."""
        return MaskedCellBuffer(buffer, Mask.fill(len(buffer), True))

    @staticmethod
    def from_pairs(pairs) -> "MaskedCellBuffer":
        """``FromIterator<(C, bool)>`` parity (masked_buffer.rs:257-287)."""
        pairs = list(pairs)
        buf = CellBuffer(np.asarray([p[0] for p in pairs]))
        return MaskedCellBuffer(buf, Mask([bool(p[1]) for p in pairs]))

    def extend_pairs(self, pairs) -> None:
        """``Extend<(C, bool)>`` parity: append (value, valid) pairs,
        converting each value to the buffer's type."""
        pairs = list(pairs)
        self.buffer.extend([p[0] for p in pairs])
        self.mask = Mask(
            np.concatenate([self.mask.data, np.asarray([bool(p[1]) for p in pairs])])
        )

    @staticmethod
    def fill(length: int, value: CellValue) -> "MaskedCellBuffer":
        return MaskedCellBuffer(CellBuffer.fill(length, value), Mask.fill(length, True))

    # ---- accessors ----
    def __len__(self):
        return len(self.buffer)

    @property
    def cell_type(self) -> CellType:
        return self.buffer.cell_type

    def get(self, i: int) -> CellValue:
        return self.buffer.get(i)  # mask ignored (masked_buffer.rs:192-194)

    def put(self, i: int, v: CellValue) -> None:
        self.buffer.put(i, v)

    def get_masked(self, i: int) -> Optional[CellValue]:
        return self.buffer.get(i) if self.mask.get(i) else None

    def get_with_mask(self, i: int) -> Tuple[CellValue, bool]:
        return self.buffer.get(i), self.mask.get(i)

    def put_with_mask(self, i: int, v: CellValue, m: bool) -> None:
        self.buffer.put(i, v)
        self.mask.put(i, m)

    def counts(self) -> Tuple[int, int]:
        return self.mask.counts()

    # ---- ops ----
    def convert(self, ct: CellType) -> "MaskedCellBuffer":
        ct = CellType.of(ct)
        return MaskedCellBuffer(self.buffer.convert(ct), Mask(self.mask.data.copy()))

    def min_max(self) -> Tuple[CellValue, CellValue]:
        return kernels.min_max(self.buffer.data, self.mask.data)

    def to_vec(self, ct: CellType) -> np.ndarray:
        ct = CellType.of(ct)
        return self.buffer.to_vec(ct)  # mask ignored (masked_buffer.rs:219-224)

    def to_vec_with_nodata(self, ct: CellType, nodata: NoData) -> np.ndarray:
        ct = CellType.of(ct)
        return kernels.to_nodata(self.buffer.data, self.mask.data, nodata, ct)

    def _binop(self, other, op) -> "MaskedCellBuffer":
        if isinstance(other, MaskedCellBuffer):
            out, m = kernels.binop_masked(
                self.buffer.data, self.mask.data, other.buffer.data, other.mask.data, op
            )
        else:
            rhs = other.data if isinstance(other, CellBuffer) else CellValue.new(other)
            out, m = kernels.binop_masked(self.buffer.data, self.mask.data, rhs, None, op)
        return MaskedCellBuffer(CellBuffer(out), Mask(m))

    def __add__(self, other):
        return self._binop(other, "add")

    def __sub__(self, other):
        return self._binop(other, "sub")

    def __mul__(self, other):
        return self._binop(other, "mul")

    def __truediv__(self, other):
        return self._binop(other, "div")

    def __neg__(self) -> "MaskedCellBuffer":
        return MaskedCellBuffer(-self.buffer, Mask(self.mask.data.copy()))

    def __eq__(self, other):
        if not isinstance(other, MaskedCellBuffer):
            return NotImplemented
        return self.buffer == other.buffer and self.mask == other.mask

    def __hash__(self):
        return hash((self.buffer, self.mask))

    def __iter__(self):
        return ((self.buffer.get(i), self.mask.get(i)) for i in range(len(self)))

    def __repr__(self):
        return f"{self.cell_type}MaskedCellBuffer({self.buffer!r}, {self.mask!r})"
