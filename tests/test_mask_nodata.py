"""Mirror of Mask tests (/root/reference/src/masked/mask.rs:179-243) and
NoData tests (/root/reference/src/masked/nodata.rs:70-96)."""

import numpy as np
import pytest

from raycells import CellType, CellValue, Mask, NoData
from raycells.cells.ctype import CELL_TYPES

CT = CellType


# ---- Mask ----

def test_mask_ctor_access():
    m = Mask([True, False, True])
    assert len(m) == 3
    assert m.get(0) and not m.get(1)
    m.put(1, True)
    assert m.get(1)
    assert Mask.fill(3, True).all(True)
    via = Mask.fill_via(4, lambda i: i % 2 == 0)
    assert list(via) == [True, False, True, False]


def test_mask_counts():
    m = Mask([True, False, True, False, True])
    assert m.counts() == (3, 2)


def test_mask_not():
    m = Mask([True, False])
    assert list(~m) == [False, True]


def test_mask_and_or():
    l = Mask([True, True, False, False])
    r = Mask([True, False, True, False])
    assert list(l & r) == [True, False, False, False]
    assert list(l | r) == [True, True, True, False]


def test_mask_eq():
    assert Mask([True, False]) == Mask([True, False])
    assert Mask([True]) != Mask([False])


# ---- NoData ----

def test_nodata_has_value():
    # nodata.rs:74-80
    assert NoData.none().value(CT.Int16) is None
    assert NoData.default().value(CT.UInt8) == 0  # u8 default nodata is MIN = 0!
    assert np.isnan(NoData.default().value(CT.Float32))
    assert NoData.of(6).value(CT.UInt16) == 6


def test_nodata_defaults_all_types():
    # nodata.rs:82-90
    for ct in CELL_TYPES:
        v = NoData.default().value(ct)
        assert v is not None
        if ct.is_integral:
            assert v == ct.min_value().value


def test_nan_is_nodata():
    # nodata.rs:93-95: NaN matches the default float sentinel (total-order eq)
    assert NoData.default().is_nodata(CellValue(CT.Float64, np.nan))
    assert not NoData.none().is_nodata(CellValue(CT.Float64, np.nan))
    assert NoData.of(0).is_nodata(CellValue(CT.UInt16, 0))
    assert not NoData.of(0).is_nodata(CellValue(CT.UInt16, 5))
