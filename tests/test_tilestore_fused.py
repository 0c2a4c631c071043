"""Fused chunked kernels must stay value-identical to the unfused path
(synth_tiles → tile_stats), across all 10 cell types and both shapes."""

import numpy as np
import pyarrow as pa

from raycells.cells import kernels
from raycells.cells.ctype import CELL_TYPES
from raycells.engine import stages
from raycells.io import tilestore


def _stats_batch(tiles):
    """(cell_type, values, mask) triples → the tile_stats input table
    (shared by the edge-case and random-sweep folds)."""
    return pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(tiles))]),
            "span_idx": pa.array(np.zeros(len(tiles), np.int32)),
            "data": pa.array([v.tobytes() for _, v, _ in tiles], pa.large_binary()),
            "mask": pa.array(
                [kernels.pack_mask(m) for _, _, m in tiles], pa.large_binary()
            ),
            "cell_type": pa.array([c for c, _, _ in tiles]),
            "nrows": pa.array([1] * len(tiles), pa.int32()),
            "ncols": pa.array([len(v) for _, v, _ in tiles], pa.int32()),
        }
    )


def _tiles_table(seeds):
    cols = tilestore.synth_tiles(seeds)
    return pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(seeds))]),
            "span_idx": pa.array(np.zeros(len(seeds), np.int32)),
            "media_ref": pa.array([f"tile://{s}" for s in seeds]),
            "data": pa.array(cols["data"], pa.large_binary()),
            "mask": pa.array(cols["mask"], pa.large_binary()),
            "cell_type": pa.array(cols["cell_type"]),
            "nrows": pa.array(cols["nrows"], pa.int32()),
            "ncols": pa.array(cols["ncols"], pa.int32()),
            "nodata": pa.array(cols["nodata"], pa.float64()),
            "lon": pa.array(cols["lon"]),
            "lat": pa.array(cols["lat"]),
            "minx": pa.array(cols["minx"]),
            "miny": pa.array(cols["miny"]),
            "maxx": pa.array(cols["maxx"]),
            "maxy": pa.array(cols["maxy"]),
        }
    )


# 707 covers every cell type (wheel of 10) and several 186×169 fixtures
SEEDS = np.arange(0, 707, dtype=np.int64)


def test_synth_tile_stats_matches_unfused():
    st = tilestore.synth_tile_stats(SEEDS)
    ref = stages.tile_stats(_tiles_table(SEEDS))
    assert np.array_equal(ref["min_val"].to_numpy(), st["min_val"])
    assert np.array_equal(ref["max_val"].to_numpy(), st["max_val"])
    assert np.array_equal(ref["valid_count"].to_numpy(), st["valid_count"])
    assert np.array_equal(ref["nodata_count"].to_numpy(), st["nodata_count"])
    assert np.allclose(ref["mean_val"].to_numpy(), st["mean_val"], rtol=1e-12)
    assert list(st["cell_type"]) == ref["cell_type"].to_pylist()


def test_synth_tile_stats_covers_all_types_and_shapes():
    st = tilestore.synth_tile_stats(SEEDS)
    assert set(st["cell_type"]) == {ct.name for ct in tilestore.CELL_TYPES}
    assert (st["nrows"] == 186).sum() == len([s for s in SEEDS if s % 101 == 0])


def test_synth_band_stats_matches_matrix_path():
    bs = tilestore.synth_band_stats(SEEDS, 4)
    v = tilestore.synth_band_values(SEEDS, 4).astype(np.int64)
    valid = v != 0
    assert np.array_equal(bs["valid_count"], valid.sum(1))
    assert np.array_equal(bs["sum_val"], (v * valid).sum(1))
    assert np.array_equal(bs["min_val"], np.where(valid, v, 1 << 40).min(1))
    assert np.array_equal(bs["max_val"], np.where(valid, v, -1).max(1))


def test_synth_ndvi_matches_brute_force():
    seeds = np.arange(5, 40, dtype=np.int64)
    st = tilestore.synth_ndvi_stats(seeds)
    red = tilestore.synth_band_values(seeds, 4).astype(np.int64)
    nir = tilestore.synth_band_values(seeds, 5).astype(np.int64)
    # sentinel 0 marks the same cells in both bands (mask depends on (s, i))
    valid = (red != 0) & (nir != 0)
    # brute force uses the raw (unsentineled) values where valid
    raw_r = 1 + (seeds[:, None] * tilestore.MUL_A + (np.arange(4096) + 404) * tilestore.MUL_I) % tilestore.VAL_MOD
    raw_n = 1 + (seeds[:, None] * tilestore.MUL_A + (np.arange(4096) + 505) * tilestore.MUL_I) % tilestore.VAL_MOD
    ndvi = (raw_n - raw_r) / (raw_n + raw_r)
    assert np.array_equal(st["n_valid"], valid.sum(1))
    assert np.array_equal(st["ndvi_min"], np.where(valid, ndvi, np.inf).min(1))
    assert np.array_equal(st["ndvi_max"], np.where(valid, ndvi, -np.inf).max(1))


def test_stats_chunk_boundary_independence():
    """Results must not depend on how seeds split into scratch chunks."""
    seeds = np.arange(100, 300, dtype=np.int64)
    whole = tilestore.synth_tile_stats(seeds)
    halves = [tilestore.synth_tile_stats(seeds[:97]), tilestore.synth_tile_stats(seeds[97:])]
    for col in ("min_val", "max_val", "valid_count", "mean_val"):
        joined = np.concatenate([halves[0][col], halves[1][col]])
        assert np.array_equal(whole[col], joined), col


def test_tile_stats_grouped_matches_scalar_fold_edge_cases():
    """The grouped-vectorized tile_stats must keep the reference fold
    semantics per tile: participating (max, min) seeds (all-masked →
    inverted sentinels; +NaN loses the min to the float MAX seed but
    wins the max under total order), exact int64 compares above 2^53."""
    from raycells.cells import kernels
    from raycells.cells.ctype import CellType

    tiles = [
        # (cell_type, values, mask)
        ("Float32", np.array([np.nan, 1.5, -2.0], np.float32), np.array([True, True, True])),
        ("Float32", np.array([np.nan, np.nan], np.float32), np.array([True, True])),
        ("Float64", np.array([3.0, 4.0], np.float64), np.array([False, False])),  # all masked
        ("Int64", np.array([2**62 + 3, 2**62 + 1], np.int64), np.array([True, True])),
        ("UInt64", np.array([2**63 + 5, 7], np.uint64), np.array([True, False])),
    ]
    batch = _stats_batch(tiles)
    got = stages.tile_stats(batch)
    for i, (ctname, v, m) in enumerate(tiles):
        lo, hi = kernels.min_max(v, m)
        want_lo, want_hi = lo.to_f64(), hi.to_f64()
        got_lo = got["min_val"][i].as_py()
        got_hi = got["max_val"][i].as_py()
        assert (got_lo == want_lo) or (np.isnan(got_lo) and np.isnan(want_lo)), (i, ctname)
        assert (got_hi == want_hi) or (np.isnan(got_hi) and np.isnan(want_hi)), (i, ctname)
        assert got["valid_count"][i].as_py() == int(m.sum())


def test_tile_stats_grouped_matches_scalar_fold_random():
    """Property-style sweep: grouped tile_stats == per-tile kernels.min_max
    fold across all 10 cell types, random payloads (incl. NaNs in float
    tiles) and random masks, mixed sizes in one batch."""
    from raycells.cells import kernels
    from raycells.cells.ctype import CELL_TYPES

    rng = np.random.default_rng(23)
    tiles = []
    for rep in range(3):
        for ct in CELL_TYPES:
            n = int(rng.integers(3, 40))
            if ct.is_integral:
                info = np.iinfo(ct.dtype)
                v = rng.integers(
                    int(info.min), int(info.max), n, dtype=ct.dtype,
                    endpoint=True,
                )
            else:
                v = (rng.standard_normal(n) * 1e3).astype(ct.dtype)
                v[rng.random(n) < 0.2] = np.nan
            m = rng.random(n) < 0.7
            tiles.append((ct.name, v, m))
    batch = _stats_batch(tiles)
    got = stages.tile_stats(batch)
    for i, (ctname, v, m) in enumerate(tiles):
        lo, hi = kernels.min_max(v, m)
        for want, col in ((lo.to_f64(), "min_val"), (hi.to_f64(), "max_val")):
            g = got[col][i].as_py()
            assert (g == want) or (np.isnan(g) and np.isnan(want)), (i, ctname, col)
        assert got["valid_count"][i].as_py() == int(m.sum()), (i, ctname)


def test_band_delta_stats_matches_full_decode():
    """synth_band_delta_stats == the naive two full decodes + numpy
    reductions (exact integers, band-independent mask)."""
    from raycells.io import tilestore

    seeds = np.array([0, 1, 7, 101, 9999, 123457], dtype=np.int64)
    got = tilestore.synth_band_delta_stats(seeds, 4, 7)
    va = tilestore.synth_band_values(seeds, 4).astype(np.int64)
    vb = tilestore.synth_band_values(seeds, 7).astype(np.int64)
    m = va != 0
    assert np.array_equal(m, vb != 0)  # mask is band-independent
    d = vb - va
    assert np.array_equal(got["valid_count"], m.sum(axis=1))
    assert np.array_equal(got["sum_delta"], np.where(m, d, 0).sum(axis=1))
    assert np.array_equal(
        got["min_delta"], np.where(m, d, np.int64(1 << 40)).min(axis=1)
    )
    assert np.array_equal(
        got["max_delta"], np.where(m, d, np.int64(-(1 << 40))).max(axis=1)
    )
