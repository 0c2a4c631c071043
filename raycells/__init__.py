"""raycells — a Ray-Data-native raster-cell + spatial-join data engine.

A from-scratch engine with the query/data-processing capabilities of the
``erased-cells`` reference library (runtime-dynamic cell buffers over
``uint8..float64`` with NoData masking), re-expressed Ray-Data-first:

- ``raycells.cells``  — the erased-cell type system and vectorized numpy
  kernels (semantic parity with the reference, bit-for-bit).
- ``raycells.io``     — interleaved text+media document source and the
  deterministic synthetic tile store.
- ``raycells.geo``    — hierarchical Hilbert cell IDs (S2-style),
  point-in-polygon, kNN, rasterize/vectorize.
- ``raycells.engine`` — Ray Data pipeline wiring: map_batches stages,
  actor pools, salted groupby shuffles, checkpoint/resume.
- ``raycells.text``   — text analysis + dedup family (exact, MinHash-LSH,
  SimHash, n-gram Jaccard).
- ``raycells.ann``    — embedding similarity search (brute-force cosine,
  LSH-bucketed variant).
- ``raycells.media``  — multimodal (image/audio) column plumbing; decode
  stubs (codec libs unavailable in this environment).
"""

from raycells.cells.ctype import CellType, CellValue, NoData
from raycells.cells.buffer import CellBuffer, Mask, MaskedCellBuffer

__all__ = [
    "CellType",
    "CellValue",
    "NoData",
    "CellBuffer",
    "Mask",
    "MaskedCellBuffer",
]

__version__ = "0.1.0"
