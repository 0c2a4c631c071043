from raycells.cells.ctype import CellType, CellValue, NoData
from raycells.cells.buffer import CellBuffer, Mask, MaskedCellBuffer

__all__ = ["CellType", "CellValue", "NoData", "CellBuffer", "Mask", "MaskedCellBuffer"]
