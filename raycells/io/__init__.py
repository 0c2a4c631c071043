from raycells.io import docsource, tilestore

__all__ = ["docsource", "tilestore"]
