from raycells.geo import cellid, knn, pip, raster

__all__ = ["cellid", "pip", "knn", "raster"]
