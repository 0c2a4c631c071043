from raycells.engine import checkpoint, pipeline, shuffle, stages

__all__ = ["stages", "pipeline", "shuffle", "checkpoint"]
