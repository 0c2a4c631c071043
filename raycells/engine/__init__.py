from raycells.engine import checkpoint, joins, pipeline, shuffle, stages

__all__ = ["stages", "pipeline", "shuffle", "checkpoint", "joins"]
