"""Named query pipelines + DuckDB oracle SQL (the driver correctness gate)."""
