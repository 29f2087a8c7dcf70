"""Execution-plan helpers: checkpoint/lineage/resume + per-stage metrics."""
