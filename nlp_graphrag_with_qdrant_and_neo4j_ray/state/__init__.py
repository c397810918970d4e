"""Execution state: lineage records, per-stage checkpoints, broadcast lookups."""
