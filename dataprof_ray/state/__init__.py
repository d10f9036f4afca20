"""Mergeable accumulator state + per-partition lineage."""
