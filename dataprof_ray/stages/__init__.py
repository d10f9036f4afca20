"""Reusable map_batches stage callables (stateless fns and actor classes)."""
