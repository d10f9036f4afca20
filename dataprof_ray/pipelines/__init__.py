"""End-to-end Ray Data pipelines: profiling rollup, corpus quality filter,
dedup family, similarity search, text analysis."""
