"""Mergeable count-min sketch for bounded-memory frequency estimates.

The exact top-k path (`textstats.top_ngrams`) shuffles per-batch term
partials — perfect until the distinct-term universe itself outgrows a
worker (open-vocabulary n-grams at 100 TB). The CMS caps the state at
``depth x width`` int64 cells regardless of vocabulary size, with the
standard guarantees (public: Cormode & Muthukrishnan 2005): estimates
NEVER undercount, and overcount ≤ (e/width)·N with probability
1 - e^-depth. Sketches of identical shape merge by elementwise add, so
per-batch partials fold associatively.
"""

from __future__ import annotations

import numpy as np


class CountMinSketch:
    """Fixed-shape CMS over 64-bit item hashes. Deterministic, mergeable,
    picklable (one int64 buffer). Items enter as uint64 hashes (use the
    same fixed-seed xxhash kernel everywhere, e.g. ``pl.Series.hash``);
    row probes derive from splitmix64 per row, vectorized."""

    def __init__(self, width: int = 2 ** 16, depth: int = 4):
        if width < 1 or depth < 1:
            raise ValueError(f"width/depth must be >= 1, got {width}/{depth}")
        self.width = width
        self.depth = depth
        self.counts = np.zeros((depth, width), dtype=np.int64)
        self.total = 0

    def _cols(self, keys: np.ndarray) -> np.ndarray:
        """(depth, n) column indices per row."""
        from dataprof_ray.state.bloom import BloomFilter

        keys = keys.astype(np.uint64, copy=False)
        cols = np.empty((self.depth, len(keys)), dtype=np.int64)
        for r in range(self.depth):
            # row salt computed in Python ints (wraps mod 2^64 without
            # numpy's scalar-overflow warning)
            salt = np.uint64((0xA076_1D64_78BD_642F * (r + 1))
                             & 0xFFFF_FFFF_FFFF_FFFF)
            h = BloomFilter._splitmix(keys + salt)
            cols[r] = (h % np.uint64(self.width)).astype(np.int64)
        return cols

    def add_u64(self, keys: np.ndarray, counts: np.ndarray = None) -> None:
        if len(keys) == 0:
            return
        if counts is None:
            counts = np.ones(len(keys), dtype=np.int64)
        cols = self._cols(keys)
        for r in range(self.depth):
            np.add.at(self.counts[r], cols[r], counts)
        self.total += int(np.sum(counts))

    def estimate_u64(self, keys: np.ndarray) -> np.ndarray:
        """Point estimates (>= true count, elementwise min over rows)."""
        if len(keys) == 0:
            return np.zeros(0, dtype=np.int64)
        cols = self._cols(keys)
        est = self.counts[0][cols[0]]
        for r in range(1, self.depth):
            est = np.minimum(est, self.counts[r][cols[r]])
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.width, self.depth) != (other.width, other.depth):
            raise ValueError(
                f"cannot merge CMS of shape ({self.depth}x{self.width}) "
                f"with ({other.depth}x{other.width})")
        self.counts += other.counts
        self.total += other.total
        return self

    def merge_bytes(self, counts: bytes, total: int) -> "CountMinSketch":
        arr = np.frombuffer(counts, dtype=np.int64)
        if len(arr) != self.counts.size:
            raise ValueError(
                f"cannot merge CMS partial of {len(arr)} cells into "
                f"{self.counts.size} (mismatched width/depth)")
        self.counts += arr.reshape(self.depth, self.width)
        self.total += int(total)
        return self

    def error_bound(self) -> float:
        """eps*N: additive overcount ceiling at ~1 - e^-depth confidence."""
        return float(np.e / self.width * self.total)

    def __getstate__(self):
        return (self.width, self.depth, self.total, self.counts.tobytes())

    def __setstate__(self, state):
        self.width, self.depth, self.total, raw = state
        self.counts = np.frombuffer(raw, dtype=np.int64) \
            .reshape(self.depth, self.width).copy()
