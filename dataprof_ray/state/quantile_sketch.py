"""Mergeable approximate-quantile sketch (deterministic, bounded size).

The compressed-CDF family (GK/KLL-style guarantees, simplified): a sketch
is a sorted array of (value, weight) points approximating the input's
cumulative distribution with at most ``k`` points. Per-batch build is one
sort; merge is concatenate + re-sort + recompress; a quantile query
interpolates the weighted CDF at rank q·N. Rank error after one compress
is <= W/k (one inter-point gap) and grows by at most W/k per merge level,
so a tree merge of depth d gives rank error O(d/k) — with k=512 and the
profiler's <=9-level tree merge, well under 2% and measured ~0.1% on
real columns (``tests/test_accumulators.py``). Fully deterministic: no
sampling, same input -> same sketch regardless of batch boundaries only
when boundaries match; ACROSS different batchings results may differ
within the error bound (the audit query reports the achieved error).

This is the streaming/no-colocated-data complement to the EXACT
type-7 ``pipelines.aggregate.group_quantiles`` (which needs each group's
values in one worker); reference parity: dataprof's sampled percentiles
(SURVEY.md §2.4) approximate the same statistic by subsampling — this
sketch sees EVERY row at bounded memory.
"""

from __future__ import annotations

import numpy as np


class QuantileSketch:
    """Bounded weighted summary of a numeric stream. NaNs are excluded
    (SQL aggregate semantics); total observed weight is tracked exactly."""

    __slots__ = ("k", "values", "weights")

    def __init__(self, k: int = 512, values=None, weights=None) -> None:
        if k < 8:
            raise ValueError(f"sketch size k must be >= 8, got {k}")
        self.k = int(k)
        self.values = np.empty(0) if values is None else values
        self.weights = np.empty(0) if weights is None else weights

    @property
    def total_weight(self) -> float:
        return float(self.weights.sum())

    def update_array(self, arr: np.ndarray) -> "QuantileSketch":
        a = np.asarray(arr, dtype=np.float64)
        a = a[~np.isnan(a)]
        if len(a):
            self._absorb(np.sort(a), np.ones(len(a)))
        return self

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        if len(other.values):
            self._absorb(other.values, other.weights)
        return self

    def _absorb(self, values: np.ndarray, weights: np.ndarray) -> None:
        v = np.concatenate([self.values, values])
        w = np.concatenate([self.weights, weights])
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        if len(v) > self.k:
            cum = np.cumsum(w)
            total = cum[-1]
            targets = total * np.arange(1, self.k + 1) / self.k
            idx = np.unique(np.searchsorted(cum, targets, side="left"))
            idx[-1] = len(v) - 1  # keep the exact max
            w = np.diff(np.concatenate([[0.0], cum[idx]]))
            v = v[idx]
        self.values, self.weights = v, w

    def quantile(self, q: float) -> float:
        """Weighted-CDF interpolation at rank q·N (midpoint rule, so the
        min/max map to q=0/1 exactly)."""
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile must be in [0, 1], got {q}")
        if not len(self.values):
            return float("nan")
        cum = np.cumsum(self.weights)
        mid = cum - self.weights / 2.0
        rank = q * cum[-1]
        return float(np.interp(rank, mid, self.values))

    def to_state(self) -> tuple:
        return (self.k, self.values, self.weights)

    @classmethod
    def from_state(cls, state: tuple) -> "QuantileSketch":
        k, v, w = state
        return cls(k, v, w)
