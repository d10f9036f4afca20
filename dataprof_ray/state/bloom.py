"""Mergeable Bloom filter for broadcast membership at corpus scale.

The decontamination scan (`pipelines/decontam.py`) broadcasts the
benchmark n-gram set; a frozenset costs ~100 B per entry, so a 10^8-gram
eval suite would ship tens of GB to every worker. A Bloom filter at the
same false-positive rate costs ~``-1.44 log2(p)`` BITS per entry (~18 MB
per 10^7 entries at p=1e-4), with NO false negatives — a miss is always a
real miss, so decontamination can only over-flag, never leak a
contaminated doc.

Standard construction (public: Bloom 1970; Kirsch & Mitzenmacher 2006
double hashing): two independent 64-bit halves of one blake2b digest
generate all k probe positions. Filters of identical (m, k) merge by OR —
per-batch local filters fold associatively, so the build is one streaming
pass with KB..MB-scale partials.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np


def bloom_from_u64_batches(ds, keys_fn, capacity: int, fp_rate: float):
    """Build one Bloom filter over a Dataset: ``keys_fn(batch) ->
    np.uint64 array`` extracts the items; each BLOCK emits one fixed-size
    partial (``batch_size=None``) and the driver OR-folds them through
    the shape-validated :meth:`BloomFilter.merge_bytes`. Shared by the
    decontamination and incremental-dedup builders."""
    import pyarrow as pa

    capacity = max(1, int(capacity))

    def build(batch):
        bf = BloomFilter(capacity, fp_rate)
        bf.add_u64(keys_fn(batch))
        return pa.table({
            "bits": pa.array([bf.bits.tobytes()], pa.large_binary()),
            "n_added": pa.array([bf.n_added], pa.int64()),
        })

    merged = BloomFilter(capacity, fp_rate)
    for part in (ds.map_batches(build, batch_format="pyarrow",
                                batch_size=None)
                 .iter_batches(batch_format="pyarrow")):
        for bits, n_added in zip(part.column("bits").to_pylist(),
                                 part.column("n_added").to_pylist()):
            merged.merge_bytes(bits, n_added)
    return merged


class BloomFilter:
    """Fixed-size bit-array Bloom filter. Deterministic (pure function of
    the inserted set), mergeable via :meth:`merge`, picklable (rides
    ``ray.put`` as one numpy buffer), and usable anywhere a set is read:
    ``"x" in bf``."""

    def __init__(self, capacity: int, fp_rate: float = 1e-4):
        if capacity < 1:
            raise ValueError(f"capacity must be >= 1, got {capacity}")
        if not (0.0 < fp_rate < 1.0):
            raise ValueError(f"fp_rate must be in (0, 1), got {fp_rate}")
        ln2 = math.log(2.0)
        self.m = max(64, int(math.ceil(-capacity * math.log(fp_rate) / ln2 ** 2)))
        self.k = max(1, round(self.m / capacity * ln2))
        self.capacity = capacity
        self.fp_rate = fp_rate
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)
        self.n_added = 0

    # ------------------------------------------------------------- probes

    def _positions(self, item: str) -> np.ndarray:
        d = hashlib.blake2b(item.encode("utf-8"), digest_size=16).digest()
        h1 = int.from_bytes(d[:8], "little")
        h2 = int.from_bytes(d[8:], "little") | 1  # odd => full-period step
        return (h1 + np.arange(self.k, dtype=np.uint64) * np.uint64(h2)) \
            % np.uint64(self.m)

    # ------------------------------------------------------------ mutation

    def add(self, item: str) -> None:
        pos = self._positions(item)
        np.bitwise_or.at(self.bits, pos >> 6,
                         np.uint64(1) << (pos & np.uint64(63)))
        self.n_added += 1

    def add_many(self, items) -> None:
        for it in items:
            self.add(it)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        """OR-fold another filter built with identical (m, k) parameters."""
        if (self.m, self.k) != (other.m, other.k):
            raise ValueError(
                f"cannot merge Bloom filters with different shapes: "
                f"(m={self.m}, k={self.k}) vs (m={other.m}, k={other.k})")
        self.bits |= other.bits
        self.n_added += other.n_added
        return self

    def merge_bytes(self, bits: bytes, n_added: int) -> "BloomFilter":
        """OR-fold a serialized partial (``bits.tobytes()`` of a filter
        built with the same (m, k)) — the driver-side fold for per-batch
        partials, with the same shape guard as :meth:`merge`."""
        arr = np.frombuffer(bits, dtype=np.uint64)
        if len(arr) != len(self.bits):
            raise ValueError(
                f"cannot merge Bloom partial of {len(arr)} words into a "
                f"filter of {len(self.bits)} words (mismatched capacity "
                f"or fp_rate)")
        self.bits |= arr
        self.n_added += int(n_added)
        return self

    # --------------------------------------------------- vectorized uint64

    # splitmix64 finalizer constants (public domain, Steele et al. 2014) —
    # turn one 64-bit content hash into two independent probe hashes with
    # pure numpy (no per-item hashlib call in the corpus-scan hot path).
    _MIX1 = np.uint64(0xBF58476D1CE4E5B9)
    _MIX2 = np.uint64(0x94D049BB133111EB)
    _SALT = np.uint64(0x9E3779B97F4A7C15)

    @staticmethod
    def _splitmix(x: np.ndarray) -> np.ndarray:
        x = (x ^ (x >> np.uint64(30))) * BloomFilter._MIX1
        x = (x ^ (x >> np.uint64(27))) * BloomFilter._MIX2
        return x ^ (x >> np.uint64(31))

    def _positions_u64(self, items: np.ndarray) -> np.ndarray:
        """(n, k) probe positions for an array of uint64 items."""
        items = items.astype(np.uint64, copy=False)
        h1 = self._splitmix(items)
        h2 = self._splitmix(items + self._SALT) | np.uint64(1)
        ks = np.arange(self.k, dtype=np.uint64)
        return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(self.m)

    def add_u64(self, items: np.ndarray) -> None:
        """Vectorized insert of a uint64 array (e.g. per-batch content
        hashes); one numpy pass, no Python per-item loop."""
        if len(items) == 0:
            return
        pos = self._positions_u64(items)
        np.bitwise_or.at(self.bits, pos >> np.uint64(6),
                         np.uint64(1) << (pos & np.uint64(63)))
        self.n_added += len(items)

    def contains_u64(self, items: np.ndarray) -> np.ndarray:
        """Vectorized membership test; returns a boolean array. No false
        negatives; positives are true with probability ~1 - fp_rate."""
        if len(items) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions_u64(items)
        word = self.bits[pos >> np.uint64(6)]
        return (((word >> (pos & np.uint64(63))) & np.uint64(1))
                .all(axis=1))

    # ------------------------------------------------------------- queries

    def __contains__(self, item: str) -> bool:
        pos = self._positions(item)
        word = self.bits[pos >> 6]
        return bool(((word >> (pos & np.uint64(63))) & np.uint64(1)).all())

    def fill_ratio(self) -> float:
        """Fraction of set bits — the saturation meter: observed
        false-positive rate is ``fill_ratio ** k``."""
        return float(np.unpackbits(self.bits.view(np.uint8)).sum()) / self.m

    def observed_fp_rate(self) -> float:
        return self.fill_ratio() ** self.k

    def __getstate__(self):
        return (self.m, self.k, self.capacity, self.fp_rate,
                self.n_added, self.bits.tobytes())

    def __setstate__(self, state):
        self.m, self.k, self.capacity, self.fp_rate, self.n_added, raw = state
        self.bits = np.frombuffer(raw, dtype=np.uint64).copy()
