"""Coarse hash-partitioning helpers for keyed-state operators.

The measured pattern (see dedup.py connected_components notes): Ray's
groupby over MANY tiny groups — one per distinct key — pays per-group
scheduling that dwarfs the work (9s for 9k single-row groups where one
pandas pass takes under a second). Every keyed-state operator therefore
partitions by ``hash(key) % partitions`` (64 coarse groups regardless of
key cardinality) and processes ALL keys of a partition in one vectorized
pandas transform. Correctness only needs all rows of one key to co-locate,
which any deterministic key hash gives.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

DEFAULT_PARTITIONS = 64

_MIX = np.uint64(0x9E3779B97F4A7C15)


def column_hashes(column: pa.ChunkedArray | pa.Array, seed: int = 0) -> np.ndarray:
    """Deterministic 64-bit hash per value of an Arrow column (polars hash —
    note it is dtype-sensitive; cast mixed-typed keys to one type first)."""
    import polars as pl

    arr = column.combine_chunks() if isinstance(column, pa.ChunkedArray) else column
    return pl.from_arrow(arr).hash(seed=seed).to_numpy().astype(np.uint64)


def multikey_parts(batch: pa.Table, keys: Sequence[str],
                   partitions: int = DEFAULT_PARTITIONS) -> np.ndarray:
    """Coarse partition id per row from the combined hash of ``keys``.
    Null key values hash like polars hashes nulls (stable), so callers that
    must EXCLUDE null keys filter before partitioning."""
    h = None
    with np.errstate(over="ignore"):
        for i, k in enumerate(keys):
            hk = column_hashes(batch.column(k), seed=i)
            h = hk if h is None else (h * _MIX) ^ hk
    return (h % np.uint64(partitions)).astype(np.int32)


def add_part_column(batch: pa.Table, keys: Sequence[str],
                    partitions: int = DEFAULT_PARTITIONS,
                    col: str = "__part") -> pa.Table:
    """Append the coarse partition id as ``col`` (map_batches-ready)."""
    return batch.append_column(
        col, pa.array(multikey_parts(batch, keys, partitions), pa.int32()))


def arrow_out(fn):
    """Wrap a DataFrame-returning map_groups/map_batches UDF so its output
    is a METADATA-FREE Arrow table. Ray converts a returned DataFrame via
    ``pa.Table.from_pandas``, which attaches a ``b'pandas'`` schema-metadata
    blob; a pa.Schema carrying metadata is unhashable (``hash(schema)``
    raises on the dict), so every later shuffle that unifies block schemas
    logs "Failed to hash the schemas" and pays an O(blocks) unify. Use on
    any pandas UDF whose output feeds another groupby/sort."""
    import functools

    import pandas as pd

    @functools.wraps(fn)
    def wrapped(df, *args, **kwargs):
        out = fn(df, *args, **kwargs)
        if isinstance(out, pd.DataFrame):
            return pa.Table.from_pandas(
                out, preserve_index=False).replace_schema_metadata(None)
        return out

    return wrapped
