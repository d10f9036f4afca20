"""Broadcast (map-side) joins.

The reference is single-table (SURVEY.md §2.6: no joins of any kind); a
training-data engine needs at least the small-side join. Ray-Data-first
design: the small side is materialized ONCE into a lookup table, put in the
object store (`ray.put`), and read by reference inside every map task — the
big side never shuffles. This is the only join shape that stays cheap at
100 TB; large-large joins would need a hash-partitioned cogroup (documented
extension point, not claimed).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa


def broadcast_lookup(small_ds_or_table, key: str, columns: Sequence[str]) -> dict:
    """Materialize the small side to {key -> tuple(columns)} (driver-side;
    the small side must fit in memory — that is the operator's contract).

    Arrow-native (``to_pylist``): a pandas round-trip would launder nullable
    ints into float64/NaN and corrupt null semantics. Small-side keys must
    be UNIQUE — a duplicate would silently pick one row where SQL JOIN
    multiplies rows, so it raises instead."""
    table = small_ds_or_table
    if not isinstance(table, pa.Table):
        table = pa.concat_tables(
            list(table.iter_batches(batch_format="pyarrow"))
        )
    keys = table.column(key).to_pylist()
    cols = [table.column(c).to_pylist() for c in columns]
    lookup: dict = {}
    for i, k in enumerate(keys):
        if k in lookup:
            raise ValueError(
                f"broadcast_join small side has duplicate key {k!r}; "
                "the operator requires unique small-side keys"
            )
        lookup[k] = tuple(col[i] for col in cols)
    return lookup


class _BroadcastJoiner:
    def __init__(self, lookup_ref, big_key: str, columns: Sequence[str],
                 types: Sequence[pa.DataType], how: str) -> None:
        import ray

        self.lookup = ray.get(lookup_ref) if not isinstance(lookup_ref, dict) \
            else lookup_ref
        self.big_key = big_key
        self.columns = list(columns)
        self.types = list(types)  # pin types: an all-null batch (left join,
        self.how = how            # no matches) must not infer a null column
        # identity sentinel — a tuple of Nones would collide with the
        # interned empty tuple when columns=[] (semi-join use)
        self.missing = object()

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.big_key).to_pylist()
        get = self.lookup.get
        miss = self.missing
        rows = [get(k, miss) for k in keys]
        if self.how == "inner":
            mask = np.fromiter((r is not miss for r in rows),
                               dtype=bool, count=len(rows))
            batch = batch.filter(pa.array(mask))
            rows = [r for r in rows if r is not miss]
        for i, col in enumerate(self.columns):
            batch = batch.append_column(
                col, pa.array([None if r is miss else r[i] for r in rows],
                              self.types[i]))
        return batch


def broadcast_join(
    big_ds,
    small,
    *,
    big_key: str,
    small_key: str,
    columns: Sequence[str],
    how: str = "inner",
    concurrency=(1, 8),
    batch_size: Optional[int] = 4096,
):
    """Join a large Dataset against a small side without any shuffle.

    ``small`` may be a Dataset or pyarrow.Table; ``columns`` are the small
    side's columns appended to each matching big-side row. ``how`` is
    "inner" (drop unmatched) or "left" (null-fill). The lookup dict ships
    once via ray.put; actors dereference it in __init__."""
    import ray

    if how not in ("inner", "left"):
        raise ValueError(f"unsupported join type: {how}")
    small_schema = small.schema if isinstance(small, pa.Table) \
        else small.schema().base_schema
    types = [small_schema.field(c).type for c in columns]
    lookup_ref = ray.put(broadcast_lookup(small, small_key, columns))
    return big_ds.map_batches(
        _BroadcastJoiner, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(lookup_ref=lookup_ref, big_key=big_key,
                                   columns=columns, types=types, how=how),
    )
