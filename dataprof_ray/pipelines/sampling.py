"""Sampling strategies over a Dataset.

Behavior parity (not a port) with the reference's sampling layer
(/root/reference/crates/dataprof-core/src/sampling/strategies.rs:14-260):

- none / random / reservoir (fixed size)      -> strategies.rs:17-34
- systematic every-Nth                        -> strategies.rs:36-44
- stratified per-key cap (multi-key,
  rows missing a key excluded)                -> strategies.rs:121-149
- importance = threshold filter on a weight   -> strategies.rs:56-60
- multi-stage: filters then <=1 fixed-size    -> strategies.rs:86-117
- adaptive chooser by rows/MB                 -> strategies.rs:159-180

Ray-Data-first notes: random sampling is ``ds.random_sample`` (stateless,
streaming); the fixed-size reservoir folds per-block reservoirs with the
deterministic merge from state.accumulators; systematic is per-partition
over a global running offset (computed from block row counts — no shuffle);
stratified caps each key via a hash-partitioned groupby.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from dataprof_ray.state.accumulators import RESERVOIR_SEED, ReservoirSampler


def random_sample(ds, fraction: float, seed: int = RESERVOIR_SEED):
    """Bernoulli sample — streaming, no shuffle (strategies.rs Random)."""
    return ds.random_sample(fraction, seed=seed & 0x7FFFFFFF)


def reservoir_sample(ds, size: int, seed: int = RESERVOIR_SEED) -> pa.Table:
    """Fixed-size uniform sample: per-block reservoirs folded in
    deterministic block order (the reference buffers and folds at
    end-of-stream, incremental.rs:313-323). Returns a pyarrow.Table of
    ``size`` rows (fewer if the dataset is smaller)."""
    import pickle

    def block_reservoir(batch: pa.Table) -> pa.Table:
        r = ReservoirSampler(size, seed)
        r.offer_lazy(
            batch.num_rows,
            lambda idx: batch.take(pa.array(idx, pa.int64())).to_pylist(),
        )
        return pa.table({
            "n": pa.array([r.count], pa.int64()),
            "blob": pa.array([pickle.dumps((r.count, r.reservoir))], pa.binary()),
        })

    parts = ds.map_batches(block_reservoir, batch_format="pyarrow").take_all()
    merged = ReservoirSampler(size, seed)
    for part in sorted(parts, key=lambda p: p["blob"]):
        count, rows = pickle.loads(part["blob"])
        other = ReservoirSampler(size, seed)
        other.reservoir = rows
        other.count = count
        merged.merge(other)
    if not merged.reservoir:
        return pa.table({})
    return pa.Table.from_pylist(merged.reservoir)


def systematic_sample(ds, every_n: int) -> pa.Table:
    """Every-Nth row in dataset order (strategies.rs:36-44, positional
    semantics). Positional order is inherently sequential, so this streams
    batches to the driver in order and keeps a running offset — use only on
    small/medium data; the distributed-safe scale path is
    ``systematic_by_key`` (order-free, SQL-checkable)."""
    if every_n <= 1:
        return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))

    out = []
    offset = 0
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
        first = (-offset) % every_n
        idx = np.arange(first, batch.num_rows, every_n)
        if len(idx):
            out.append(batch.take(pa.array(idx, pa.int64())))
        offset += batch.num_rows
    if not out:
        return pa.table({})
    return pa.concat_tables(out)


def systematic_by_key(ds, key: str, every_n: int, offset: int = 0):
    """Distributed-safe systematic variant: keep rows where key % N == offset.
    Deterministic, order-free, and SQL-checkable — the scale path when a
    dense integer key exists."""
    def pick(batch: pa.Table) -> pa.Table:
        keys = batch.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(keys % every_n == offset))

    return ds.map_batches(pick, batch_format="pyarrow")


def stratified_sample(ds, keys: Sequence[str], per_key: int,
                      order_col: Optional[str] = None):
    """At most ``per_key`` rows per distinct key combination; rows with a
    null in any key column are EXCLUDED (strategies.rs:121-149 multi-key
    semantics). Deterministic when ``order_col`` is given (smallest first);
    the groupby shuffles only rows, keyed by the stratum."""
    keys = list(keys)

    def cap(group: pd.DataFrame) -> pd.DataFrame:
        if order_col is not None:
            group = group.sort_values(order_col)
        return group.head(per_key)

    def drop_null_keys(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = None
        for k in keys:
            valid = pc.is_valid(batch.column(k))
            mask = valid if mask is None else pc.and_(mask, valid)
        return batch.filter(mask)

    return (
        ds.map_batches(drop_null_keys, batch_format="pyarrow")
        .groupby(keys)
        .map_groups(cap, batch_format="pandas")
    )


def importance_sample(ds, weight_col: str, threshold: float):
    """Keep rows whose weight >= threshold (strategies.rs:56-60)."""
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column(weight_col), threshold)),
        batch_format="pyarrow",
    )


def multi_stage_sample(ds, stages: Sequence[tuple]):
    """Compose stages: any number of filter stages and at most ONE final
    fixed-size stage (strategies.rs:86-117 validation). Stage specs:
    ("importance", col, threshold) | ("systematic_key", col, n) |
    ("random", fraction) | ("reservoir", size)."""
    fixed_seen = False
    out = ds
    for i, spec in enumerate(stages):
        kind = spec[0]
        if fixed_seen:
            raise ValueError("fixed-size stage must be last")
        if kind == "importance":
            out = importance_sample(out, spec[1], spec[2])
        elif kind == "systematic_key":
            out = systematic_by_key(out, spec[1], spec[2])
        elif kind == "random":
            out = random_sample(out, spec[1])
        elif kind == "reservoir":
            out = reservoir_sample(out, spec[1])
            fixed_seen = True
        else:
            raise ValueError(f"unknown stage kind: {kind}")
    return out


def choose_strategy(total_rows: int, total_mb: float) -> dict:
    """Adaptive chooser mirroring strategies.rs:159-180 thresholds: small
    data -> none; medium -> random; large -> reservoir cap."""
    if total_rows <= 100_000 and total_mb <= 50:
        return {"kind": "none"}
    if total_rows <= 5_000_000:
        return {"kind": "random", "fraction": min(1.0, 500_000 / max(total_rows, 1))}
    return {"kind": "reservoir", "size": 500_000}
