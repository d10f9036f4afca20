"""Windowed aggregates over event streams.

The reference is single-table/order-insensitive (SURVEY.md §2.6: no event-time
semantics) — but its ``DataSource::Stream`` metadata (source.rs:90-121)
anticipates batch-of-stream profiling. This operator family adds the
windowing a training-data/event pipeline needs, Ray-Data-first:

- tumbling windows: assign window = floor(ts / width) per batch (stateless,
  vectorized), then the pre-aggregated groupby from pipelines.aggregate —
  the shuffle moves (key, window) partials, never events.
- session windows / watermarks are intentionally NOT claimed: they need
  ordered per-key state (an actor-pool stage keyed by a hash partition);
  documented as the extension point.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from dataprof_ray.pipelines.aggregate import preagg_groupby, round_away

_UNITS = {"hour": "h", "day": "D", "minute": "m"}


def tumbling_window(
    ds,
    ts_col: str,
    unit: str = "hour",
    keys: Sequence[str] = (),
    value_col: Optional[str] = None,
) -> pd.DataFrame:
    """Tumbling-window aggregate: rows bucketed by truncating ``ts_col`` to
    ``unit`` (hour/day/minute), grouped by (window, *keys), emitting
    count + sum/min/max of ``value_col`` (if given).

    Window assignment is a per-batch Arrow kernel; the groupby sees only
    per-batch partials (one row per window x key per batch)."""
    if unit not in _UNITS:
        raise ValueError(f"unknown window unit: {unit} (use {sorted(_UNITS)})")
    keys = list(keys)

    def assign(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch.column(ts_col), unit=unit)
        cols = {"window": pc.cast(win, pa.timestamp("us"))}
        for k in keys:
            cols[k] = batch.column(k)
        if value_col is not None:
            cols[value_col] = batch.column(value_col)
        return pa.table(cols)

    specs = [("cnt", None, "count")]
    if value_col is not None:
        specs += [
            ("sum_value", value_col, "sum"),
            ("min_value", value_col, "min"),
            ("max_value", value_col, "max"),
        ]
    out = preagg_groupby(ds.map_batches(assign, batch_format="pyarrow"),
                         ["window"] + keys, specs)
    if value_col is not None:
        out["sum_value"] = round_away(out["sum_value"], 2)
    return out
