"""Pre-aggregated distributed groupby (the partial/combiner pattern).

Scale design: a naive ``ds.groupby(keys).aggregate(...)`` shuffles every row.
Here each input batch is first collapsed to one row per key (pandas groupby
inside ``map_batches``), so the all-to-all exchange moves |keys| x |batches|
partial rows — for low-cardinality keys that is thousands of rows regardless
of input size. The reference has no distributed aggregation at all (its
``EngineConfig.parallel`` is config-only, config.rs:359-369); this operator is
the Ray-native generalization of its per-chunk accumulate + merge scheme
(streaming_stats.rs:329-345).

Supported partial-mergeable aggregates: sum, count, min, max — and any
derived value (mean, ratio) computed on the tiny final frame by the caller.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa


def round_away(values, decimals: int):
    """Round half away from zero — matches DuckDB/SQL ROUND semantics, unlike
    numpy's banker's rounding. Used so Ray results and oracle SQL agree."""
    a = np.asarray(values, dtype=np.float64)
    factor = 10.0 ** decimals
    return np.sign(a) * np.floor(np.abs(a) * factor + 0.5) / factor


def preagg_groupby(
    ds,
    keys: Sequence[str],
    specs: Sequence[tuple],
    batch_size: Optional[int] = 8192,
) -> pd.DataFrame:
    """Two-level aggregate: per-batch partials -> groupby over partials.

    ``specs``: (out_name, src_col, fn) with fn in {sum, count, min, max};
    ``src_col`` is ignored for count. Returns a pandas DataFrame (small by
    construction: one row per distinct key).
    """
    from ray.data.aggregate import Max, Min, Sum

    keys = list(keys)

    def partials(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # dropna=False: SQL GROUP BY and Ray's groupby both emit a null-key
        # group; pandas' default would silently drop those rows here
        g = df.groupby(keys, sort=False, dropna=False)
        out = {}
        for name, col, fn in specs:
            if fn == "count":
                out[name] = g.size()
            elif fn in ("sum", "min", "max"):
                out[name] = getattr(g[col], fn)()
            else:
                raise ValueError(f"unsupported partial aggregate: {fn}")
        res = pd.DataFrame(out).reset_index()
        return pa.Table.from_pandas(res, preserve_index=False)

    final_aggs = []
    for name, _col, fn in specs:
        cls = {"sum": Sum, "count": Sum, "min": Min, "max": Max}[fn]
        final_aggs.append(cls(name, alias_name=name))

    agg = (
        ds.map_batches(partials, batch_format="pyarrow", batch_size=batch_size)
        .groupby(keys)
        .aggregate(*final_aggs)
    )
    return agg.to_pandas().sort_values(keys).reset_index(drop=True)
