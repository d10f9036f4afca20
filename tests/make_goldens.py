"""Regenerate the pinned-golden outputs for deterministic no-oracle queries.

The driver's correctness gate only value-checks queries with a DuckDB
oracle; the queries pinned here are deterministic but not SQL-expressible
(sketches, LSH, model scoring), so their outputs are pinned as parquet
goldens at sf0.001 and compared by tests/test_entry_contract.py with tight
float tolerance. Run this ONLY after verifying a semantic change is
intended:

    python tests/make_goldens.py
"""

from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF = "/root/testdata/sf0.001"
GOLDEN_DIR = Path(__file__).resolve().parent / "golden"

# Deterministic no-oracle queries: every one of these must produce an
# identical frame (up to float round-off and row order) on every run and
# at every parallelism. Self-measuring audits (embedding_neardup_recall,
# ivf_recall) and the planted-clone cluster query (family-checked in
# test_entry_contract) are excluded.
PINNED = [
    "simhash_signatures",
    "minhash_duplicate_groups",
    "ngram_jaccard_pairs",
    "quality_filter_documents",
    "domain_rollup",
    "profile_report_documents",
    "image_features",
    "approx_distinct_lineitem",
    "ivf_topk",
    "compression_ratio_documents",
    "packed_sequences_documents",
    "substring_dedup_documents",
    "url_dedup_documents",
]


def canonicalize(df):
    """Sort columns by name and rows by the non-float scalar columns so
    block order can't leak into the comparison. List/array cells become
    tuples (hashable, parquet-roundtrip-stable)."""
    import numpy as np

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "O":
            vals = df[c].dropna()
            if len(vals) and isinstance(vals.iloc[0], (list, np.ndarray)):
                df[c] = df[c].map(
                    lambda v: tuple(v.tolist() if hasattr(v, "tolist") else v)
                    if v is not None else None)
    sort_cols = [c for c in df.columns
                 if df[c].dtype.kind in "biuM"
                 or (df[c].dtype.kind == "O"
                     and all(isinstance(v, str) for v in df[c].dropna().head(3)))]
    if not sort_cols:
        sort_cols = list(df.columns)
    return df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__ as E
    from entry_parity import to_pandas

    GOLDEN_DIR.mkdir(exist_ok=True)
    qs = E.queries()
    for name in PINNED:
        df = canonicalize(to_pandas(qs[name](SF)))
        out = GOLDEN_DIR / f"{name}.parquet"
        df.to_parquet(out, index=False)
        print(f"pinned {name}: {len(df)} rows -> {out}")
    ray.shutdown()


if __name__ == "__main__":
    main()
