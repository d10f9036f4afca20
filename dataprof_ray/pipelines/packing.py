"""Sequence packing for LLM training: assign documents to fixed-length
training sequences.

Two public flavors (both standard; e.g. GPT-3-style concat-and-chunk,
and first-fit-decreasing bin packing as used by "packing without
cross-contamination" recipes):

- :func:`pack_concat_chunk` — concatenate each partition's token stream
  in doc_id order and cut every ``max_len`` tokens; documents may span
  sequence boundaries. Deterministic pure function of the corpus
  (partition = ``doc_id % parts``), so it has an exact SQL window-
  function oracle.
- :func:`pack_bins` — first-fit-decreasing bin packing per partition:
  no document is split; docs longer than ``max_len`` are flagged
  oversize (``bin_id = -1``) for upstream chunking. FFD guarantees
  ≤ 11/9·OPT + 1 bins (public result, Johnson 1973).

Scale design: only ``(doc_id, n_tokens)`` ever shuffles — 16 bytes per
document, never text or token ids. Packing itself is partition-local
(exactly how a data-parallel trainer consumes shards), vectorized
cumsum for concat-chunk, and an O(docs × open-bins) FFD loop bounded
by the coarse partition size for bins. Token counts use the same
whitespace contract as `textstats.token_count` (oracle-aligned).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from dataprof_ray.pipelines.partitioning import arrow_out
from dataprof_ray.pipelines.textstats import token_count

DEFAULT_PARTS = 32


def _token_len_stage(text_col: str, id_col: str, parts: int):
    def stage(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        n_tok = np.fromiter(
            (token_count(t) for t in batch.column(text_col).to_pylist()),
            dtype=np.int64, count=len(ids))
        return pa.table({
            id_col: batch.column(id_col),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "part": pa.array((ids % parts).astype(np.int64), pa.int64()),
        })
    return stage


def pack_concat_chunk(ds, max_len: int = 2048, parts: int = DEFAULT_PARTS,
                      text_col: str = "text", id_col: str = "doc_id"):
    """Per-document sequence mapping under concat-and-chunk packing:
    ``tok_offset`` (start position in the partition's doc_id-ordered
    token stream), ``seq_start``/``seq_end`` (first/last sequence index
    the document lands in; empty docs occupy no tokens and report their
    stream position's sequence for both)."""
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")

    def chunk_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col).reset_index(drop=True)
        n = df["n_tokens"].to_numpy()
        off = np.concatenate(([0], np.cumsum(n)[:-1]))
        seq_start = off // max_len
        last = np.where(n > 0, off + n - 1, off)
        df["tok_offset"] = off
        df["seq_start"] = seq_start
        df["seq_end"] = last // max_len
        return df

    return (ds.select_columns([id_col, text_col])
            .map_batches(_token_len_stage(text_col, id_col, parts),
                         batch_format="pyarrow")
            .groupby("part")
            .map_groups(arrow_out(chunk_partition), batch_format="pandas"))


def pack_bins(ds, max_len: int = 2048, parts: int = DEFAULT_PARTS,
              text_col: str = "text", id_col: str = "doc_id"):
    """First-fit-decreasing bin packing per partition. Returns one row per
    document: ``bin_id`` is partition-local (global sequence id is
    ``(part, bin_id)``); oversize docs get ``bin_id = -1``."""
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")

    def ffd_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n_tokens", id_col],
                            ascending=[False, True]).reset_index(drop=True)
        n = df["n_tokens"].to_numpy()
        bins = np.full(len(df), -1, dtype=np.int64)
        caps: list = []  # remaining capacity per open bin
        for i, tok in enumerate(n):
            if tok > max_len:
                continue
            for b, cap in enumerate(caps):
                if cap >= tok:
                    caps[b] = cap - tok
                    bins[i] = b
                    break
            else:
                caps.append(max_len - tok)
                bins[i] = len(caps) - 1
        df["bin_id"] = bins
        return df.sort_values(id_col).reset_index(drop=True)

    return (ds.select_columns([id_col, text_col])
            .map_batches(_token_len_stage(text_col, id_col, parts),
                         batch_format="pyarrow")
            .groupby("part")
            .map_groups(arrow_out(ffd_partition), batch_format="pandas"))


def packing_efficiency(ds, max_len: int = 2048, parts: int = DEFAULT_PARTS,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> pd.DataFrame:
    """One-row audit of :func:`pack_bins`: bins used vs the per-partition
    token lower bound (``ceil(packable_tokens / max_len)`` summed over
    partitions), plus the oversize count. ``efficiency`` = lower bound /
    bins used — 1.0 is perfect packing. Aggregation is per-partition
    (sums and maxes), so the driver folds ``parts`` tiny rows."""
    packed = pack_bins(ds, max_len, parts, text_col, id_col)

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        ok = df[df["bin_id"] >= 0]
        fills = ok.groupby("bin_id")["n_tokens"].sum()
        return pd.DataFrame([{
            "n_docs": len(df),
            "oversize_docs": int((df["bin_id"] < 0).sum()),
            "n_bins": int(df["bin_id"].max() + 1) if len(ok) else 0,
            "lb_bins": int(-(-int(ok["n_tokens"].sum()) // max_len)),
            "max_bin_tokens": int(fills.max()) if len(fills) else 0,
        }])

    per_part = (packed.groupby("part")
                .map_groups(arrow_out(agg), batch_format="pandas")
                .to_pandas())
    n_bins = int(per_part["n_bins"].sum())
    lb = int(per_part["lb_bins"].sum())
    return pd.DataFrame([{
        "n_docs": int(per_part["n_docs"].sum()),
        "oversize_docs": int(per_part["oversize_docs"].sum()),
        "n_bins": n_bins,
        "lb_bins": lb,
        "efficiency": round(lb / n_bins, 4) if n_bins else 1.0,
        "max_bin_tokens": int(per_part["max_bin_tokens"].max()),
        "max_len": max_len,
    }])
