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


def packed_sequences(ds, max_len: int = 2048, parts: int = DEFAULT_PARTS,
                     text_col: str = "text", id_col: str = "doc_id",
                     docs_per_bucket: int = 4096,
                     assemble_parts: int = None):
    """Materialize the actual concat-and-chunk training sequences: one row
    per sequence with ``(part, seq_id, n_tokens, text)``, where text is the
    space-joined token stream slice (whitespace tokenization — the packed
    text is normalized to single spaces; byte-exact reconstruction is the
    export_shuffled + trainer-side-tokenize path).

    Scale design — no task ever holds a whole partition stream:

    1. offsets pass (ids only): per-batch partial token counts per
       (part, id-bucket) fold into broadcast prefix offsets, exactly the
       `sampling.shuffle_rank` pattern (bucket = ``doc_id //
       docs_per_bucket``; within a part, ascending buckets = ascending
       doc_id = stream order).
    2. fragment pass: docs group by (part, bucket) — bounded at
       ``docs_per_bucket`` rows — compute their exact token offsets from
       the bucket base, and emit one FRAGMENT per (doc x sequence it
       touches): (part, seq_id, frag_offset, fragment text).
    3. assembly: fragments cogroup on ``hash(part, seq) %
       assemble_parts`` COARSE partitions; one vectorized pandas pass
       per partition joins each sequence's fragments in offset order.

    Text moves twice ((part,bucket) grouping, then sequence assembly) —
    the unavoidable cost of materializing sequences that span document
    and bucket boundaries."""
    import ray

    from dataprof_ray.pipelines.textstats import _WS_SPLIT

    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    a_parts = assemble_parts or DEFAULT_PARTS

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        part = (ids % parts).astype(np.int64)
        bucket = ids // docs_per_bucket
        n_tok = np.fromiter(
            (token_count(t) for t in batch.column(text_col).to_pylist()),
            dtype=np.int64, count=len(ids))
        return (batch.select([id_col, text_col])
                .append_column("part", pa.array(part, pa.int64()))
                .append_column("__bucket", pa.array(bucket, pa.int64()))
                .append_column("n_tokens", pa.array(n_tok, pa.int64())))

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")

    # ---- pass 1: (part, bucket) token totals -> base offsets (driver-side
    # fold of sparse partials; cells = distinct buckets, bounded by
    # n_docs / docs_per_bucket x parts spread)
    def count_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "part": batch.column("part").to_numpy(zero_copy_only=False),
            "bucket": batch.column("__bucket").to_numpy(zero_copy_only=False),
            "tok": batch.column("n_tokens").to_numpy(zero_copy_only=False),
        })
        g = df.groupby(["part", "bucket"], as_index=False)["tok"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    folded = (keyed_ds.select_columns(["part", "__bucket", "n_tokens"])
              .map_batches(count_partial, batch_format="pyarrow",
                           batch_size=None)
              .to_pandas()
              .groupby(["part", "bucket"], as_index=False)["tok"].sum()
              .sort_values(["part", "bucket"]))
    folded["base"] = (folded.groupby("part")["tok"].cumsum()
                      - folded["tok"])
    base_of = {(int(p), int(b)): int(o) for p, b, o in
               zip(folded["part"], folded["bucket"], folded["base"])}
    base_ref = ray.put(base_of)

    # ---- pass 2: per-(part,bucket) group -> fragments
    def fragments(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"part": pd.Series([], dtype=np.int64),
                                 "seq_id": pd.Series([], dtype=np.int64),
                                 "frag_off": pd.Series([], dtype=np.int64),
                                 "frag": pd.Series([], dtype=str)})
        bases = ray.get(base_ref)
        part = int(df["part"].iloc[0])
        off = bases[(part, int(df["__bucket"].iloc[0]))]
        df = df.sort_values(id_col)
        rows = []
        for t, n in zip(df[text_col], df["n_tokens"]):
            n = int(n)
            if n == 0:
                continue
            toks = _WS_SPLIT.split((t or "").strip())
            for s in range(off // max_len, (off + n - 1) // max_len + 1):
                lo = max(0, s * max_len - off)
                hi = min(n, (s + 1) * max_len - off)
                rows.append((part, s, off + lo, " ".join(toks[lo:hi])))
            off += n
        return pd.DataFrame(rows, columns=["part", "seq_id", "frag_off",
                                           "frag"])

    frag_ds = (keyed_ds
               .groupby(["part", "__bucket"])
               .map_groups(arrow_out(fragments), batch_format="pandas"))

    # ---- pass 3: coarse assembly
    def add_akey(batch: pa.Table) -> pa.Table:
        p = batch.column("part").to_numpy(zero_copy_only=False)
        s = batch.column("seq_id").to_numpy(zero_copy_only=False)
        ak = ((p.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
               + s.astype(np.uint64))
              % np.uint64(a_parts)).astype(np.int64)
        return batch.append_column("__akey", pa.array(ak, pa.int64()))

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["part", "seq_id", "frag_off"])
        g = df.groupby(["part", "seq_id"], as_index=False).agg(
            text=("frag", " ".join))
        g["n_tokens"] = [len(_WS_SPLIT.split(t)) if t else 0
                         for t in g["text"]]
        return g[["part", "seq_id", "n_tokens", "text"]]

    return (frag_ds.map_batches(add_akey, batch_format="pyarrow")
            .groupby("__akey")
            .map_groups(arrow_out(assemble), batch_format="pandas"))


def export_packed_sequences(ds, out_dir: str, max_len: int = 2048,
                            parts: int = DEFAULT_PARTS, mode: str = "overwrite",
                            **kwargs):
    """Write :func:`packed_sequences` hive-partitioned by part:
    ``out_dir/part=K/...``; a trainer reads a part and sorts by seq_id."""
    from dataprof_ray.pipelines.export import export_partitioned

    return export_partitioned(
        packed_sequences(ds, max_len=max_len, parts=parts, **kwargs),
        out_dir, by="part", mode=mode)


def chunk_documents(ds, max_tokens: int = 512, overlap: int = 64,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Split long documents into overlapping token windows (the LLM
    training-prep complement of sequence packing: packing concatenates
    SHORT docs up to the context length, chunking cuts LONG docs down to
    it). Chunk ``k`` covers tokens ``[k*stride, k*stride + max_tokens)``
    with ``stride = max_tokens - overlap``; a doc of ``n <= max_tokens``
    tokens emits exactly one chunk, longer docs emit
    ``ceil((n - max_tokens) / stride) + 1`` so every token is covered and
    each chunk after the first repeats ``overlap`` tokens of context.
    Zero-token documents emit nothing. Tokens are the ``str.split()``
    whitespace contract (chunk text re-joins with single spaces — same
    normalization as the span scrubber).

    Stateless streaming ``map_batches`` — no shuffle, output rides input
    blocks; emits (id, chunk_id, text, n_tokens)."""
    if overlap >= max_tokens:
        raise ValueError(f"overlap {overlap} must be < max_tokens {max_tokens}")
    stride = max_tokens - overlap

    def chunks(batch: pa.Table) -> pa.Table:
        id_type = batch.schema.field(id_col).type
        ids_out, ks, texts_out, n_toks = [], [], [], []
        ids = batch.column(id_col).to_pylist()
        for i, t in zip(ids, batch.column(text_col).to_pylist()):
            toks = (t or "").split()
            n = len(toks)
            if n == 0:
                continue
            n_chunks = 1 if n <= max_tokens else \
                -(-(n - max_tokens) // stride) + 1
            for k in range(n_chunks):
                s = k * stride
                e = min(s + max_tokens, n)
                ids_out.append(i)
                ks.append(k)
                texts_out.append(" ".join(toks[s:e]))
                n_toks.append(e - s)
        return pa.table({
            # explicit type: an all-empty block would otherwise emit a
            # null-typed id column and destabilize the block schema
            id_col: pa.array(ids_out, type=id_type),
            "chunk_id": pa.array(ks, pa.int64()),
            "text": pa.array(texts_out, pa.string()),
            "n_tokens": pa.array(n_toks, pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        chunks, batch_format="pyarrow")
