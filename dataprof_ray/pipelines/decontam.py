"""Benchmark decontamination: flag training documents that overlap an
evaluation/benchmark set by shared word n-grams (the standard LLM-corpus
hygiene pass — GPT-3 App. C / PaLM-style 8-gram overlap).

Scale design: the benchmark side is SMALL by definition (eval sets are
KB-MB), so its n-gram set is collected once on the driver and broadcast
with ``ray.put`` — every scan task reads the same object-store copy; the
corpus side streams through one stateless ``map_batches`` with no shuffle.
The reference has no decontamination operator (SURVEY.md §2 extension);
semantics are pinned by the DuckDB oracle in __ray_entry__ (same tokenizer
contract as pipelines.textstats: lowercase, ``\\s+`` split).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from dataprof_ray.pipelines.textstats import _WS_SPLIT


def _doc_ngrams(text: str, n: int) -> list:
    toks = _WS_SPLIT.split((text or "").lower().strip())
    if toks == [""]:
        return []
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def _gram_hashes(grams: list) -> "np.ndarray":
    """Stable 64-bit hashes for a flat gram list (fixed-seed xxhash via
    polars — the same kernel as ``dedup.add_content_hash``). The Bloom
    build and the scan both go through this, so gram-to-u64 collisions
    (~2^-64) can only ADD false positives, never create a false miss."""
    import numpy as np
    import polars as pl

    if not grams:
        return np.empty(0, dtype=np.uint64)
    return pl.Series(grams).hash(seed=0).to_numpy().astype(np.uint64)


def benchmark_ngram_set(bench_ds, n: int = 8, text_col: str = "text") -> frozenset:
    """Distinct word n-grams of the benchmark dataset, collected to the
    driver (benchmark sets are small; the corpus never is — never call
    this on the training side)."""

    def grams(batch: pa.Table) -> pa.Table:
        out: set = set()
        for t in batch.column(text_col).to_pylist():
            out.update(_doc_ngrams(t, n))
        return pa.table({"g": pa.array(sorted(out), pa.string())})

    tbl = (bench_ds.select_columns([text_col])
           .map_batches(grams, batch_format="pyarrow")
           .to_pandas())
    return frozenset(tbl["g"])


def benchmark_ngram_bloom(bench_ds, n: int = 8, text_col: str = "text",
                          fp_rate: float = 1e-4,
                          capacity: int = None) -> "BloomFilter":
    """Bloom-filter form of :func:`benchmark_ngram_set` — the broadcast
    object for LARGE eval suites. A frozenset costs ~100 B/gram; the Bloom
    filter costs ~``-1.44 log2(fp_rate)`` bits/gram (~2.4 MB per 10^6 grams
    at 1e-4) and has no false negatives, so decontamination can only
    over-flag, never leak a contaminated document.

    Scale design: pass 1 counts total n-gram positions per batch (a cheap
    sum — an upper bound on distinct grams, so the realized fp rate is at
    most ``fp_rate``) unless ``capacity`` is given; pass 2 builds one local
    filter per batch with the identical (m, k) shape and OR-folds the
    partials on the driver. Partials are ``m/8`` bytes each — for filters
    so large that P partials strain the driver, pre-fold with the same
    tree-merge used by the profiler. Grams enter the filter as 64-bit
    xxhashes (``_gram_hashes``) so both the build and the scan are one
    vectorized numpy call per batch."""
    from dataprof_ray.state.bloom import BloomFilter

    grams_only = bench_ds.select_columns([text_col])

    if capacity is None:
        def count(batch: pa.Table) -> pa.Table:
            tot = 0
            for t in batch.column(text_col).to_pylist():
                toks = _WS_SPLIT.split((t or "").lower().strip())
                if toks != [""]:
                    tot += max(0, len(toks) - n + 1)
            return pa.table({"c": pa.array([tot], pa.int64())})

        capacity = int(grams_only.map_batches(count, batch_format="pyarrow")
                       .sum("c") or 0)
    capacity = max(1, capacity)

    from dataprof_ray.state.bloom import bloom_from_u64_batches

    def keys(batch: pa.Table):
        from dataprof_ray.functions.grams import wordgram_hashes_flat

        return wordgram_hashes_flat(batch.column(text_col), n)[0]

    return bloom_from_u64_batches(grams_only, keys, capacity, fp_rate)


def contamination_check(
    ds,
    benchmark,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    as_dataset: bool = True,
):
    """Per-document contamination report: total n-gram positions, how many
    hit the benchmark set, and the contaminated fraction (half-away rounded,
    4 places — oracle-aligned). Documents shorter than ``n`` tokens emit
    0 / 0 / 0.0. ``benchmark`` is anything supporting ``in`` — a frozenset
    from :func:`benchmark_ngram_set` (exact, small suites) or a
    :class:`~dataprof_ray.state.bloom.BloomFilter` from
    :func:`benchmark_ngram_bloom` (huge suites; no false negatives, so any
    divergence from exact is over-flagging). Shipped via ``ray.put`` once
    and deserialized once per WORKER process (textstats._broadcast_cached),
    not per batch — a GB-size Bloom would otherwise re-deserialize on
    every batch.

    Returns a lazy per-document Dataset by default (the 100x-scale
    contract: compose with write_parquet / further filters, never an
    accidental corpus collect). ``as_dataset=False`` collects a
    doc-id-sorted pandas frame — REPORT SCALE ONLY."""
    import ray

    from dataprof_ray.pipelines.aggregate import round_away

    from dataprof_ray.state.bloom import BloomFilter

    bench_ref = ray.put(benchmark)
    is_bloom = isinstance(benchmark, BloomFilter)

    def scan(batch: pa.Table) -> pa.Table:
        import numpy as np

        from dataprof_ray.pipelines.textstats import _broadcast_cached

        total, hit, frac = _contam_stats(
            _broadcast_cached(bench_ref), is_bloom,
            batch.column(text_col), n)
        return pa.table({
            id_col: batch.column(id_col),
            "n_grams": pa.array(total, pa.int64()),
            "n_contaminated": pa.array(hit, pa.int64()),
            "contam_frac": pa.array(round_away(frac, 4), pa.float64()),
        })

    out = ds.select_columns([id_col, text_col]).map_batches(
        scan, batch_format="pyarrow")
    if as_dataset:
        return out
    return out.to_pandas().sort_values(id_col).reset_index(drop=True)


def _contam_stats(bench, is_bloom: bool, texts, n: int):
    """Per-doc (total grams, contaminated grams, fraction) lists for one
    batch — shared by the report and the streaming filter."""
    import numpy as np

    if is_bloom:
        # fully vectorized path: one polars tokenize+hash pass and one
        # contains_u64 probe per batch, no per-document Python loop
        from dataprof_ray.functions.grams import (per_doc_hit_counts,
                                                  wordgram_hashes_flat)

        flat, total = wordgram_hashes_flat(texts, n)
        if len(flat):
            hit = per_doc_hit_counts(bench.contains_u64(flat), total)
        else:
            hit = np.zeros(len(total), dtype=np.int64)
        frac = np.where(total > 0, hit / np.maximum(total, 1), 0.0)
        return total.tolist(), hit.tolist(), frac.tolist()
    if not isinstance(texts, list):
        texts = texts.to_pylist()
    total, hit, frac = [], [], []
    for t in texts:
        grams = _doc_ngrams(t, n)
        c = sum(g in bench for g in grams)
        total.append(len(grams))
        hit.append(c)
        frac.append(c / len(grams) if grams else 0.0)
    return total, hit, frac


def decontaminate(ds, benchmark, n: int = 8, max_frac: float = 0.0,
                  text_col: str = "text"):
    """Streaming decontamination FILTER (the composable form of
    :func:`contamination_check`): drop every document whose contaminated
    n-gram fraction exceeds ``max_frac`` (0.0 = drop on any overlap). All
    columns ride through; no shuffle, one broadcast deserialized once per
    worker (textstats._broadcast_cached). With a Bloom-filter
    benchmark, over-dropping is bounded by the fp rate and under-dropping
    is impossible."""
    import ray

    from dataprof_ray.state.bloom import BloomFilter

    bench_ref = ray.put(benchmark)
    is_bloom = isinstance(benchmark, BloomFilter)

    def keep(batch: pa.Table) -> pa.Table:
        import numpy as np

        from dataprof_ray.pipelines.textstats import _broadcast_cached

        _, _, frac = _contam_stats(
            _broadcast_cached(bench_ref), is_bloom,
            batch.column(text_col), n)
        return batch.filter(pa.array(np.asarray(frac) <= max_frac))

    return ds.map_batches(keep, batch_format="pyarrow")
