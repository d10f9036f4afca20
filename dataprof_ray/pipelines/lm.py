"""Distributed character-trigram LM training + corpus-trained perplexity.

The flagship perplexity stage (quality_filter.PerplexityStage) scores
against the fixed miniature English model. This module trains the SAME
model family on the corpus itself — the KenLM-style workflow of the north
rule — entirely as Ray Data aggregations:

1. **Counting** is a per-batch dense `np.bincount` over trigram cell ids
   (one numpy pass, no Python char loops), emitted as SPARSE
   (cell, count) partials. The model state is tiny and FIXED —
   (29*29) contexts x 29 next-chars = 24,389 cells — so every exchange is
   bounded by the vocabulary, never the corpus: a batch contributes at most
   24,389 rows regardless of how many documents it holds.
2. **Reduction** is the repo-standard coarse-partitioned groupby
   (pipelines.partitioning): cells shuffle into 64 partitions, one
   vectorized pandas sum each, and the driver collects <= 24,389
   (cell, count) rows total — independent of corpus size.
3. **Scoring** broadcasts the trained log-prob matrix once via ``ray.put``;
   an actor-pool stage fetches it in ``__init__`` (once per actor) and
   scores batches vectorized.

Trigrams are counted PER DOCUMENT (no cross-document context): document
boundaries are real discontinuities in a corpus, exactly like the
sentence-boundary handling of real LM tokenizers.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from dataprof_ray.functions.docquality import TrigramLM
from dataprof_ray.pipelines.partitioning import arrow_out, DEFAULT_PARTITIONS

_V = len(TrigramLM.VOCAB)
_CELLS = _V * _V * _V


class _CountStage:
    """Actor-pool batch counter: LUT built once per actor in __init__."""

    def __init__(self, text_col: str) -> None:
        self.lm = TrigramLM.__new__(TrigramLM)
        self.lm._init_charmap()
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        dense = np.zeros(_CELLS, dtype=np.int64)
        v = self.lm.v
        for t in batch.column(self.text_col).to_pylist():
            idx = self.lm._indices(t or "")
            if len(idx) < 3:
                continue
            cells = (idx[:-2] * v + idx[1:-1]) * v + idx[2:]
            dense += np.bincount(cells, minlength=_CELLS)
        nz = np.nonzero(dense)[0]
        return pa.table({
            "cell": pa.array(nz.astype(np.int64), pa.int64()),
            "count": pa.array(dense[nz], pa.int64()),
        })


def train_trigram_lm(ds, text_col: str = "text",
                     partitions: int = DEFAULT_PARTITIONS,
                     concurrency=(1, 8)) -> TrigramLM:
    """Count trigrams over the corpus (per document) and return the
    add-one-smoothed ``TrigramLM`` built from the merged counts."""
    def add_part(batch: pa.Table) -> pa.Table:
        part = (batch.column("cell").to_numpy(zero_copy_only=False)
                % np.int64(partitions)).astype(np.int32)
        return batch.append_column("part", pa.array(part, pa.int32()))

    def reduce_cells(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("cell", as_index=False, sort=False)["count"].sum()

    merged = (
        ds.map_batches(_CountStage, batch_format="pyarrow",
                       fn_constructor_kwargs=dict(text_col=text_col),
                       concurrency=concurrency)
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(arrow_out(reduce_cells), batch_format="pandas")
        .to_pandas()
    )
    raw = np.zeros(_CELLS, dtype=np.int64)
    raw[merged["cell"].to_numpy()] = merged["count"].to_numpy()
    return TrigramLM.from_counts(raw.reshape(_V * _V, _V))


class _ScoreStage:
    """Actor-pool scorer against a broadcast corpus-trained log-prob
    matrix (fetched from the object store once per actor)."""

    def __init__(self, log_prob_ref, text_col: str, id_col: str) -> None:
        import ray

        self.lm = TrigramLM.__new__(TrigramLM)
        self.lm._init_charmap()
        self.lm.log_prob = ray.get(log_prob_ref)
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        ppl = self.lm.perplexity_batch(texts)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "corpus_ppl": pa.array(ppl, pa.float64()),
        })


def corpus_perplexity(ds, lm: Optional[TrigramLM] = None,
                      text_col: str = "text", id_col: str = "doc_id",
                      concurrency=(1, 8)):
    """Per-document perplexity under a CORPUS-trained trigram LM (trained
    here if not supplied). Self-scoring is the classic in-domain signal:
    boilerplate and templated spam score low (predictable), gibberish and
    off-language text score high."""
    import ray

    lm = lm or train_trigram_lm(ds, text_col=text_col,
                                concurrency=concurrency)
    ref = ray.put(lm.log_prob)
    return ds.map_batches(
        _ScoreStage, batch_format="pyarrow",
        fn_constructor_kwargs=dict(log_prob_ref=ref, text_col=text_col,
                                   id_col=id_col),
        concurrency=concurrency,
    )
