"""Score-driven corpus selection for training-data curation.

Two selector families sit between "quality signals computed" and "corpus
exported" in a web-scale pipeline:

- ``select_by_budget``: keep the highest-scoring documents whose summed
  weight (token count) fits a global budget — the "best N tokens" step
  that sizes a training mix. Semantically identical to the SQL window
  ``SUM(w) OVER (ORDER BY score DESC, id ROWS UNBOUNDED PRECEDING) <=
  budget``, but computed WITHOUT a global sort: a tiny score histogram
  locates the threshold bin and only that single bin's rows are resolved
  exactly on the driver.
- DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling", arXiv:2302.03169 — public):
  hashed-token bag-of-words log-likelihood ratio between a small TARGET
  corpus and the RAW corpus, then deterministic Gumbel-top-k resampling.

The per-key domain cap lives in ``pipelines.sampling.cap_per_key`` (a cap
is a sampling policy); this module owns the score-driven selectors.

Reference parity note: the reference engine has no selection layer — these
are the LLM-pipeline extensions SURVEY.md §2 calls for, with semantics
pinned by SQL oracles / single-process goldens instead of reference files.
"""

from __future__ import annotations

import hashlib
import math
import re
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

# The repo's ORACLE TOKENIZER (textstats idiom, proven hash-equal to
# DuckDB's REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text))) on this corpus):
# lower -> strip -> \s+ split; empty text yields no tokens.
_WS_SPLIT = re.compile(r"\s+")


def _tokens(text: Optional[str]) -> list:
    t = (text or "").lower().strip()
    return _WS_SPLIT.split(t) if t else []


# ----------------------------------------------------------- budget select


def _score_bins(scores: np.ndarray, lo: float, hi: float,
                bins: int) -> np.ndarray:
    """Monotone score -> bin map (equal scores share a bin, higher scores
    never get a lower bin), identical arithmetic in every pass."""
    if hi <= lo:
        return np.zeros(len(scores), dtype=np.int64)
    b = np.floor((scores - lo) / (hi - lo) * bins).astype(np.int64)
    return np.clip(b, 0, bins - 1)


def select_by_budget(ds, budget: Optional[float] = None,
                     budget_fraction: Optional[float] = None,
                     score_col: str = "score", weight_col: str = "n_tokens",
                     id_col: str = "doc_id", bins: int = 4096):
    """Greedy prefix selection under a weight budget: order documents by
    (score DESC, id ASC) and keep the prefix whose cumulative weight stays
    <= budget (exactly SQL's ``SUM(w) OVER (ORDER BY score DESC, id ROWS
    UNBOUNDED PRECEDING) <= budget``). ``budget_fraction=f`` resolves the
    budget as ``f * total_weight`` in one shared pass.

    Scale design — no global sort, four streaming passes over the lazy
    input (re-executed upstream; materialize a cheap scoring stage first
    if it is expensive):
      1. score min/max aggregate                      (2 scalars)
      2. per-batch (bin, weight-sum) histogram partials (<= ``bins`` rows
         per batch; driver folds one int64[bins] vector)
      3. rows of the ONE boundary bin, resolved exactly by
         (score DESC, id) on the driver                (bin-width bounded —
         at 4096 bins a boundary bin is ~0.02% of the corpus)
      4. streaming keep filter: bin above threshold OR in the broadcast
         boundary keep-set.
    Weights must be non-negative (integer token counts); negative weights
    break the prefix monotonicity and raise. Returns the filtered Dataset
    (same columns as the input)."""
    import ray
    from ray.data.aggregate import Max, Min

    from dataprof_ray.pipelines.textstats import _broadcast_cached

    if (budget is None) == (budget_fraction is None):
        raise ValueError("pass exactly one of budget / budget_fraction")

    stats = ds.aggregate(Min(score_col), Max(score_col))
    lo, hi = stats[f"min({score_col})"], stats[f"max({score_col})"]
    if lo is None:  # empty input
        return ds

    def hist(batch: pa.Table) -> pa.Table:
        s = batch.column(score_col).to_numpy(zero_copy_only=False).astype(np.float64)
        w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(w) and w.min() < 0:
            raise ValueError(f"negative weight in {weight_col}")
        b = _score_bins(s, lo, hi, bins)
        sums = np.bincount(b, weights=w, minlength=bins).astype(np.int64)
        nz = np.nonzero(sums)[0]
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "wsum": pa.array(sums[nz], pa.int64())})

    totals = np.zeros(bins, dtype=np.int64)
    for b in (ds.map_batches(hist, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        np.add.at(totals, b.column("bin").to_numpy(),
                  b.column("wsum").to_numpy())

    if budget is None:
        budget = budget_fraction * float(totals.sum())

    cum = np.cumsum(totals[::-1])  # cum[j] = weight of top j+1 bins
    exceed = np.nonzero(cum > budget)[0]
    if len(exceed) == 0:
        return ds  # everything fits
    j = int(exceed[0])
    bstar = bins - 1 - j
    w_above = float(cum[j - 1]) if j > 0 else 0.0

    def boundary(batch: pa.Table) -> pa.Table:
        s = batch.column(score_col).to_numpy(zero_copy_only=False).astype(np.float64)
        mask = _score_bins(s, lo, hi, bins) == bstar
        return batch.filter(pa.array(mask)).select(
            [id_col, score_col, weight_col])

    edge = (ds.map_batches(boundary, batch_format="pyarrow").to_pandas()
            .sort_values([score_col, id_col], ascending=[False, True]))
    # Compare in the oracle's exact form (global integer cum vs budget) —
    # token counts are exact in float64, so ``w_above + run + w`` rounds
    # identically to SQL's running SUM; a rearranged ``budget - w_above``
    # would round differently on razor-edge budgets.
    keep_ids = []
    run = 0.0
    for i, w in zip(edge[id_col], edge[weight_col]):
        if w_above + run + float(w) > budget:
            break  # prefix semantics: cumulative sum is monotone
        run += float(w)
        keep_ids.append(i)
    keep_ref = ray.put(frozenset(keep_ids))

    def final(batch: pa.Table) -> pa.Table:
        keep_set = _broadcast_cached(keep_ref)
        s = batch.column(score_col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = _score_bins(s, lo, hi, bins)
        ids = batch.column(id_col).to_pylist()
        mask = (b > bstar) | np.fromiter(
            (i in keep_set for i in ids), dtype=bool, count=len(ids))
        return batch.filter(pa.array(mask))

    return ds.map_batches(final, batch_format="pyarrow")


# ------------------------------------------------------------------- DSIR


def hash_bucket(token: str, buckets: int) -> int:
    """md5-based feature hash, SQL-replicable as
    ``('0x' || SUBSTR(MD5(token), 1, 8))::BIGINT % buckets``."""
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:8], 16) % buckets


def hashed_token_counts(ds, text_col: str = "text",
                        buckets: int = 4096) -> np.ndarray:
    """Corpus-level hashed-token histogram: one streaming pass, each batch
    ships its nonzero (bucket, count) pairs, the driver folds ONE
    int64[buckets] vector — the only state DSIR needs per corpus. Token
    buckets are md5-based (``hash_bucket``) so an external SQL engine can
    replicate the counts exactly."""
    def partial(batch: pa.Table) -> pa.Table:
        counts = np.zeros(buckets, dtype=np.int64)
        cache: dict = {}
        for t in batch.column(text_col).to_pylist():
            for tok in _tokens(t):
                bkt = cache.get(tok)
                if bkt is None:
                    bkt = cache[tok] = hash_bucket(tok, buckets)
                counts[bkt] += 1
        nz = np.nonzero(counts)[0]
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "cnt": pa.array(counts[nz], pa.int64())})

    totals = np.zeros(buckets, dtype=np.int64)
    for b in (ds.map_batches(partial, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        np.add.at(totals, b.column("bucket").to_numpy(),
                  b.column("cnt").to_numpy())
    return totals


def dsir_log_ratios(target_counts: np.ndarray, raw_counts: np.ndarray,
                    alpha: float = 1.0) -> np.ndarray:
    """Per-bucket log importance ratio under Laplace-smoothed multinomials:
    ``log p_target(b) - log p_raw(b)`` (arXiv:2302.03169 §3, hashed n-gram
    generative model). A tiny float64[buckets] vector, broadcast-ready."""
    t = np.asarray(target_counts, dtype=np.float64)
    r = np.asarray(raw_counts, dtype=np.float64)
    if t.shape != r.shape:
        raise ValueError("target/raw bucket vectors must align")
    nb = len(t)
    return (np.log((t + alpha) / (t.sum() + alpha * nb))
            - np.log((r + alpha) / (r.sum() + alpha * nb)))


def dsir_weights(ds, log_ratios: np.ndarray, text_col: str = "text",
                 id_col: str = "doc_id"):
    """Per-document importance weight: the sum of its hashed tokens' log
    ratios (= ``log p_target(doc) - log p_raw(doc)`` under the bag model).
    The ratio vector rides the object store once (``ray.put`` + per-worker
    cache); documents never shuffle. Returns (id, n_tokens, dsir_weight)."""
    import ray

    ref = ray.put(np.asarray(log_ratios, dtype=np.float64))

    def stage(batch: pa.Table) -> pa.Table:
        from dataprof_ray.pipelines.textstats import _broadcast_cached

        lr = _broadcast_cached(ref)
        buckets = len(lr)
        cache: dict = {}
        n_tok, weights = [], []
        for t in batch.column(text_col).to_pylist():
            toks = _tokens(t)
            n_tok.append(len(toks))
            w = 0.0
            if toks:
                idx = np.empty(len(toks), dtype=np.int64)
                for k, tok in enumerate(toks):
                    bkt = cache.get(tok)
                    if bkt is None:
                        bkt = cache[tok] = hash_bucket(tok, buckets)
                    idx[k] = bkt
                w = float(np.dot(np.bincount(idx, minlength=buckets), lr))
            weights.append(w)
        return pa.table({
            id_col: batch.column(id_col),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "dsir_weight": pa.array(weights, pa.float64()),
        })

    return ds.map_batches(stage, batch_format="pyarrow")


def gumbel_from_id(doc_id, seed: int = 17) -> float:
    """Deterministic standard-Gumbel draw from md5(seed:id): uniform from
    the first 12 hex chars (+0.5 ulp to dodge log(0)), then -log(-log(u)).
    A pure function of the id — stable under repartitioning and re-runs,
    the same reproducibility contract as hash_split."""
    h = hashlib.md5(f"{seed}:{doc_id}".encode("utf-8")).hexdigest()[:12]
    u = (int(h, 16) + 0.5) / 16 ** 12
    return -math.log(-math.log(u))


def dsir_select(weighted, k: int, temperature: float = 1.0,
                id_col: str = "doc_id", weight_col: str = "dsir_weight",
                seed: int = 17):
    """Gumbel-top-k resampling over DSIR weights (the paper's sampler,
    derandomized): key = w/T + Gumbel(md5(seed:id)); take the global top-k.
    The sort runs over the tiny (id, n_tokens, weight, key) projection —
    the corpus itself never moves. Returns a Dataset of k rows."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def add_key(batch: pa.Table) -> pa.Table:
        w = batch.column(weight_col).to_numpy(zero_copy_only=False)
        g = np.fromiter((gumbel_from_id(i, seed)
                         for i in batch.column(id_col).to_pylist()),
                        dtype=np.float64, count=batch.num_rows)
        return batch.append_column(
            "gumbel_key", pa.array(w / temperature + g, pa.float64()))

    return (weighted.map_batches(add_key, batch_format="pyarrow")
            .sort("gumbel_key", descending=True).limit(k))
