"""Trainable fastText-style text classifier (hashed bag-of-words +
logistic regression) with distributed training.

This is the trainable member of the quality family: where
`functions/docquality.py` scores with FIXED heuristics and
`pipelines/selection.py` (DSIR) reweights with FIXED hashed-n-gram
importance ratios, this trains task-specific weights from labeled
examples (e.g. "wiki-like vs crawl" keep/drop labels, the CCNet/fastText
pattern; all public: Joulin et al. 2016 fastText, Wenzek et al. 2019
CCNet).

Scale design:
- features are the HASHING TRICK (Weinberger et al. 2009): unigrams +
  bigrams -> stable 64-bit hash (polars/xxhash, same kernel as
  `dedup.add_content_hash`) -> ``% dim`` bins. No vocabulary to build,
  ship, or synchronize; ``dim`` bounds model size (2^16 bins = 256 KB
  float32) independent of corpus size.
- featurization is ONE streaming pass; the featurized corpus (a
  ``list<int32>`` column, ~4 B/token) is materialized so training
  rounds never re-tokenize. Iterative training over a bounded working
  set is the one legitimate `materialize()` in this repo — Ray spills
  blocks to disk if it outgrows the object store.
- training is ITERATIVE PARAMETER MIXING (McDonald et al. 2010;
  Zinkevich et al. 2010 one-shot averaging as the rounds=1 case): each
  round broadcasts (w, b), every block runs ``local_steps`` of
  vectorized full-batch gradient descent on its shard, and the driver
  averages the per-block weights weighted by shard size. The exchange
  per round is one dim-sized float32 vector per block — independent of
  corpus size; tree-fold the partials if blocks x dim outgrows the
  driver.
- scoring is a stateless broadcast: `ray.put` the model once, sigmoid
  per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from dataprof_ray.pipelines.textstats import _WS_SPLIT


def _tokenize(text: str) -> list:
    toks = _WS_SPLIT.split((text or "").lower().strip())
    return [] if toks == [""] else toks


def hash_features(texts, dim: int, ngrams: int = 2):
    """Hashed bag-of-words (presence) features for a batch of texts.
    Returns (idx, doc_of, nnz): flat int32 bin indices, the doc each index
    belongs to, and per-doc distinct-feature counts. Deterministic across
    workers (fixed-seed xxhash via polars, never Python's salted hash)."""
    import polars as pl

    grams: list = []
    doc_of: list = []
    for d, t in enumerate(texts):
        toks = _tokenize(t)
        feats = set(toks)
        if ngrams >= 2:
            feats.update(a + " " + b for a, b in zip(toks, toks[1:]))
        grams.extend(feats)
        doc_of.extend([d] * len(feats))
    if not grams:
        return (np.empty(0, np.int32), np.empty(0, np.int32),
                np.zeros(len(list(texts)), np.int32))
    h = pl.Series(grams).hash(seed=0).to_numpy()
    idx = (h % np.uint64(dim)).astype(np.int32)
    doc_arr = np.asarray(doc_of, dtype=np.int32)
    nnz = np.bincount(doc_arr, minlength=len(list(texts))).astype(np.int32)
    return idx, doc_arr, nnz


class TextClassifier:
    """Picklable trained model: ``predict_batch(texts) -> P(label=1)``.
    Documents are scored as sigmoid(mean_{features} w[h(f)] + b) — the
    1/nnz scaling makes scores length-invariant (fastText's mean-of-
    embeddings in the linear case)."""

    def __init__(self, w: np.ndarray, b: float, dim: int, ngrams: int):
        self.w = w.astype(np.float32)
        self.b = float(b)
        self.dim = dim
        self.ngrams = ngrams

    def predict_batch(self, texts) -> np.ndarray:
        idx, doc_of, nnz = hash_features(texts, self.dim, self.ngrams)
        n = len(nnz)
        s = np.bincount(doc_of, weights=self.w[idx].astype(np.float64),
                        minlength=n)
        s = s / np.maximum(nnz, 1) + self.b
        return 1.0 / (1.0 + np.exp(-s))


def _local_gd(w, b, idx, doc_of, nnz, y, steps: int, lr: float, l2: float):
    """Vectorized full-batch gradient descent on one shard's CSR-ish
    features. O(steps x shard tokens), no Python per-doc loop."""
    n = len(y)
    scale = 1.0 / np.maximum(nnz, 1)
    wv = w.astype(np.float64).copy()
    bv = float(b)
    val = scale[doc_of]  # per-feature value: 1/nnz(doc)
    for _ in range(steps):
        s = np.bincount(doc_of, weights=wv[idx] * val, minlength=n) + bv
        p = 1.0 / (1.0 + np.exp(-s))
        g = (p - y) / n
        gw = np.bincount(idx, weights=g[doc_of] * val, minlength=len(wv))
        wv -= lr * (gw + l2 * wv)
        bv -= lr * g.sum()
    return wv, bv


def train_text_classifier(
    ds,
    label_col: str = "label",
    text_col: str = "text",
    dim: int = 2 ** 16,
    ngrams: int = 2,
    rounds: int = 3,
    local_steps: int = 40,
    lr: float = 4.0,
    l2: float = 1e-6,
) -> TextClassifier:
    """Train on a Dataset with a {0,1} ``label_col``. See module docstring
    for the distributed-training contract."""
    import ray

    def feat(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        idx, doc_of, nnz = hash_features(texts, dim, ngrams)
        offsets = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum(nnz, out=offsets[1:])
        feats = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(idx, pa.int32()))
        return pa.table({
            "feat": feats,
            "y": batch.column(label_col).cast(pa.float64()),
        })

    feats = (ds.select_columns([label_col, text_col])
             .map_batches(feat, batch_format="pyarrow")
             .materialize())

    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    for _ in range(rounds):
        model_ref = ray.put((w, b))

        def shard(batch: pa.Table) -> pa.Table:
            w0, b0 = ray.get(model_ref)
            col = batch.column("feat").combine_chunks()
            flat = col.flatten().to_numpy(zero_copy_only=False)
            offs = col.offsets.to_numpy(zero_copy_only=False)
            nnz = np.diff(offs).astype(np.int64)
            doc_of = np.repeat(np.arange(len(nnz), dtype=np.int32), nnz)
            y = batch.column("y").to_numpy(zero_copy_only=False)
            wl, bl = _local_gd(w0, b0, flat.astype(np.int64), doc_of, nnz,
                               y, local_steps, lr, l2)
            n = float(len(y))
            return pa.table({
                "w": pa.array([(wl * n).astype(np.float32).tobytes()],
                              pa.large_binary()),
                "b": pa.array([bl * n], pa.float64()),
                "n": pa.array([n], pa.float64()),
            })

        tot_w = np.zeros(dim, dtype=np.float64)
        tot_b = 0.0
        tot_n = 0.0
        for part in (feats.map_batches(shard, batch_format="pyarrow",
                                       batch_size=None)
                     .iter_batches(batch_format="pyarrow")):
            for wb, bb, nn in zip(part.column("w").to_pylist(),
                                  part.column("b").to_pylist(),
                                  part.column("n").to_pylist()):
                tot_w += np.frombuffer(wb, dtype=np.float32).astype(np.float64)
                tot_b += bb
                tot_n += nn
        if tot_n == 0:
            break
        w = tot_w / tot_n
        b = tot_b / tot_n
    return TextClassifier(w, b, dim, ngrams)


def score_with_classifier(ds, clf: TextClassifier, text_col: str = "text",
                          out_col: str = "clf_score", round_to: int = None):
    """Append ``P(label=1)`` per document: one `ray.put` of the model,
    stateless sigmoid scan, no shuffle."""
    import ray

    ref = ray.put(clf)

    def score(batch: pa.Table) -> pa.Table:
        model = ray.get(ref)
        p = model.predict_batch(batch.column(text_col).to_pylist())
        if round_to is not None:
            from dataprof_ray.pipelines.aggregate import round_away
            p = round_away(p, round_to)
        return batch.append_column(out_col, pa.array(p, pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow")


def auc_score(y_true: np.ndarray, scores: np.ndarray) -> float:
    """Mann-Whitney AUC (rank-sum, average ranks for ties)."""
    y = np.asarray(y_true, dtype=bool)
    s = np.asarray(scores, dtype=np.float64)
    n_pos = int(y.sum())
    n_neg = len(y) - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(len(s), dtype=np.float64)
    # average ranks over tied score groups
    sorted_s = s[order]
    _, start = np.unique(sorted_s, return_index=True)
    group_end = np.append(start[1:], len(s))
    avg = (start + 1 + group_end) / 2.0
    tied = np.repeat(avg, group_end - start)
    ranks[order] = tied
    return float((ranks[y].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))
