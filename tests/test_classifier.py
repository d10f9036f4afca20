"""Trainable hashed-BoW classifier: featurization determinism, AUC
kernel correctness, distributed training on a planted separable task."""

import numpy as np
import pyarrow as pa
import ray

from dataprof_ray.pipelines.classifier import (TextClassifier, auc_score,
                                               hash_features,
                                               score_with_classifier,
                                               train_text_classifier)


def test_hash_features_deterministic_and_bigrams():
    idx1, doc1, nnz1 = hash_features(["a b c", "a b"], dim=1 << 16)
    idx2, doc2, nnz2 = hash_features(["a b c", "a b"], dim=1 << 16)
    assert np.array_equal(np.sort(idx1), np.sort(idx2))
    assert np.array_equal(nnz1, nnz2)
    # doc 0: {a,b,c,"a b","b c"} = 5 features; doc 1: {a,b,"a b"} = 3
    assert list(nnz1) == [5, 3]
    # unigrams only
    _, _, nnz_u = hash_features(["a b c", "a b"], dim=1 << 16, ngrams=1)
    assert list(nnz_u) == [3, 2]


def test_hash_features_empty_and_null():
    idx, doc, nnz = hash_features(["", None, "x"], dim=256)
    assert list(nnz) == [0, 0, 1]
    assert len(idx) == 1


def test_auc_score_textbook_case():
    # classic example: one inversion among 2x2 -> AUC = 3/4
    assert auc_score([0, 0, 1, 1], [0.1, 0.4, 0.35, 0.8]) == 0.75
    assert auc_score([0, 1], [0.5, 0.5]) == 0.5  # tie -> chance
    assert auc_score([1, 1, 0], [0.9, 0.8, 0.1]) == 1.0
    assert np.isnan(auc_score([1, 1], [0.1, 0.2]))  # one class only


def test_score_is_length_invariant():
    clf = TextClassifier(np.ones(64, dtype=np.float32), 0.0, 64, ngrams=1)
    p = clf.predict_batch(["alpha beta", "alpha beta alpha beta alpha beta"])
    assert abs(p[0] - p[1]) < 1e-12  # mean scaling: repetition is a no-op


def _planted(n=2000, seed=0):
    bases = ["the quick brown fox jumps over a lazy dog near the river",
             "scientists discover new species in remote forest regions",
             "the committee approved the annual budget after discussion"]
    texts, labels = [], []
    for i in range(n):
        r = np.random.default_rng(seed + i)
        if i % 2 == 0:
            w = bases[i % 3].split()
            r.shuffle(w)
            texts.append(" ".join(w))
            labels.append(1)
        else:
            texts.append(" ".join("zq" + r.bytes(3).hex() for _ in range(10)))
            labels.append(0)
    return pa.table({"text": pa.array(texts),
                     "label": pa.array(labels, pa.int64())})


def test_train_separates_planted_task(ray_session):
    t = _planted()
    train, test = t.slice(0, 1600), t.slice(1600)
    clf = train_text_classifier(
        ray.data.from_arrow(train).repartition(4), rounds=2, local_steps=30)
    scored = score_with_classifier(ray.data.from_arrow(test), clf).to_pandas()
    auc = auc_score(scored["label"].to_numpy(), scored["clf_score"].to_numpy())
    acc = ((scored["clf_score"] > 0.5).astype(int) == scored["label"]).mean()
    assert auc >= 0.99
    assert acc >= 0.95
    # model is bounded: dim float32 weights regardless of corpus size
    assert clf.w.nbytes == (1 << 16) * 4


def test_training_insensitive_to_partitioning(ray_session):
    """Parameter averaging is weighted by shard size, so 2 vs 8 blocks
    must land on models that agree on every held-out prediction (not
    bit-identical weights — float folds differ — but same decisions)."""
    t = _planted(1200)
    train, test = t.slice(0, 1000), t.slice(1000)
    texts = test.column("text").to_pylist()
    a = train_text_classifier(ray.data.from_arrow(train).repartition(2),
                              rounds=2, local_steps=30)
    b = train_text_classifier(ray.data.from_arrow(train).repartition(8),
                              rounds=2, local_steps=30)
    pa_, pb = a.predict_batch(texts), b.predict_batch(texts)
    assert ((pa_ > 0.5) == (pb > 0.5)).all()
