"""Distributed trigram-LM training vs single-process oracle."""

import numpy as np
import pyarrow as pa

from dataprof_ray.functions.docquality import TrigramLM
from dataprof_ray.pipelines import lm as LM

TEXTS = [
    "the cat sat on the mat.",
    "The CAT  sat\non\tthe mat!!",
    "zzz qqq xxy",
    "",
    None,
    "data processing at scale, with streams of records.",
]


def _oracle_counts(texts) -> np.ndarray:
    """Per-document trigram counting, single process."""
    base = TrigramLM.__new__(TrigramLM)
    base._init_charmap()
    v = base.v
    raw = np.zeros((v * v, v), dtype=np.int64)
    for t in texts:
        idx = base._indices(t or "")
        if len(idx) < 3:
            continue
        ctx = idx[:-2] * v + idx[1:-1]
        np.add.at(raw, (ctx, idx[2:]), 1)
    return raw


def _docs_table():
    return pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
    })


def test_train_matches_single_process_oracle(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs_table()).repartition(3)
    model = LM.train_trigram_lm(ds)
    want = TrigramLM.from_counts(_oracle_counts(TEXTS))
    np.testing.assert_array_equal(model.log_prob, want.log_prob)


def test_corpus_perplexity_scores(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs_table()).repartition(2)
    out = LM.corpus_perplexity(ds).to_pandas() \
        .sort_values("doc_id")
    want_lm = TrigramLM.from_counts(_oracle_counts(TEXTS))
    want = want_lm.perplexity_batch(TEXTS)
    np.testing.assert_allclose(out.corpus_ppl.to_numpy(), want, rtol=1e-12)
    # in-domain text must score lower than gibberish under the corpus model
    ppl = dict(zip(out.doc_id, out.corpus_ppl))
    assert ppl[0] < ppl[2]
    # empty/tiny docs get the max-entropy fallback
    assert ppl[3] == ppl[4] == float(want_lm.v)


def test_from_counts_validates_shape():
    import pytest

    with pytest.raises(ValueError):
        TrigramLM.from_counts(np.zeros((3, 3)))


def test_query_matches_single_process_training(ray_session):
    """Pin the no-oracle corpus_ppl_documents query to the single-process
    oracle over the real sf0.001 corpus."""
    import sys

    import pyarrow.parquet as pq

    sys.path.insert(0, ".")
    import __ray_entry__ as E

    out = E.queries()["corpus_ppl_documents"]("/root/testdata/sf0.001") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    lm = TrigramLM.from_counts(_oracle_counts(docs.text.tolist()))
    want = lm.perplexity_batch(docs.text.tolist())
    assert (out.doc_id.to_numpy() == docs.doc_id.to_numpy()).all()
    np.testing.assert_allclose(out.corpus_ppl.to_numpy(), want, rtol=1e-12)


def test_perplexity_buckets_splits_evenly(ray_session):
    import ray.data as rd

    from dataprof_ray.pipelines.lm import perplexity_buckets

    rng = np.random.default_rng(4)
    vocab = ["the", "cat", "sat", "on", "mat", "dog", "ran", "far"]
    texts = [" ".join(vocab[j] for j in rng.integers(0, len(vocab), 25))
             for _ in range(300)]
    t = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                  "text": pa.array(texts)})
    out = (perplexity_buckets(rd.from_arrow(t).repartition(4), buckets=3)
           .to_pandas())
    assert {"doc_id", "corpus_ppl", "bucket"} <= set(out.columns)
    sizes = out.groupby("bucket").size()
    assert sorted(sizes.index) == [0, 1, 2]
    # approximately even split (sketch rank error tolerance)
    assert sizes.min() >= 0.2 * 300 and sizes.max() <= 0.5 * 300
    # monotone: every head doc is at most every tail doc's perplexity
    assert (out.loc[out.bucket == 0, "corpus_ppl"].max()
            <= out.loc[out.bucket == 2, "corpus_ppl"].min() + 1e-9)


def test_perplexity_buckets_validates(ray_session):
    import pytest
    import ray.data as rd

    from dataprof_ray.pipelines.lm import perplexity_buckets

    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["a b c"])})
    with pytest.raises(ValueError):
        perplexity_buckets(rd.from_arrow(t), buckets=1)
