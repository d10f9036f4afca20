"""Count-min sketch: never-undercount invariant, error bound, merge
associativity, and the heavy-hitters pipeline vs the exact top-k."""

import numpy as np
import pickle

import pyarrow as pa
import pytest
import ray

from dataprof_ray.state.cms import CountMinSketch


def _keys(n, seed):
    return np.random.default_rng(seed).integers(0, 2 ** 63, n,
                                                dtype=np.uint64)


def test_cms_never_undercounts():
    rng = np.random.default_rng(0)
    items = _keys(2000, 1)
    counts = rng.integers(1, 50, 2000).astype(np.int64)
    cms = CountMinSketch(width=2 ** 12, depth=4)
    cms.add_u64(items, counts)
    est = cms.estimate_u64(items)
    assert (est >= counts).all()
    assert cms.total == counts.sum()
    # overcount stays within the analytic additive bound for most items
    over = est - counts
    assert np.quantile(over, 0.98) <= cms.error_bound()


def test_cms_merge_equals_single_build():
    a_items, b_items = _keys(500, 2), _keys(500, 3)
    a = CountMinSketch(2 ** 10, 3)
    a.add_u64(a_items)
    b = CountMinSketch(2 ** 10, 3)
    b.add_u64(b_items)
    u = CountMinSketch(2 ** 10, 3)
    u.add_u64(np.concatenate([a_items, b_items]))
    m = a.merge(b)
    assert np.array_equal(m.counts, u.counts)
    assert m.total == u.total


def test_cms_shape_guards_and_pickle():
    with pytest.raises(ValueError):
        CountMinSketch(0, 4)
    with pytest.raises(ValueError):
        CountMinSketch(16, 2).merge(CountMinSketch(32, 2))
    with pytest.raises(ValueError):
        CountMinSketch(16, 2).merge_bytes(b"\0" * 8, 0)
    cms = CountMinSketch(2 ** 8, 2)
    cms.add_u64(_keys(100, 4))
    cms2 = pickle.loads(pickle.dumps(cms))
    assert np.array_equal(cms.counts, cms2.counts)
    cms2.add_u64(_keys(5, 5))  # writable after unpickle


def test_heavy_hitters_cms_matches_exact_topk(ray_session):
    from dataprof_ray.pipelines.textstats import heavy_hitters_cms, top_terms

    rng = np.random.default_rng(7)
    # zipf-ish corpus: term_i appears ~ 3000/i times
    words = []
    for i in range(1, 200):
        words += [f"term{i:03d}"] * (3000 // i)
    rng.shuffle(words)
    texts = [" ".join(words[j:j + 50]) for j in range(0, len(words), 50)]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    ds = ray.data.from_arrow(t).repartition(6)
    exact = top_terms(ds, k=15)
    got = heavy_hitters_cms(ds, k=15, width=2 ** 14)
    true = dict(zip(exact["term"], exact["term_count"]))
    assert set(got["term"]) == set(exact["term"])  # zipf head: full recall
    for term, est in zip(got["term"], got["est_count"]):
        assert est >= true[term]
        assert est <= true[term] + got.attrs["error_bound"]


def test_heavy_hitters_cms_empty_corpus(ray_session):
    from dataprof_ray.pipelines.textstats import heavy_hitters_cms

    t = pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    out = heavy_hitters_cms(ray.data.from_arrow(t), k=5)
    assert len(out) == 0
