"""BloomFilter invariants + Bloom-backed decontamination parity.

The load-bearing property is NO FALSE NEGATIVES: a Bloom-backed
decontamination scan may over-flag (bounded by fp_rate) but can never
miss a contaminated document, so it is always safe to use as the
broadcast-set replacement at eval-suite scale.
"""

import pickle

import numpy as np
import pyarrow as pa
import pytest
import ray

from dataprof_ray.state.bloom import BloomFilter


def _rand_strings(n, seed, prefix=""):
    rng = np.random.default_rng(seed)
    return [prefix + rng.bytes(12).hex() for _ in range(n)]


def test_no_false_negatives():
    items = _rand_strings(5000, 1)
    bf = BloomFilter(capacity=5000, fp_rate=1e-3)
    bf.add_many(items)
    assert all(it in bf for it in items)
    assert bf.n_added == 5000


def test_false_positive_rate_bounded():
    members = _rand_strings(5000, 2, "m-")
    bf = BloomFilter(capacity=5000, fp_rate=1e-2)
    bf.add_many(members)
    probes = _rand_strings(20000, 3, "x-")
    fp = sum(p in bf for p in probes) / len(probes)
    # 1e-2 target; allow 3x slack for hash variance on one draw.
    assert fp <= 0.03
    # the self-reported estimate should be the same order of magnitude
    assert bf.observed_fp_rate() <= 0.03


def test_merge_equals_union_build():
    a_items = _rand_strings(800, 4, "a-")
    b_items = _rand_strings(800, 5, "b-")
    a = BloomFilter(2000, 1e-3)
    a.add_many(a_items)
    b = BloomFilter(2000, 1e-3)
    b.add_many(b_items)
    u = BloomFilter(2000, 1e-3)
    u.add_many(a_items + b_items)
    merged = a.merge(b)
    assert np.array_equal(merged.bits, u.bits)
    assert merged.n_added == 1600


def test_merge_shape_mismatch_raises():
    with pytest.raises(ValueError, match="different shapes"):
        BloomFilter(100, 1e-3).merge(BloomFilter(100000, 1e-3))


def test_pickle_roundtrip_preserves_membership():
    items = _rand_strings(300, 6)
    bf = BloomFilter(300, 1e-4)
    bf.add_many(items)
    bf2 = pickle.loads(pickle.dumps(bf))
    assert all(it in bf2 for it in items)
    assert (bf2.m, bf2.k, bf2.n_added) == (bf.m, bf.k, bf.n_added)
    bf2.add("new-item")  # __setstate__ must yield a writable buffer
    assert "new-item" in bf2


def test_invalid_params_raise():
    with pytest.raises(ValueError):
        BloomFilter(0)
    with pytest.raises(ValueError):
        BloomFilter(10, fp_rate=1.5)


def _ds(tbl, blocks=2):
    return ray.data.from_arrow(tbl).repartition(blocks)


def _corpus():
    bench_texts = [
        f"eval question {i} alpha beta gamma delta epsilon zeta eta theta"
        for i in range(6)
    ]
    clean = [
        f"ordinary web page {i} about cooking pasta with tomatoes and basil "
        f"plus unrelated filler text number {i}" for i in range(10)
    ]
    contaminated = [c + " " + b for c, b in zip(clean[:3], bench_texts[:3])]
    corpus_texts = contaminated + clean[3:]
    bench = pa.table({"doc_id": pa.array(range(len(bench_texts)), pa.int64()),
                      "text": pa.array(bench_texts)})
    corpus = pa.table({"doc_id": pa.array(range(len(corpus_texts)), pa.int64()),
                       "text": pa.array(corpus_texts)})
    return bench, corpus


def test_bloom_decontam_matches_exact(ray_session):
    from dataprof_ray.pipelines.decontam import (benchmark_ngram_bloom,
                                                 benchmark_ngram_set,
                                                 contamination_check)

    bench, corpus = _corpus()
    exact = contamination_check(
        _ds(corpus), benchmark_ngram_set(_ds(bench), n=8), n=8,
        as_dataset=False)
    bloom = benchmark_ngram_bloom(_ds(bench, 3), n=8, fp_rate=1e-6)
    got = contamination_check(_ds(corpus), bloom, n=8,
                              as_dataset=False)
    # no false negatives ever; at fp=1e-6 on this tiny corpus, no false
    # positives either -> exact equality.
    assert (got["n_contaminated"] >= exact["n_contaminated"]).all()
    assert got.equals(exact)
    # the three planted docs are flagged
    assert (got.loc[got["doc_id"] < 3, "n_contaminated"] > 0).all()
    assert (got.loc[got["doc_id"] >= 3, "n_contaminated"] == 0).all()


def test_bloom_build_capacity_autocount(ray_session):
    from dataprof_ray.pipelines.decontam import benchmark_ngram_bloom

    bench, _ = _corpus()
    bf = benchmark_ngram_bloom(_ds(bench, 3), n=3, fp_rate=1e-4)
    # auto capacity = total 3-gram positions (>= distinct), filter populated
    assert bf.n_added > 0
    assert bf.capacity >= bf.n_added
    assert 0 < bf.fill_ratio() < 0.6


def test_bloom_build_empty_benchmark(ray_session):
    from dataprof_ray.pipelines.decontam import benchmark_ngram_bloom

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    bf = benchmark_ngram_bloom(_ds(empty, 1), n=8)
    assert bf.n_added == 0
    assert "anything" not in bf
