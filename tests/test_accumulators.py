"""Accumulator contracts: merge-equivalence, determinism, exact->approx spill.
Mirrors the reference's property checks (cardinality.rs:263-313,
streaming_stats.rs:727-927, cross_engine_consistency.rs:31-94)."""

import math
import pickle

import numpy as np
import pyarrow as pa
import pytest

from dataprof_ray.state import accumulators as A


def test_welford_matches_numpy():
    rng = np.random.default_rng(42)
    v = rng.normal(10, 3, size=5000)
    w = A.WelfordAccumulator()
    w.update_batch(v)
    assert w.mean == pytest.approx(v.mean(), rel=1e-12)
    assert w.sample_variance() == pytest.approx(v.var(ddof=1), rel=1e-9)


def test_welford_merge_equals_single_pass():
    rng = np.random.default_rng(7)
    v = rng.normal(0, 1, size=10_000)
    whole = A.WelfordAccumulator()
    whole.update_batch(v)
    parts = A.WelfordAccumulator()
    for chunk in np.array_split(v, 13):
        p = A.WelfordAccumulator()
        p.update_batch(chunk)
        parts.merge(p)
    assert parts.count == whole.count
    assert parts.mean == pytest.approx(whole.mean, rel=1e-12)
    assert parts.sample_variance() == pytest.approx(whole.sample_variance(), rel=1e-9)


def test_hll_error_bounds():
    for n in (100_000, 500_000):
        h = A.HyperLogLog()
        h.add_hashes(A.hash64([f"value_{i}" for i in range(n)]))
        est = h.count()
        assert abs(est - n) / n < 0.05  # cardinality.rs:263-280 bound


def test_hll_merge_equals_union():
    a, b, u = A.HyperLogLog(), A.HyperLogLog(), A.HyperLogLog()
    ha = A.hash64([f"a{i}" for i in range(20_000)])
    hb = A.hash64([f"b{i}" for i in range(20_000)])
    a.add_hashes(ha)
    b.add_hashes(hb)
    u.add_hashes(np.concatenate([ha, hb]))
    a.merge(b)
    assert a.count() == u.count()


def test_hll_determinism():
    h1, h2 = A.HyperLogLog(), A.HyperLogLog()
    vals = [f"v{i}" for i in range(50_000)]
    h1.add_hashes(A.hash64(vals))
    h2.add_hashes(A.hash64(list(vals)))
    assert h1.count() == h2.count()
    assert np.array_equal(h1.registers, h2.registers)


def test_cardinality_exact_then_spill():
    c = A.CardinalityEstimator()
    c.add_hashes(A.hash64([f"x{i}" for i in range(9_999)]))
    assert not c.is_approximate()
    assert c.unique_count() == 9_999
    c.add_hashes(A.hash64([f"y{i}" for i in range(1_000)]))
    assert c.is_approximate()  # crossed 10k
    n = c.unique_count()
    assert abs(n - 10_999) / 10_999 < 0.05


def test_cardinality_merge_spill_propagates():
    a, b = A.CardinalityEstimator(), A.CardinalityEstimator()
    a.add_hashes(A.hash64(["a", "b", "c"]))
    b.add_hashes(A.hash64([f"z{i}" for i in range(11_000)]))
    assert b.is_approximate()
    a.merge(b)
    assert a.is_approximate()


def test_reservoir_cap_and_count():
    r = A.ReservoirSampler(capacity=100)
    r.offer_batch(list(range(1000)))
    assert len(r.samples()) == 100
    assert r.count == 1000
    assert all(0 <= x < 1000 for x in r.samples())


def test_reservoir_determinism():
    r1 = A.ReservoirSampler(capacity=50)
    r2 = A.ReservoirSampler(capacity=50)
    r1.offer_batch(list(range(5000)))
    r2.offer_batch(list(range(5000)))
    assert r1.samples() == r2.samples()


def test_reservoir_uniformity():
    # mean of a uniform sample of 0..9999 should be near 5000
    r = A.ReservoirSampler(capacity=1000)
    r.offer_batch(list(range(10_000)))
    assert abs(np.mean(r.samples()) - 5000) < 300


def test_reservoir_merge():
    a = A.ReservoirSampler(capacity=100)
    b = A.ReservoirSampler(capacity=100)
    a.offer_batch(list(range(0, 500)))
    b.offer_batch(list(range(500, 1000)))
    a.merge(b)
    assert len(a.samples()) == 100
    assert a.count == 1000


def test_text_lengths():
    t = A.TextLengthStats()
    t.update_lengths(np.array([1, 2, 3, 10]))
    assert t.min_length == 1 and t.max_length == 10
    assert t.avg_length == pytest.approx(4.0)
    t2 = A.TextLengthStats()
    t2.update_lengths(np.array([100]))
    t.merge(t2)
    assert t.max_length == 100 and t.welford.count == 5


def test_streaming_statistics_string_semantics():
    s = A.StreamingStatistics()
    s.update_string_array(pa.array(["1", "2", "", "null", "2.5", "abc", "2024-01-15"]))
    assert s.count == 7
    assert s.null_count == 2
    assert s.welford.count == 3  # 1, 2, 2.5
    assert s.min == 1.0 and s.max == 2.5
    assert s.date_match_count == 1
    assert s.unique_count() == 5  # 1,2,2.5,abc,2024-01-15
    assert not s.unique_count_is_approximate()


def test_streaming_statistics_exact_over_sample():
    """cross_engine_consistency.rs:31-94: exact min/max/mean/std over a sorted
    stream 3x the reservoir size."""
    s = A.StreamingStatistics(sample_capacity=1000)
    vals = np.arange(30_000, dtype=np.float64)
    for chunk in np.array_split(vals, 7):
        s.update_numeric_array(pa.array(chunk))
    assert s.min == 0.0 and s.max == 29_999.0
    assert s.mean() == pytest.approx(vals.mean(), rel=1e-12)
    assert s.welford.sample_std_dev() == pytest.approx(vals.std(ddof=1), rel=1e-9)
    assert len(s.sample_values()) == 1000
    assert s.unique_count_is_approximate()
    assert s.invalid_count == 0


def test_streaming_statistics_merge_matches_single():
    rng = np.random.default_rng(3)
    vals = rng.normal(50, 10, 20_000)
    whole = A.StreamingStatistics()
    whole.update_numeric_array(pa.array(vals))
    merged = A.StreamingStatistics()
    for i, chunk in enumerate(np.array_split(vals, 8)):
        p = A.StreamingStatistics(seed=A.RESERVOIR_SEED + i)
        p.update_numeric_array(pa.array(chunk))
        merged.merge(p)
    assert merged.count == whole.count
    assert merged.mean() == pytest.approx(whole.mean(), rel=1e-12)
    assert merged.min == whole.min and merged.max == whole.max
    assert merged.unique_count() == whole.unique_count()


def test_nan_null_inf_invalid():
    s = A.StreamingStatistics()
    s.update_numeric_array(pa.array([1.0, float("nan"), float("inf"), 2.0, None]))
    assert s.count == 5
    assert s.null_count == 2  # arrow null + NaN
    assert s.invalid_count == 1  # inf
    assert s.welford.count == 2


def test_row_uniqueness():
    t = pa.table({"a": ["x", "x", "y"], "b": [1, 1, 2]})
    tr = A.RowUniquenessTracker()
    tr.add_signature_hashes(A.row_signature_hashes(t))
    assert tr.rows_seen == 3
    assert tr.duplicate_rows() == 1
    assert not tr.is_approximate()


def test_row_signature_null_vs_empty():
    # null renders as "" — ("a", null) must equal ("a", "") per formatter parity
    t1 = pa.table({"a": ["a"], "b": pa.array([None], pa.string())})
    t2 = pa.table({"a": ["a"], "b": [""]})
    assert A.row_signature_hashes(t1)[0] == A.row_signature_hashes(t2)[0]
    # but length-prefix keeps ("ab","") != ("a","b")
    t3 = pa.table({"a": ["ab"], "b": [""]})
    t4 = pa.table({"a": ["a"], "b": ["b"]})
    assert A.row_signature_hashes(t3)[0] != A.row_signature_hashes(t4)[0]


def test_column_collection_roundtrip_pickle():
    t = pa.table({"x": [1.0, 2.0, None], "s": ["a", "b", "a"]})
    c = A.ColumnCollection()
    c.update_table(t)
    blob = pickle.dumps(c)
    c2 = pickle.loads(blob)
    assert c2.rows == 3
    assert c2.columns["x"].null_count == 1
    assert c2.columns["s"].unique_count() == 2
    c2.merge(pickle.loads(blob))
    assert c2.rows == 6


def test_column_collection_late_column_backfill():
    c = A.ColumnCollection(track_row_uniqueness=False)
    c.update_table(pa.table({"a": ["1", "2"]}))
    c.update_table(pa.table({"a": ["3"], "b": ["x"]}))
    assert c.columns["b"].count == 3
    assert c.columns["b"].null_count == 2


def test_merge_collections_deterministic_order():
    t = pa.table({"x": [float(i) for i in range(100)]})
    parts = []
    for i in range(4):
        c = A.ColumnCollection()
        c.update_table(t.slice(i * 25, 25))
        parts.append((i, c))
    m1 = A.merge_collections(list(reversed(parts)))
    assert m1.rows == 100
    assert m1.columns["x"].mean() == pytest.approx(49.5)


# ----------------------------------------------------- QuantileSketch


def test_quantile_sketch_exact_when_small():
    from dataprof_ray.state.quantile_sketch import QuantileSketch

    sk = QuantileSketch(k=64).update_array(np.arange(50, dtype=float))
    assert sk.quantile(0.0) == 0.0
    assert sk.quantile(1.0) == 49.0
    assert abs(sk.quantile(0.5) - 24.5) <= 0.5
    assert sk.total_weight == 50


def test_quantile_sketch_rank_error_bound_multibatch():
    from dataprof_ray.state.quantile_sketch import QuantileSketch

    rng = np.random.default_rng(5)
    data = rng.lognormal(mean=3.0, sigma=1.5, size=120_000)
    merged = QuantileSketch(k=512)
    for chunk in np.array_split(data, 37):  # uneven merge tree
        merged.merge(QuantileSketch(k=512).update_array(chunk))
    s = np.sort(data)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = merged.quantile(q)
        rank = np.searchsorted(s, est) / (len(s) - 1)
        assert abs(rank - q) < 0.01, (q, rank)
    assert merged.total_weight == len(data)
    assert len(merged.values) <= 512


def test_quantile_sketch_nan_and_empty():
    from dataprof_ray.state.quantile_sketch import QuantileSketch

    sk = QuantileSketch(k=16).update_array(
        np.array([1.0, np.nan, 3.0, np.nan]))
    assert sk.total_weight == 2
    assert np.isnan(QuantileSketch(k=16).quantile(0.5))
    import pytest
    with pytest.raises(ValueError, match="quantile"):
        sk.quantile(1.5)
    with pytest.raises(ValueError, match="k must be"):
        QuantileSketch(k=2)


def test_quantile_sketch_merge_order_bounded_drift():
    """Merging in different orders stays within the documented bound."""
    from dataprof_ray.state.quantile_sketch import QuantileSketch

    rng = np.random.default_rng(9)
    data = rng.normal(size=40_000)
    chunks = np.array_split(data, 16)
    a, b = QuantileSketch(512), QuantileSketch(512)
    for c in chunks:
        a.merge(QuantileSketch(512).update_array(c))
    for c in reversed(chunks):
        b.merge(QuantileSketch(512).update_array(c))
    s = np.sort(data)
    for q in (0.1, 0.5, 0.9):
        ra = np.searchsorted(s, a.quantile(q)) / len(s)
        rb = np.searchsorted(s, b.quantile(q)) / len(s)
        assert abs(ra - rb) < 0.02
