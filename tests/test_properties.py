"""Property-based checks (hypothesis) for kernels and accumulators —
robustness against arbitrary inputs, merge algebra, and oracle-rounding
equivalence."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dataprof_ray.functions import kernels as K
from dataprof_ray.pipelines import dedup as D
from dataprof_ray.pipelines.aggregate import round_away
from dataprof_ray.state import accumulators as A

finite_floats = st.floats(allow_nan=False, allow_infinity=False,
                          min_value=-1e12, max_value=1e12)


@settings(max_examples=50, deadline=None)
@given(st.lists(finite_floats, min_size=2, max_size=200))
def test_welford_matches_numpy_property(xs):
    w = A.WelfordAccumulator()
    w.update_batch(np.asarray(xs))
    assert w.mean == pytest.approx(np.mean(xs), rel=1e-9, abs=1e-6)
    assert w.sample_variance() == pytest.approx(np.var(xs, ddof=1), rel=1e-6, abs=1e-4)


@settings(max_examples=50, deadline=None)
@given(st.lists(finite_floats, min_size=1, max_size=100),
       st.lists(finite_floats, min_size=1, max_size=100))
def test_welford_merge_associative(xs, ys):
    a = A.WelfordAccumulator(); a.update_batch(np.asarray(xs))
    b = A.WelfordAccumulator(); b.update_batch(np.asarray(ys))
    a.merge(b)
    whole = A.WelfordAccumulator(); whole.update_batch(np.asarray(xs + ys))
    assert a.count == whole.count
    # tolerance scales with the data magnitude (cancellation at 1e12 leaves
    # ~1e12*eps absolute error in any summation order — expected float
    # behavior, identical for the reference's Rust f64 path)
    scale = max(1.0, max(abs(v) for v in xs + ys))
    assert a.mean == pytest.approx(whole.mean, abs=scale * 1e-9)
    assert a.sample_variance() == pytest.approx(whole.sample_variance(),
                                                rel=1e-6, abs=scale ** 2 * 1e-9)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 10_000), min_size=0, max_size=500),
       st.integers(1, 50))
def test_reservoir_invariants(values, cap):
    r = A.ReservoirSampler(cap, seed=1)
    r.offer_batch(values)
    assert len(r.samples()) == min(cap, len(values))
    assert all(v in values for v in r.samples())
    assert r.count == len(values)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 1000), max_size=200),
       st.lists(st.integers(2000, 3000), max_size=200))
def test_reservoir_merge_invariants(xs, ys):
    a = A.ReservoirSampler(20, seed=2); a.offer_batch(xs)
    b = A.ReservoirSampler(20, seed=3); b.offer_batch(ys)
    a.merge(b)
    assert a.count == len(xs) + len(ys)
    assert len(a.samples()) == min(20, len(xs) + len(ys))
    pool = set(xs) | set(ys)
    assert all(v in pool for v in a.samples())


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=40))
def test_type_predicates_total(s):
    # never crash, always a known type
    assert K.is_null_like_token(s) in (True, False)
    b = K.parse_strict_boolean_token(s)
    assert b in (True, False, None)
    t = K.infer_type([s])
    assert t in (K.TYPE_STRING, K.TYPE_INTEGER, K.TYPE_FLOAT,
                 K.TYPE_BOOLEAN, K.TYPE_DATE)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=40))
def test_date_chain_total(s):
    y = K.parse_raw_datetime_year(s)
    assert y is None or 1 <= y <= 9999


@settings(max_examples=30, deadline=None)
@given(st.text(max_size=200), st.text(max_size=200))
def test_jaccard_symmetric_bounded(a, b):
    j = D.jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == pytest.approx(D.jaccard(b, a))
    assert D.jaccard(a, a) == 1.0


@settings(max_examples=30, deadline=None)
@given(st.text(max_size=200))
def test_simhash_case_invariant(t):
    # simhash lowercases internally; lowercasing is idempotent. (NOT
    # upper().lower() — hypothesis found 'ß'.upper().lower() == 'ss'.)
    assert D.simhash64(t) == D.simhash64(t.lower())


def test_round_away_matches_duckdb():
    """Vectorized check: round_away == SQL ROUND on 20k random doubles
    (the oracle-rounding contract every money query relies on)."""
    import duckdb

    rng = np.random.default_rng(0)
    vals = np.concatenate([
        rng.normal(0, 1e6, 10_000),
        np.round(rng.normal(0, 100, 5_000), 2),          # cent-valued
        (rng.integers(-10**6, 10**6, 5_000) + 0.5) / 10,  # exact .x5 ties
    ])
    for d in (0, 1, 2, 4):
        ours = round_away(vals, d)
        con = duckdb.connect()
        con.register("t", __import__("pandas").DataFrame({"v": vals}))
        theirs = con.execute(f"SELECT ROUND(v, {d}) FROM t").df().iloc[:, 0].to_numpy()
        np.testing.assert_array_equal(ours, theirs, err_msg=f"decimals={d}")


@given(st.lists(st.integers(min_value=0, max_value=2 ** 63 - 1),
                min_size=0, max_size=300),
       st.lists(st.integers(min_value=0, max_value=2 ** 63 - 1),
                min_size=0, max_size=300))
@settings(max_examples=25, deadline=None)
def test_bloom_merge_is_union_and_never_misses(a_items, b_items):
    import numpy as np

    from dataprof_ray.state.bloom import BloomFilter

    a = BloomFilter(1000, 1e-3)
    a.add_u64(np.asarray(a_items, dtype=np.uint64))
    b = BloomFilter(1000, 1e-3)
    b.add_u64(np.asarray(b_items, dtype=np.uint64))
    u = BloomFilter(1000, 1e-3)
    u.add_u64(np.asarray(a_items + b_items, dtype=np.uint64))
    m = a.merge(b)
    assert np.array_equal(m.bits, u.bits)  # merge == union build
    both = np.asarray(a_items + b_items, dtype=np.uint64)
    if len(both):
        assert m.contains_u64(both).all()  # no false negatives, ever


@given(st.lists(st.tuples(st.integers(min_value=0, max_value=2 ** 63 - 1),
                          st.integers(min_value=1, max_value=50)),
                min_size=0, max_size=200),
       st.integers(min_value=0, max_value=3))
@settings(max_examples=25, deadline=None)
def test_cms_estimates_never_undercount_any_split(pairs, split_at):
    import numpy as np

    from dataprof_ray.state.cms import CountMinSketch

    keys = np.asarray([k for k, _ in pairs], dtype=np.uint64)
    counts = np.asarray([c for _, c in pairs], dtype=np.int64)
    cut = (len(pairs) * split_at) // 3 if pairs else 0
    a = CountMinSketch(512, 3)
    a.add_u64(keys[:cut], counts[:cut])
    b = CountMinSketch(512, 3)
    b.add_u64(keys[cut:], counts[cut:])
    m = a.merge(b)
    if len(keys):
        # true count per key (keys may repeat in the draw)
        import collections
        true = collections.Counter()
        for k, c in pairs:
            true[k] += c
        uniq = np.asarray(list(true), dtype=np.uint64)
        est = m.estimate_u64(uniq)
        want = np.asarray([true[int(k)] for k in uniq], dtype=np.int64)
        assert (est >= want).all()
    assert m.total == counts.sum()
