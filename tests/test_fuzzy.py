"""FastSS fuzzy self-join (pipelines/fuzzy.py).

Exactness is pinned two ways: a brute-force all-pairs Levenshtein oracle
over random short-string corpora (the candidate-generation claim — no
true pair escapes the deletion-neighborhood buckets), and unit pins on
the distance kernels themselves including the O(n) k=1 fast path."""

import random

import numpy as np
import pandas as pd
import pytest

from dataprof_ray.pipelines.fuzzy import (
    _deletion_variants,
    _within_one,
    fuzzy_pairs,
    levenshtein,
)


def _ref_lev(a: str, b: str) -> int:
    # textbook full-matrix DP, no shortcuts — the oracle
    la, lb = len(a), len(b)
    m = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        m[i][0] = i
    for j in range(lb + 1):
        m[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            m[i][j] = min(m[i - 1][j] + 1, m[i][j - 1] + 1,
                          m[i - 1][j - 1] + cost)
    return m[la][lb]


class TestKernels:
    def test_levenshtein_random_matches_reference(self):
        rng = random.Random(7)
        alpha = "abc"
        for _ in range(300):
            a = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 8)))
            b = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 8)))
            assert levenshtein(a, b) == _ref_lev(a, b)

    def test_levenshtein_cap_is_sound(self):
        rng = random.Random(11)
        alpha = "ab"
        for _ in range(300):
            a = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 7)))
            b = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 7)))
            true = _ref_lev(a, b)
            for cap in (1, 2):
                got = levenshtein(a, b, cap=cap)
                if true <= cap:
                    assert got == true
                else:
                    assert got > cap

    def test_within_one_matches_reference(self):
        rng = random.Random(3)
        alpha = "abx"
        for _ in range(500):
            a = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 6)))
            b = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 6)))
            assert _within_one(a, b) == (_ref_lev(a, b) <= 1)

    def test_deletion_variants(self):
        assert _deletion_variants("ab", 1) == {"ab", "a", "b"}
        assert _deletion_variants("abc", 2) == {
            "abc", "ab", "ac", "bc", "a", "b", "c"}
        # neighborhood always contains the string itself and is closed
        # under one more deletion of each frontier member
        v1 = _deletion_variants("abcd", 1)
        assert "abcd" in v1 and len(v1) == 5


def _brute_pairs(names: list, k: int) -> set:
    out = set()
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            if _ref_lev(names[i], names[j]) <= k:
                out.add((i, j, _ref_lev(names[i], names[j])))
    return out


@pytest.mark.usefixtures("ray_session")
class TestFuzzyPairs:
    @pytest.mark.parametrize("k", [1, 2])
    def test_matches_bruteforce_oracle(self, k):
        import ray

        rng = random.Random(42 + k)
        alpha = "abcde"
        names = ["".join(rng.choice(alpha) for _ in range(rng.randrange(3, 9)))
                 for _ in range(120)]
        ds = ray.data.from_pandas(pd.DataFrame({
            "id": np.arange(len(names), dtype=np.int64), "name": names}))
        got = fuzzy_pairs(ds, "name", "id", max_distance=k).to_pandas()
        got_set = {(int(a), int(b), int(d))
                   for a, b, d in got.itertuples(index=False)}
        assert got_set == _brute_pairs(names, k)

    def test_null_and_long_strings_skipped(self):
        import ray

        df = pd.DataFrame({
            "id": np.arange(4, dtype=np.int64),
            "name": ["abc", None, "x" * 500, "abd"],
        })
        ds = ray.data.from_pandas(df)
        got = fuzzy_pairs(ds, "name", "id", max_distance=1,
                          max_len=256).to_pandas()
        assert {(int(a), int(b)) for a, b in got[["id_a", "id_b"]]
                .itertuples(index=False)} == {(0, 3)}

    def test_duplicate_strings_report_distance_zero(self):
        import ray

        df = pd.DataFrame({"id": np.array([5, 9], dtype=np.int64),
                           "name": ["same", "same"]})
        got = fuzzy_pairs(ray.data.from_pandas(df), "name", "id",
                          max_distance=1).to_pandas()
        assert got.to_dict("records") == [{"id_a": 5, "id_b": 9, "dist": 0}]

    def test_empty_input(self):
        import ray

        df = pd.DataFrame({"id": pd.Series(dtype=np.int64),
                           "name": pd.Series(dtype=str)})
        got = fuzzy_pairs(ray.data.from_pandas(df), "name", "id").to_pandas()
        assert len(got) == 0
