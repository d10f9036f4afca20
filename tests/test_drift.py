"""Distribution drift: shared-bin histograms, PSI, categorical deltas."""

import numpy as np
import pyarrow as pa
import pytest

from dataprof_ray.pipelines import drift as DR


def _ds(table):
    import ray.data as rd

    return rd.from_arrow(table).repartition(3)


class TestNumericDrift:
    def test_identical_distributions_stable(self, ray_session):
        rng = np.random.default_rng(0)
        x = rng.normal(50, 10, size=20_000)
        a = _ds(pa.table({"x": pa.array(x[::2])}))
        b = _ds(pa.table({"x": pa.array(x[1::2])}))
        out = DR.numeric_drift(a, b, "x")
        assert out["verdict"] == "stable"
        assert out["psi"] < 0.05
        bins = out["bins"]
        assert len(bins) == 10
        assert bins["cnt_a"].sum() == 10_000 and bins["cnt_b"].sum() == 10_000

    def test_shifted_distribution_flagged(self, ray_session):
        rng = np.random.default_rng(1)
        a = _ds(pa.table({"x": pa.array(rng.normal(0, 1, size=5000))}))
        b = _ds(pa.table({"x": pa.array(rng.normal(2.5, 1, size=5000))}))
        out = DR.numeric_drift(a, b, "x")
        assert out["verdict"] == "major_drift"
        assert out["psi"] > 0.25

    def test_shared_bounds_span_both_sides(self, ray_session):
        a = _ds(pa.table({"x": pa.array([0.0, 1.0, 2.0])}))
        b = _ds(pa.table({"x": pa.array([8.0, 9.0, 10.0])}))
        bins = DR.numeric_drift_bins(a, b, "x", bins=5)
        assert bins["bin_lo"].iloc[0] == 0.0
        assert bins["bin_hi"].iloc[-1] == pytest.approx(10.0)
        # a lands in low bins, b in high bins, max value clamped into last
        assert bins["cnt_a"].iloc[0] > 0 and bins["cnt_b"].iloc[-1] > 0

    def test_degenerate_constant_column(self, ray_session):
        a = _ds(pa.table({"x": pa.array([5.0] * 100)}))
        b = _ds(pa.table({"x": pa.array([5.0] * 50)}))
        bins = DR.numeric_drift_bins(a, b, "x", bins=4)
        assert bins["cnt_a"].sum() == 100 and bins["cnt_b"].sum() == 50
        assert bins["cnt_a"].iloc[0] == 100  # everything in bin 0


class TestPsi:
    def test_zero_for_identical(self):
        assert DR.population_stability_index([10, 20, 30], [10, 20, 30]) == \
            pytest.approx(0.0, abs=1e-12)

    def test_known_value(self):
        # hand-computed: p=(0.5,0.5), q=(0.9,0.1)
        want = (0.5 - 0.9) * np.log(0.5 / 0.9) + (0.5 - 0.1) * np.log(0.5 / 0.1)
        got = DR.population_stability_index([50, 50], [90, 10])
        assert got == pytest.approx(want, rel=1e-9)

    def test_empty_bin_smoothed_not_inf(self):
        psi = DR.population_stability_index([100, 0], [50, 50])
        assert np.isfinite(psi) and psi > 0


class TestCategoricalDrift:
    def test_frequency_shift(self, ray_session):
        a = _ds(pa.table({"c": pa.array(["x"] * 90 + ["y"] * 10)}))
        b = _ds(pa.table({"c": pa.array(["x"] * 10 + ["y"] * 90)}))
        out = DR.categorical_drift(a, b, "c")
        assert out["verdict"] == "major_drift"
        cats = out["categories"].set_index("c")
        assert cats.loc["x", "cnt_a"] == 90 and cats.loc["x", "cnt_b"] == 10

    def test_tail_folds_into_other(self, ray_session):
        vals = [f"v{i}" for i in range(30)]
        a = _ds(pa.table({"c": pa.array(vals * 2)}))
        b = _ds(pa.table({"c": pa.array(vals)}))
        out = DR.categorical_drift(a, b, "c", top_n=5)
        cats = out["categories"]
        assert "__other__" in set(cats["c"])
        assert cats["cnt_a"].sum() == 60 and cats["cnt_b"].sum() == 30

    def test_nulls_tracked(self, ray_session):
        a = _ds(pa.table({"c": pa.array(["x", None, "x", None])}))
        b = _ds(pa.table({"c": pa.array(["x", "x", "x", "x"])}))
        out = DR.categorical_drift(a, b, "c")
        cats = out["categories"].set_index("c")
        assert cats.loc["__null__", "cnt_a"] == 2
        assert cats.loc["__null__", "cnt_b"] == 0


def test_empty_side_does_not_crash(ray_session):
    import ray.data as rd

    a = rd.from_arrow(pa.table({"x": pa.array([1.0, 2.0, 3.0])}))
    b = rd.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
    bins = DR.numeric_drift_bins(a, b, "x", bins=4)
    assert bins["cnt_a"].sum() == 3 and bins["cnt_b"].sum() == 0


def test_infinite_values_do_not_poison_bins(ray_session):
    import ray.data as rd

    a = rd.from_arrow(pa.table({"x": pa.array([1.0, float("-inf"), 3.0])}))
    b = rd.from_arrow(pa.table({"x": pa.array([2.0, float("inf"), 4.0])}))
    bins = DR.numeric_drift_bins(a, b, "x", bins=4)
    # finite values binned over finite bounds [1, 4]; infs excluded
    assert bins["cnt_a"].sum() == 2 and bins["cnt_b"].sum() == 2
    assert np.isfinite(bins["bin_lo"]).all() and np.isfinite(bins["bin_hi"]).all()


def test_no_data_verdict(ray_session):
    import ray.data as rd

    empty = rd.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
    full = rd.from_arrow(pa.table({"x": pa.array([1.0, 2.0])}))
    out = DR.numeric_drift(empty, full, "x")
    assert out["verdict"] == "no_data"  # vanished input must not read healthy
    out2 = DR.numeric_drift(empty, empty, "x")
    assert out2["verdict"] == "no_data"
    assert np.isfinite(out2["bins"]["bin_lo"]).all()


def test_drift_report_whole_table(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    n = 4000
    a = rd.from_arrow(pa.table({
        "num": pa.array(rng.normal(0, 1, n)),
        "cat": pa.array(rng.choice(["p", "q"], n).tolist()),
        "ts": pa.array(np.full(n, np.datetime64("2024-01-01", "us"))),
    }))
    b = rd.from_arrow(pa.table({
        "num": pa.array(rng.normal(3, 1, n)),  # shifted
        "cat": pa.array(rng.choice(["p", "q"], n).tolist()),  # same
        "ts": pa.array(np.full(n, np.datetime64("2024-01-01", "us"))),
    }))
    rep = DR.drift_report(a, b).set_index("column")
    assert rep.loc["num", "verdict"] == "major_drift"
    assert rep.loc["cat", "verdict"] == "stable"
    assert "ts" not in rep.index  # non-numeric/string skipped


def test_vocab_drift_planted_shift(ray_session):
    """Planted drift: side B floods 'spamword'; top term by |delta| must
    be the flood, counts exact, ties broken by term."""
    import ray.data as rd

    from dataprof_ray.pipelines.drift import vocab_drift

    a = pa.table({"text": ["alpha beta gamma", "alpha beta", "", None]})
    b = pa.table({"text": ["spamword spamword spamword alpha",
                           "spamword beta gamma gamma"]})
    out = vocab_drift(rd.from_arrow(a).repartition(2),
                      rd.from_arrow(b).repartition(2), top_n=3)
    assert out.loc[0, "term"] == "spamword"
    assert out.loc[0, "n_a"] == 0 and out.loc[0, "n_b"] == 4
    assert out.loc[0, "delta"] == 4
    # |delta|=1 ties: alpha (2->1), beta (2->1), gamma (1->2) -> term order
    assert out["term"].tolist() == ["spamword", "alpha", "beta"]


def test_vocab_drift_empty_sides(ray_session):
    import ray.data as rd

    from dataprof_ray.pipelines.drift import vocab_drift

    empty = pa.table({"text": pa.array([], pa.string())})
    out = vocab_drift(rd.from_arrow(empty), rd.from_arrow(empty))
    assert len(out) == 0
    assert list(out.columns) == ["term", "n_a", "n_b", "delta"]


def test_snapshot_diff_statuses(ray_session):
    import ray.data as rd

    from dataprof_ray.pipelines.drift import snapshot_diff

    a = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": ["same", "edited v1", "gone", None]})
    b = pa.table({"doc_id": pa.array([1, 2, 5, 4], pa.int64()),
                  "text": ["same", "edited v2", "brand new", None]})
    out = snapshot_diff(rd.from_arrow(a).repartition(2),
                        rd.from_arrow(b).repartition(2))
    got = dict(zip(out["status"], out["n_docs"]))
    # doc 4: null text on both sides hashes equal -> unchanged
    assert got == {"added": 1, "removed": 1, "changed": 1, "unchanged": 2}
