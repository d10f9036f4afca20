"""Tumbling-window aggregates."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from dataprof_ray.pipelines.window import hopping_window, tumbling_window


@pytest.fixture(scope="module")
def events():
    import ray.data as rd

    n = 5000
    base = np.datetime64("2025-01-01T00:00:00", "us")
    ts = base + (np.arange(n) * 137_000_000).astype("timedelta64[us]")  # ~2.3min apart
    t = pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
        "kind": pa.array([f"k{i % 3}" for i in range(n)]),
        "v": pa.array(np.linspace(0, 1, n)),
    })
    return rd.from_arrow(t).repartition(4)


def test_hourly_counts_match_pandas(ray_session, events):
    out = tumbling_window(events, "ts", unit="hour", keys=["kind"], value_col="v")
    df = events.to_pandas()
    df["window"] = df["ts"].dt.floor("h")
    want = df.groupby(["window", "kind"]).agg(cnt=("v", "size"), sum_value=("v", "sum")).reset_index()
    got = out.sort_values(["window", "kind"]).reset_index(drop=True)
    want = want.sort_values(["window", "kind"]).reset_index(drop=True)
    assert (got["cnt"].to_numpy() == want["cnt"].to_numpy()).all()
    np.testing.assert_allclose(got["sum_value"], want["sum_value"].round(2), atol=0.01)


def test_day_unit_no_value(ray_session, events):
    out = tumbling_window(events, "ts", unit="day")
    assert out["cnt"].sum() == 5000
    assert "sum_value" not in out.columns


def test_bad_unit(ray_session, events):
    with pytest.raises(ValueError, match="unit"):
        tumbling_window(events, "ts", unit="fortnight")


def test_minute_unit(ray_session, events):
    out = tumbling_window(events, "ts", unit="minute")
    assert out["cnt"].sum() == 5000
    assert len(out) > 100  # ~2.3-min spacing -> most windows hold 1 event


def test_hopping_matches_pandas_replication(ray_session, events):
    width, slide = 3600, 900  # 1h windows every 15min -> m=4
    out = hopping_window(events, "ts", width_seconds=width,
                         slide_seconds=slide, keys=["kind"], value_col="v")
    df = events.to_pandas()
    parts = []
    for k in range(4):
        d = df.copy()
        d["window"] = (d["ts"].dt.floor("15min")
                       - pd.Timedelta(seconds=slide * k))
        parts.append(d)
    rep = pd.concat(parts)
    want = (rep.groupby(["window", "kind"])
            .agg(cnt=("v", "size"), sum_value=("v", "sum"),
                 min_value=("v", "min"), max_value=("v", "max"))
            .reset_index())
    got = out.sort_values(["window", "kind"]).reset_index(drop=True)
    want = want.sort_values(["window", "kind"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["cnt"].to_numpy() == want["cnt"].to_numpy()).all()
    # every event lands in exactly m=4 windows
    assert got["cnt"].sum() == 4 * 5000
    np.testing.assert_allclose(got["sum_value"], want["sum_value"].round(2),
                               atol=0.01)
    np.testing.assert_allclose(got["min_value"], want["min_value"], atol=1e-9)


def test_hopping_rejects_nonmultiple_width(ray_session, events):
    with pytest.raises(ValueError, match="multiple"):
        hopping_window(events, "ts", width_seconds=3600, slide_seconds=700)


def test_hopping_m1_equals_tumbling(ray_session, events):
    hop = hopping_window(events, "ts", width_seconds=3600,
                         slide_seconds=3600, keys=["kind"], value_col="v")
    tum = tumbling_window(events, "ts", unit="hour", keys=["kind"],
                          value_col="v")
    hop = hop.sort_values(["window", "kind"]).reset_index(drop=True)
    tum = tum.sort_values(["window", "kind"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(hop, tum, check_dtype=False)


def test_rolling_window_matches_pandas(ray_session):
    import ray.data as rd

    from dataprof_ray.pipelines.window import rolling_window

    rng = np.random.default_rng(3)
    n = 3000
    base = np.datetime64("2025-01-01", "us")
    t = pa.table({
        "k": pa.array(rng.integers(0, 40, n)),
        "ts": pa.array(base + rng.integers(0, 10 * 86_400_000_000, n)
                       .astype("timedelta64[us]"), pa.timestamp("us")),
        "cents": pa.array(rng.integers(-500, 500, n), pa.int64()),
    })
    out = (rolling_window(rd.from_arrow(t).repartition(4), "ts", "k",
                          "36h", value_cents_col="cents")
           .to_pandas().sort_values(["k", "ts", "cents"])
           .reset_index(drop=True))
    df = t.to_pandas()
    w = pd.Timedelta("36h")
    cnts, sums = [], []
    for _, row in df.iterrows():
        frame = df[(df["k"] == row["k"]) & (df["ts"] >= row["ts"] - w)
                   & (df["ts"] <= row["ts"])]
        cnts.append(len(frame))
        sums.append(frame["cents"].sum())
    df["w_cnt"], df["w_sum_cents"] = cnts, sums
    want = df.sort_values(["k", "ts", "cents"]).reset_index(drop=True)
    assert (out["w_cnt"].to_numpy() == want["w_cnt"].to_numpy()).all()
    assert (out["w_sum_cents"].to_numpy()
            == want["w_sum_cents"].to_numpy()).all()


def test_rolling_window_ties_share_frame(ray_session):
    import ray.data as rd

    from dataprof_ray.pipelines.window import rolling_window

    ts = pa.array([0, 0, 0], pa.timestamp("us"))
    t = pa.table({"k": [1, 1, 1], "ts": ts,
                  "cents": pa.array([1, 2, 4], pa.int64())})
    out = (rolling_window(rd.from_arrow(t), "ts", "k", "1h",
                          value_cents_col="cents").to_pandas())
    # SQL RANGE frame: all tied timestamps are peers -> identical results
    assert out["w_cnt"].tolist() == [3, 3, 3]
    assert out["w_sum_cents"].tolist() == [7, 7, 7]


def test_rolling_window_rejects_negative(ray_session):
    import ray.data as rd

    from dataprof_ray.pipelines.window import rolling_window

    t = pa.table({"k": [1], "ts": pa.array([0], pa.timestamp("us")),
                  "c": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="non-negative"):
        rolling_window(rd.from_arrow(t), "ts", "k", "-1h")


def test_lag_delta(ray_session):
    """LAG semantics: per-key previous ts + exact integer microsecond gap;
    first row of a key and null-key/ts rows get nulls; ties broken by
    order_extra; int payloads survive (nullable cogroup)."""
    import ray.data as rd

    import pyarrow as pa

    from dataprof_ray.pipelines.window import lag_delta

    def ts(us):
        return us

    t = pa.table({
        "uid": pa.array([1, 1, 1, 2, None, 2], pa.int64()),
        "eid": pa.array([10, 11, 12, 20, 30, 21], pa.int64()),
        "ts": pa.array([100, 250, 250, 7, None, 1000007], pa.int64())
        .cast(pa.timestamp("us")),
    })
    out_t = pa.concat_tables(
        list(lag_delta(rd.from_arrow(t).repartition(3), ts_col="ts",
                       key="uid", order_extra=["eid"], partitions=4)
             .iter_batches(batch_format="pyarrow", batch_size=None)),
        promote_options="default")
    assert out_t.schema.field("gap_us").type == pa.int64()
    assert out_t.schema.field("eid").type == pa.int64()
    out = out_t.to_pandas().sort_values("eid").set_index("eid")
    assert pd.isna(out.loc[10, "gap_us"])  # first row of uid=1
    assert out.loc[11, "gap_us"] == 150
    assert out.loc[12, "gap_us"] == 0  # tie: eid order makes 11 the prev
    assert out.loc[12, "prev_ts"] == out.loc[11, "ts"]
    assert pd.isna(out.loc[20, "gap_us"])
    assert out.loc[21, "gap_us"] == 1_000_000
    # null key passes through with null prev/gap
    assert pd.isna(out.loc[30, "gap_us"]) and pd.isna(out.loc[30, "prev_ts"])


def test_funnel_counts(ray_session):
    """Ordered funnel: strictly-increasing earliest timestamps per stage;
    a stage reached only through all prior stages; null keys excluded."""
    import ray.data as rd

    import pyarrow as pa

    from dataprof_ray.pipelines.aggregate import funnel_counts

    def t(us):
        return us

    rows = [
        # u1: full ordered funnel
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # u2: click BEFORE view -> stops at view
        (2, "click", 5), (2, "view", 10),
        # u3: view+click, purchase SIMULTANEOUS with click (not strictly
        # after) -> stops at click
        (3, "view", 1), (3, "click", 2), (3, "purchase", 2),
        # u4: purchase only -> reaches nothing
        (4, "purchase", 9),
        # null key ignored
        (None, "view", 1),
    ]
    tbl = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "et": pa.array([r[1] for r in rows]),
        "ts": pa.array([r[2] for r in rows], pa.int64())
        .cast(pa.timestamp("us")),
    })
    out = funnel_counts(rd.from_arrow(tbl).repartition(3), key="u",
                        ts_col="ts", stage_col="et",
                        stages=["view", "click", "purchase"], partitions=4)
    assert out["stage"].tolist() == ["view", "click", "purchase"]
    assert out["n_keys"].tolist() == [3, 2, 1]


def test_funnel_counts_empty_input(ray_session):
    """ADVICE r4: zero qualifying events (or a fully-empty dataset) must
    yield the stage list with n_keys=0, not a KeyError from the
    column-less per-partition frame."""
    import ray.data as rd

    import pyarrow as pa

    from dataprof_ray.pipelines.aggregate import funnel_counts

    empty = pa.table({
        "u": pa.array([], pa.int64()),
        "et": pa.array([], pa.string()),
        "ts": pa.array([], pa.timestamp("us")),
    })
    out = funnel_counts(rd.from_arrow(empty), key="u", ts_col="ts",
                        stage_col="et", stages=["view", "click"])
    assert out["stage"].tolist() == ["view", "click"]
    assert out["n_keys"].tolist() == [0, 0]
    # non-empty dataset, but no event matches any funnel stage
    only_other = pa.table({
        "u": pa.array([1, 2], pa.int64()),
        "et": pa.array(["signup", "signup"], pa.string()),
        "ts": pa.array([1, 2], pa.int64()).cast(pa.timestamp("us")),
    })
    out2 = funnel_counts(rd.from_arrow(only_other), key="u", ts_col="ts",
                         stage_col="et", stages=["view", "click"])
    assert out2["n_keys"].tolist() == [0, 0]


def test_session_window_returns_dataset_by_default(ray_session):
    """VERDICT r4 #2: sessions are O(corpus) — the default return is a lazy
    Dataset; as_dataset=False collects the sorted report DataFrame. Values
    checked against a hand-computed sessionization."""
    import ray.data as rd

    import pyarrow as pa

    from dataprof_ray.pipelines.window import session_window

    us = lambda s: s * 1_000_000  # noqa: E731
    rows = [
        (1, us(0)), (1, us(10)), (1, us(2000)),   # gap>1800s -> 2 sessions
        (2, us(5)), (2, us(1805)),                # exactly gap -> same
        (None, us(1)), (3, None),                 # excluded
    ]
    t = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64())
        .cast(pa.timestamp("us")),
    })
    out = session_window(rd.from_arrow(t).repartition(2), "ts", "u",
                         gap_seconds=1800.0)
    assert isinstance(out, rd.Dataset)
    df = (out.to_pandas().sort_values(["u", "session_id"])
          .reset_index(drop=True))
    report = session_window(rd.from_arrow(t).repartition(2), "ts", "u",
                            gap_seconds=1800.0, as_dataset=False)
    pd.testing.assert_frame_equal(df, report)
    assert df[["u", "session_id", "n_events"]].values.tolist() == [
        [1, 1, 2], [1, 2, 1], [2, 1, 2]]


def test_grouped_corr_matches_duckdb(ray_session):
    """Exact-integer-partials corr == the DuckDB oracle formula, and
    degenerate groups (zero variance) come back NaN."""
    import duckdb
    import ray.data as rd

    from dataprof_ray.pipelines.aggregate import grouped_corr

    rng = np.random.default_rng(5)
    n = 4000
    df = pd.DataFrame({
        "k": rng.integers(0, 4, n),
        "x": rng.integers(1, 50, n).astype(np.int64),
        "y": rng.integers(-500, 500, n).astype(np.int64),
    })
    # group 3: constant x -> zero variance -> NaN corr
    df.loc[df["k"] == 3, "x"] = 7
    # plant nulls on one side: excluded on both sides
    df["y"] = df["y"].astype("Int64")
    df.loc[df.index[:50], "y"] = pd.NA
    got = grouped_corr(
        rd.from_pandas(df).repartition(5), ["k"], "x", "y")
    want = duckdb.sql(
        "WITH t AS (SELECT k, x, y FROM df WHERE y IS NOT NULL), "
        "s AS (SELECT k, COUNT(*) n, SUM(x) sx, SUM(y) sy, SUM(x*y) sxy, "
        "SUM(x*x) sxx, SUM(y*y) syy FROM t GROUP BY k) "
        "SELECT k, CAST(n AS BIGINT) n, "
        "ROUND((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))"
        " / (SQRT(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))"
        " * SQRT(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 4) corr "
        "FROM s GROUP BY ALL ORDER BY k").df()
    got = got.sort_values("k").reset_index(drop=True)
    assert list(got["k"]) == list(want["k"])
    assert list(got["n"]) == list(want["n"])
    g, w = got["corr"].to_numpy(), want["corr"].to_numpy()
    assert np.isnan(g[3]) and np.isnan(w[3])
    assert (g[:3] == w[:3]).all()


def test_grouped_entropy_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from dataprof_ray.pipelines.aggregate import grouped_entropy

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "k": rng.integers(0, 5, 3000),
        "v": rng.choice(["a", "b", "c", None], 3000, p=[.5, .3, .1, .1]),
    })
    got = grouped_entropy(
        rd.from_pandas(df).repartition(4), ["k"], "v")
    want = duckdb.sql(
        "SELECT k, ROUND(entropy(v), 4) AS entropy "
        "FROM df GROUP BY k ORDER BY k").df()
    assert (got["entropy"].to_numpy() == want["entropy"].to_numpy()).all()


def test_grouped_entropy_single_value_and_empty(ray_session):
    import ray.data as rd

    from dataprof_ray.pipelines.aggregate import grouped_entropy

    df = pd.DataFrame({"k": [1, 1, 2], "v": ["x", "x", "y"]})
    got = grouped_entropy(rd.from_pandas(df), ["k"], "v")
    assert list(got["entropy"]) == [0.0, 0.0]
    empty = pd.DataFrame({"k": pd.Series(dtype=np.int64),
                          "v": pd.Series(dtype=str)})
    got = grouped_entropy(rd.from_pandas(empty), ["k"], "v")
    assert len(got) == 0 and "entropy" in got.columns
