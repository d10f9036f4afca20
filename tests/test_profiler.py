"""Distributed profile pipeline vs single-process oracle parity — the Ray
analog of the reference's cross-engine consistency suite
(tests/cross_engine_consistency.rs, python/tests/test_engine_parity.py)."""

import numpy as np
import pyarrow as pa
import pytest

from dataprof_ray import schema as S
from dataprof_ray.functions import kernels as K
from dataprof_ray.pipelines import profile as PP


@pytest.fixture(scope="module")
def mixed_table() -> pa.Table:
    """F2-style benchmark schema (benches/benchmarks.rs:83-104)."""
    rng = np.random.default_rng(42)
    n = 5000
    return pa.table({
        "id": pa.array(range(n), pa.int64()),
        "name": [f"user_{i}" for i in range(n)],
        "email": [f"user{i}@example.com" for i in range(n)],
        "age": pa.array(rng.integers(18, 80, n), pa.int64()),
        "salary": pa.array(np.round(rng.normal(50_000, 15_000, n), 2), pa.float64()),
        "is_active": ["true" if i % 3 else "false" for i in range(n)],
        "created_at": ["2024-%02d-%02d" % (i % 12 + 1, i % 28 + 1) for i in range(n)],
        "score": pa.array(rng.random(n) * 100, pa.float64()),
    })


def test_ray_matches_oracle_exact_fields(ray_session, mixed_table):
    import ray.data as rd

    ds = rd.from_arrow(mixed_table).repartition(8)
    dist = PP.profile_dataset(ds)
    local = PP.profile_table(mixed_table)

    assert sorted(dist.columns) == sorted(local.columns)
    for name in local.columns:
        dp, lp = dist[name], local[name]
        assert dp.data_type == lp.data_type, name
        assert dp.null_count == lp.null_count, name
        assert dp.total_count == lp.total_count, name
        assert dp.unique_count == lp.unique_count, name
        assert dp.invalid_count == lp.invalid_count, name
        if isinstance(lp.stats, S.NumericStats):
            # exact-over-sample contract: full-stream aggregates identical
            assert dp.stats.min == lp.stats.min
            assert dp.stats.max == lp.stats.max
            assert dp.stats.mean == pytest.approx(lp.stats.mean, rel=1e-12)
            assert dp.stats.std_dev == pytest.approx(lp.stats.std_dev, rel=1e-9)


def test_sorted_beyond_sample_capacity(ray_session):
    """F4 (cross_engine_consistency.rs:15-94): sorted stream 3x the reservoir;
    exact aggregates survive, order stats flagged approximate."""
    import ray.data as rd

    n = 30_000
    t = pa.table({
        "id": pa.array(range(n), pa.int64()),
        "value": pa.array([i / 2 for i in range(n)], pa.float64()),
    })
    ds = rd.from_arrow(t).repartition(6)
    rep = PP.profile_dataset(ds, sample_capacity=10_000)
    vp = rep["value"]
    assert vp.stats.min == 0.0
    assert vp.stats.max == (n - 1) / 2
    assert vp.stats.mean == pytest.approx((n - 1) / 4, rel=1e-9)
    assert vp.stats.is_approximate is True
    assert vp.invalid_count == 0
    assert vp.unique_count_is_approximate  # >10k distinct -> HLL regime


def test_invalid_count_contract(ray_session):
    """F5 (cross_engine_consistency.rs:100-142): one non-numeric value in a
    numeric-typed string column -> invalid_count=1; text column -> None."""
    import ray.data as rd

    amounts = [f"{v:.1f}" for v in np.arange(0.5, 4.6, 0.5)] + ["12,50", ""]
    labels = [f"l{i}" for i in range(len(amounts))]
    t = pa.table({"amount": amounts, "label": labels})
    rep = PP.profile_dataset(rd.from_arrow(t))
    ap = rep["amount"]
    assert ap.data_type == K.TYPE_FLOAT
    assert ap.null_count == 1
    assert ap.invalid_count == 1  # "12,50"
    assert rep["label"].invalid_count is None


def test_quality_gate_table(ray_session):
    """F3 (examples/etl_quality_gate.rs:23-39): duplicate key, nulls,
    negative amount, fully-null row."""
    import ray.data as rd

    t = pa.table({
        "transaction_id": ["T-2001", "T-2002", "T-2002", "T-2003", None],
        "account": ["A-1", None, "A-2", "A-3", None],
        "amount_eur": ["100.50", "200.00", "200.00", "-50.25", None],
        "booked_at": ["2024-01-10", "2024-01-11", "2024-01-11", "2024-01-12", None],
    })
    rep = PP.profile_dataset(
        rd.from_arrow(t),
        positive_columns=("amount_eur",),
        identifier_columns=("transaction_id",),
    )
    q = rep.quality
    assert q.uniqueness.key_column == "transaction_id"
    assert q.uniqueness.key_uniqueness < 100.0
    assert q.accuracy.negative_values_in_positive == 1
    assert q.completeness.missing_values_ratio > 0
    assert rep.quality_score() < 100.0


def test_zero_row_table(ray_session):
    import ray.data as rd

    t = pa.table({"a": pa.array([], pa.string()), "n": pa.array([], pa.float64())})
    rep = PP.profile_dataset(rd.from_arrow(t))
    assert set(rep.columns) == {"a", "n"}
    assert rep.rows == 0


def test_boolean_column_native(ray_session):
    import ray.data as rd

    t = pa.table({"flag": pa.array([True, False, True, None])})
    rep = PP.profile_dataset(rd.from_arrow(t))
    p = rep["flag"]
    assert p.data_type == K.TYPE_BOOLEAN
    assert p.stats.true_count == 2 and p.stats.false_count == 1
    assert p.null_count == 1


def test_timestamp_column(ray_session):
    import pandas as pd
    import ray.data as rd

    ts = pd.to_datetime(["2024-01-15 10:30:00", "2024-02-20 00:00:00", "2023-12-01 00:00:00"])
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us"))})
    rep = PP.profile_dataset(rd.from_arrow(t))
    p = rep["ts"]
    assert p.data_type == K.TYPE_DATE
    assert p.stats.min_datetime == "2023-12-01"
    assert p.stats.max_datetime == "2024-02-20"
    assert p.stats.year_distribution == {2024: 2, 2023: 1}
    assert p.stats.hour_distribution is not None  # one value has a time part


def test_binary_column_length_only(ray_session):
    import ray.data as rd

    t = pa.table({"blob": pa.array([b"ab", b"abcd", None], pa.binary())})
    rep = PP.profile_dataset(rd.from_arrow(t))
    p = rep["blob"]
    assert p.stats.min_length == 2 and p.stats.max_length == 4
    assert p.unique_count is None  # profiled by length only


def test_report_roundtrip(tmp_path, mixed_table):
    rep = PP.profile_table(mixed_table.slice(0, 500))
    path = str(tmp_path / "report.json")
    rep.save(path)
    loaded = S.ProfileReport.load(path)
    assert loaded.columns == rep.columns
    assert loaded["id"].unique_count == rep["id"].unique_count

    # schema-version gate fails loudly before decoding fields
    import json

    raw = json.load(open(path))
    raw["schema_version"] = 99
    bad = str(tmp_path / "bad.json")
    json.dump(raw, open(bad, "w"))
    with pytest.raises(ValueError, match="schema_version"):
        S.ProfileReport.load(bad)


def test_profile_testdata_lineitem(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet")
    rep = PP.profile_dataset(ds)
    assert rep.rows == 6000
    assert rep["l_quantity"].data_type == K.TYPE_FLOAT
    assert rep["l_returnflag"].data_type == K.TYPE_STRING
    assert rep["l_shipdate"].data_type == K.TYPE_DATE
    import duckdb

    truth = duckdb.sql(
        f"select count(distinct l_orderkey) from '{sf_dir}/lineitem.parquet'"
    ).fetchone()[0]
    assert rep["l_orderkey"].unique_count == truth
    assert rep.quality is not None


def test_progress_callback(ray_session):
    import ray.data as rd

    from dataprof_ray.pipelines.profile import collect_column_state

    t = pa.table({"x": list(range(5000))})
    calls = []
    collect_column_state(
        rd.from_arrow(t).repartition(4),
        progress=lambda parts, rows: calls.append((parts, rows)),
    )
    assert calls  # invoked at least once per partial
    assert calls[-1][1] == 5000  # final rows_so_far covers the stream
    assert [c[0] for c in calls] == sorted(c[0] for c in calls)


def test_distributed_text_frequencies(ray_session):
    import ray.data as rd

    t = pa.table({"s": pa.array(["x"] * 50 + ["y"] * 30 + ["z"] * 20)})
    report = PP.profile_dataset(rd.from_arrow(t).repartition(4))
    st = report["s"].stats
    assert st.most_frequent[0] == ("x", 50)
    assert st.most_frequent[1] == ("y", 30)
    assert st.least_frequent[0] == ("z", 20)


def test_tree_merge_matches_driver_merge_exact_fields(ray_session):
    import ray.data as rd

    from dataprof_ray.pipelines.profile import collect_column_state

    t = pa.table({
        "x": pa.array(np.linspace(-50, 50, 20_000)),
        "s": pa.array([f"v{i % 37}" for i in range(20_000)]),
    })
    ds = rd.from_arrow(t).repartition(16)
    flat = collect_column_state(ds)
    tree = collect_column_state(ds, tree_merge_groups=4)
    for col in ("x", "s"):
        a, b = flat.columns[col], tree.columns[col]
        assert a.count == b.count and a.null_count == b.null_count
        assert a.unique_count() == b.unique_count()
    assert flat.columns["x"].welford.mean == pytest.approx(
        tree.columns["x"].welford.mean, rel=1e-12)
    assert flat.columns["x"].min == tree.columns["x"].min
    assert flat.columns["x"].max == tree.columns["x"].max


def test_tree_merge_auto_enables_above_threshold(ray_session, monkeypatch):
    """profile_dataset's default path engages the grouped (tree) merge once
    the estimated block count crosses the threshold — VERDICT r1 item 3."""
    import ray.data as rd

    from dataprof_ray.pipelines import profile as P

    assert P._auto_tree_groups(P.TREE_MERGE_BLOCK_THRESHOLD) == 0
    assert P._auto_tree_groups(P.TREE_MERGE_BLOCK_THRESHOLD + 1) == 32
    assert P._auto_tree_groups(20_000) == 141  # ~sqrt
    assert P._auto_tree_groups(10_000_000) == 256  # clamped

    t = pa.table({"x": pa.array(np.arange(4000, dtype=np.float64))})
    ds = rd.from_arrow(t).repartition(16)
    assert P._estimate_blocks(ds) == 16
    # force the auto path on at 16 blocks and pin it against the flat fold
    monkeypatch.setattr(P, "TREE_MERGE_BLOCK_THRESHOLD", 8)
    auto = P.collect_column_state(ds)  # default None -> auto -> grouped
    flat = P.collect_column_state(ds, tree_merge_groups=0)
    a, b = auto.columns["x"], flat.columns["x"]
    assert a.count == b.count and a.min == b.min and a.max == b.max
    assert a.welford.mean == pytest.approx(b.welford.mean, rel=1e-12)


def test_duplicate_columns_rejected(ray_session):
    import ray.data as rd

    from dataprof_ray.pipelines.profile import profile_dataset

    t = pa.Table.from_arrays(
        [pa.array([1, 2]), pa.array([3, 4])], names=["a", "a"])
    # rejected loudly — either by our up-front validation or by pyarrow's
    # own schema lookup, depending on where Ray first touches the schema
    with pytest.raises(Exception, match="[Dd]uplicate|exists 2 times"):
        profile_dataset(rd.from_arrow(t))


def test_nonutf8_binary_and_nested_columns(ray_session):
    """Regressions: row signatures over non-UTF8 binary payloads; nested
    struct/list columns profiled via the string-render fallback."""
    from dataprof_ray.state import accumulators as A

    t = pa.table({"a": [1, 2],
                  "blob": pa.array([b"\xff\xfe\x00\x01", b"ok"], pa.binary())})
    coll = A.ColumnCollection(track_row_uniqueness=True)
    coll.update_table(t)
    assert coll.row_tracker.rows_seen == 2

    t2 = pa.table({"s": pa.array([{"a": 1}, {"a": 2}]),
                   "l": pa.array([[1, 2], [3]])})
    rep = PP.profile_table(t2)
    assert rep["s"].data_type == "String"
    assert rep["l"].total_count == 2


def test_bool_binary_columns_do_not_force_mixed(ray_session):
    t = pa.table({"flag": pa.array([True, False, True]),
                  "x": pa.array([1.0, 2.0, 3.0])})
    rep = PP.profile_table(t)
    assert rep.metric_confidence == "Exact"
    assert rep.execution.sampling_applied is False


def test_name_heuristics_reference_parity():
    assert not K.is_likely_date_column("gender")       # 'end' not a token
    assert not K.is_likely_date_column("weekend_sales")
    assert K.is_likely_date_column("created_at")
    assert K.is_likely_id_column("pk")
    assert not K.is_likely_id_column("country_code")


def test_textlength_merge_does_not_alias():
    import numpy as np

    from dataprof_ray.state import accumulators as A

    a, b = A.TextLengthStats(), A.TextLengthStats()
    b.update_lengths(np.array([5, 7]))
    a.merge(b)
    a.update_lengths(np.array([100]))
    assert b.welford.count == 2  # donor untouched
