"""Public facade: Profiler builder + profile() dispatch, the reference's
public_api_facade.rs / test_python_api.py analog."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import dataprof_ray as dp
from dataprof_ray.state.stop import StopCondition


@pytest.fixture(scope="module")
def csv_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("facade") / "data.csv"
    rows = ["id,amount,label,when"]
    for i in range(200):
        rows.append(f"{i},{i * 2.5:.2f},item{i % 5},2024-03-{i % 28 + 1:02d}")
    p.write_text("\n".join(rows) + "\n")
    return str(p)


class TestAnalyzeFile:
    def test_csv(self, ray_session, csv_file):
        rep = dp.Profiler().analyze_file(csv_file)
        assert rep.rows == 200
        assert rep["id"].data_type == "Integer"
        assert rep["amount"].data_type == "Float"
        assert rep.data_source["format"] == "csv"
        assert rep.quality_score() is not None

    def test_parquet(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        p = tmp_path / "t.parquet"
        pq.write_table(pa.table({"x": range(50)}), p)
        rep = dp.Profiler().analyze_file(str(p))
        assert rep.rows == 50

    def test_jsonl(self, ray_session, tmp_path):
        p = tmp_path / "t.jsonl"
        p.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
        rep = dp.Profiler().analyze_file(str(p))
        assert rep.rows == 2

    def test_unknown_extension(self):
        with pytest.raises(ValueError, match="format"):
            dp.Profiler().analyze_file("/tmp/whatever.xyz")

    def test_format_override(self, ray_session, tmp_path):
        p = tmp_path / "data.txt"
        p.write_text("a,b\n1,2\n")
        rep = dp.Profiler().with_format("csv").analyze_file(str(p))
        assert rep.rows == 1


class TestBuilder:
    def test_no_quality_pack(self, ray_session, csv_file):
        rep = dp.Profiler().with_metric_packs("schema", "statistics").analyze_file(csv_file)
        assert rep.quality is None
        assert rep.quality_score() is None

    def test_quality_dimension_selection(self, ray_session, csv_file):
        """Selected dimensions are the ONLY ones assessed; the rest stay
        None so the overall score renormalizes (ADVICE r1: the selection
        used to be validated but never threaded into assembly)."""
        rep = (dp.Profiler()
               .with_quality_dimensions("completeness")
               .analyze_file(csv_file))
        q = rep.quality
        assert q.completeness is not None
        assert q.consistency is None and q.uniqueness is None
        assert q.accuracy is None and q.validity is None and q.precision is None
        scores = q.dimension_scores()
        assert scores["completeness"] is not None
        assert all(v is None for k, v in scores.items() if k != "completeness")
        assert rep.quality_score() == pytest.approx(scores["completeness"])

    def test_no_patterns_pack(self, ray_session, csv_file):
        rep = (dp.Profiler()
               .with_metric_packs("schema", "statistics", "quality")
               .analyze_file(csv_file))
        assert all(p.patterns is None for p in rep.column_profiles)

    def test_stop_when_max_rows(self, ray_session, csv_file):
        rep = dp.Profiler().stop_when(StopCondition.max_rows(50)).analyze_file(csv_file)
        assert rep.rows == 50
        assert rep.execution.truncation_reason == "MaxRows"

    def test_identifier_hint(self, ray_session, csv_file):
        rep = dp.Profiler().with_identifier_columns("id").analyze_file(csv_file)
        assert rep["id"].data_type in ("Integer", "Identifier")

    def test_unknown_hint_column_fails_loud(self, ray_session, csv_file):
        with pytest.raises(ValueError, match="unknown columns"):
            dp.Profiler().with_identifier_columns("nope").analyze_file(csv_file)

    def test_bad_format_override(self):
        with pytest.raises(ValueError, match="format"):
            dp.Profiler().with_format("xml")


class TestProfileDispatch:
    def test_dict(self, ray_session):
        rep = dp.profile({"x": [1, 2, 3], "y": ["a", "b", "c"]})
        assert rep.rows == 3

    def test_records(self, ray_session):
        rep = dp.profile([{"x": 1}, {"x": 2}])
        assert rep.rows == 2

    def test_pandas(self, ray_session):
        rep = dp.profile(pd.DataFrame({"x": np.arange(10.0)}))
        assert rep.rows == 10
        assert rep.data_source["provenance"] == "pandas"

    def test_arrow(self, ray_session):
        rep = dp.profile(pa.table({"x": [1, 2]}))
        assert rep.rows == 2

    def test_polars(self, ray_session):
        import polars as pl

        rep = dp.profile(pl.DataFrame({"x": [1.5, 2.5]}))
        assert rep.rows == 2

    def test_kwargs_hints(self, ray_session):
        rep = dp.profile({"amount": [1.0, 2.0, 3.0]}, positive_columns=("amount",))
        assert rep.rows == 3


def test_parquet_metadata_captured(ray_session, tmp_path):
    import pyarrow.parquet as pq

    p = tmp_path / "m.parquet"
    pq.write_table(pa.table({"x": range(100)}), p, compression="snappy")
    rep = dp.Profiler().analyze_file(str(p))
    meta = rep.data_source["parquet"]
    assert meta["num_rows"] == 100
    assert meta["num_row_groups"] >= 1
    assert meta["codec"] == "SNAPPY"


def test_exhausted_limit_not_truncation(ray_session, tmp_path):
    # stop_when(max_rows(1000)) on a 200-row file: exhaustion, not truncation
    p = tmp_path / "small.csv"
    p.write_text("a\n" + "\n".join(str(i) for i in range(200)) + "\n")
    rep = dp.Profiler().stop_when(StopCondition.max_rows(1000)).analyze_file(str(p))
    assert rep.rows == 200
    assert rep.execution.truncation_reason is None
