"""Partial-analysis surface: infer_schema / quick_row_count /
analyze_structure (dataprof-partial parity)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dataprof_ray.sources import structure as ST

SF = "/root/testdata/sf0.001"


class TestQuickRowCount:
    def test_parquet_footer_exact(self):
        for table in ("documents", "orders", "lineitem"):
            path = f"{SF}/{table}.parquet"
            est = ST.quick_row_count(path)
            assert est.exact and est.method == "parquet_footer"
            assert est.count == pq.ParquetFile(path).metadata.num_rows

    def test_small_csv_full_scan(self, tmp_path):
        p = tmp_path / "small.csv"
        p.write_text("a,b\n" + "\n".join(f"{i},{i * 2}" for i in range(500)) + "\n")
        est = ST.quick_row_count(str(p))
        assert est.exact and est.method == "full_scan"
        assert est.count == 500

    def test_no_trailing_newline_counted(self, tmp_path):
        p = tmp_path / "nl.csv"
        p.write_text("a\n1\n2\n3")  # last line unterminated
        assert ST.quick_row_count(str(p)).count == 3

    def test_large_csv_windowed_estimate(self, tmp_path, monkeypatch):
        p = tmp_path / "big.csv"
        rows = 20_000
        p.write_text("a,b\n" + "\n".join(f"{i},{i * 3}" for i in range(rows)) + "\n")
        monkeypatch.setattr(ST, "FULL_SCAN_THRESHOLD", 1024)  # force estimate
        est = ST.quick_row_count(str(p))
        assert not est.exact and est.method == "windowed_estimate"
        assert abs(est.count - rows) / rows < 0.05  # within 5%


class TestInferSchema:
    def test_parquet_zero_rows_read(self):
        cols = {c.name: c.data_type for c in ST.infer_schema(f"{SF}/orders.parquet")}
        assert cols["o_orderkey"] == "Integer"
        assert cols["o_totalprice"] == "Float"
        assert cols["o_orderdate"] == "Date"

    def test_csv_semantic_inference(self, tmp_path):
        p = tmp_path / "t.csv"
        p.write_text(
            "id,amount,flag,when,name\n"
            + "\n".join(
                f"{i},{i * 1.5},{'true' if i % 2 else 'false'},2024-01-0{i % 9 + 1},u{i}"
                for i in range(50)
            )
        )
        cols = {c.name: c.data_type for c in ST.infer_schema(str(p))}
        assert cols["id"] == "Integer"
        assert cols["amount"] == "Float"
        assert cols["flag"] == "Boolean"
        assert cols["when"] == "Date"
        assert cols["name"] == "String"


class TestAnalyzeStructure:
    def test_parquet_structure(self):
        rep = ST.analyze_structure(f"{SF}/documents.parquet")
        assert rep.format == "parquet"
        assert rep.row_count.exact
        names = [c.name for c in rep.columns]
        assert "doc_id" in names and "text" in names
        assert rep.sampled_rows > 0
        assert set(rep.sample_null_counts) == set(names)

    def test_facade_method(self):
        from dataprof_ray.profiler import Profiler

        rep = Profiler().analyze_structure(f"{SF}/events.parquet")
        assert rep.row_count.count == pq.ParquetFile(
            f"{SF}/events.parquet").metadata.num_rows

    def test_null_like_tokens_counted(self, tmp_path):
        p = tmp_path / "n.csv"
        p.write_text("a\nx\nnull\n\nNaN\ny\n")
        rep = ST.analyze_structure(str(p))
        # 'null', '' and 'NaN' are null-like (kernels.is_null_like_token)
        assert rep.sample_null_counts["a"] >= 2
