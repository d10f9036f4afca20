"""Byte-stream profiling surface: profile_stream / profile_url
(the reference's async streaming profiler, driven locally)."""

import io

import numpy as np
import pyarrow as pa
import pytest

from dataprof_ray.sources import streams as SS
from dataprof_ray.state.stop import StopCondition


def _csv_bytes(rows: int = 1000) -> bytes:
    lines = ["id,amount,name"]
    lines += [f"{i},{i * 0.5},u{i}" for i in range(rows)]
    return ("\n".join(lines) + "\n").encode()


class TestRecordChunks:
    def test_chunks_align_to_newlines(self):
        data = b"aaa\nbbb\nccc\nddd"
        chunks = list(SS.iter_record_chunks(io.BytesIO(data), chunk_bytes=5))
        assert b"".join(chunks) == data
        # every chunk except possibly the last ends on a record boundary
        for c in chunks[:-1]:
            assert c.endswith(b"\n")

    def test_iterable_source(self):
        blocks = [b"x,y\n1,", b"2\n3,4", b"\n"]
        chunks = list(SS.iter_record_chunks(blocks))
        assert b"".join(chunks) == b"x,y\n1,2\n3,4\n"


class TestProfileStream:
    def test_csv_stream_counts_and_types(self):
        rep = SS.profile_stream(io.BytesIO(_csv_bytes(500)), format="csv",
                                chunk_bytes=256)
        cols = {p.name: p for p in rep.column_profiles}
        assert cols["id"].total_count == 500
        assert cols["id"].data_type == "Integer"
        assert cols["amount"].data_type == "Float"
        assert cols["name"].data_type in ("String", "Identifier")
        # exact stream aggregates, not chunk-local ones
        assert cols["amount"].stats.max == pytest.approx(499 * 0.5)

    def test_stream_equals_batch_profile(self):
        """The stream path folds into the SAME accumulators as the batch
        path, so counts/aggregates agree exactly."""
        import pyarrow.csv as pacsv

        from dataprof_ray.pipelines.profile import profile_table

        data = _csv_bytes(800)
        srep = SS.profile_stream(io.BytesIO(data), format="csv",
                                 chunk_bytes=512)
        brep = profile_table(pacsv.read_csv(io.BytesIO(data)))
        for s, b in zip(srep.column_profiles, brep.column_profiles):
            assert (s.name, s.total_count, s.null_count, s.unique_count) == \
                (b.name, b.total_count, b.null_count, b.unique_count)

    def test_jsonl_stream_skip_policy(self):
        data = b'{"a": 1}\n{"a": 2}\nnot json\n{"a": 3}\n'
        rep = SS.profile_stream(io.BytesIO(data), format="json")
        assert rep.column_profiles[0].total_count == 3
        assert rep.data_source["json_errors"] == 1

    def test_jsonl_strict_raises(self):
        data = b'{"a": 1}\nbroken\n'
        with pytest.raises(ValueError, match="malformed"):
            SS.profile_stream(io.BytesIO(data), format="json",
                              json_error_policy="strict")

    def test_stop_condition_truncates(self):
        rep = SS.profile_stream(io.BytesIO(_csv_bytes(5000)), format="csv",
                                chunk_bytes=1024,
                                stop_condition=StopCondition.max_rows(500))
        assert rep.execution.truncation_reason is not None
        assert rep.rows < 5000


class TestProfileUrl:
    def test_file_url(self, tmp_path):
        p = tmp_path / "t.csv"
        p.write_bytes(_csv_bytes(100))
        rep = SS.profile_url(p.as_uri())
        assert rep.rows == 100

    def test_facade(self, tmp_path):
        from dataprof_ray.profiler import Profiler

        p = tmp_path / "t.csv"
        p.write_bytes(_csv_bytes(50))
        rep = Profiler().profile_url(p.as_uri())
        assert rep.rows == 50
        rep2 = Profiler().profile_stream(io.BytesIO(_csv_bytes(50)))
        assert rep2.rows == 50
