"""WARC/WET web-archive reader tests: roundtrip via the deterministic
builders, gzip (single and multi-member, the Common Crawl convention),
Skip/Strict corruption policy with mid-file resync, and the corpus
adapter feeding the quality-filter schema."""

import gzip

import pyarrow as pa
import pytest

from dataprof_ray.sources.warc import (WarcFormatError, build_record,
                                       build_warc_response, build_wet_record,
                                       read_warc, read_wet, warc_corpus)


def _wet_bytes(n=5):
    out = [build_record("warcinfo", b"software: test\r\n")]
    for i in range(n):
        out.append(build_wet_record(
            f"https://example.com/p{i}", f"doc {i} text\nline two {i}",
            date=f"2024-01-0{i % 9 + 1}T12:00:00Z",
            record_id=f"<urn:uuid:{i:032d}>"))
    return b"".join(out)


def _warc_bytes(n=3):
    out = [build_record("warcinfo", b"software: test\r\n")]
    for i in range(n):
        out.append(build_warc_response(
            f"https://example.com/h{i}",
            f"<html><body>page {i}</body></html>".encode(),
            status=200 if i != 1 else 404))
        out.append(build_record("request", b"GET / HTTP/1.1\r\n\r\n",
                                url=f"https://example.com/h{i}"))
    return b"".join(out)


def test_wet_roundtrip(ray_session, tmp_path):
    p = tmp_path / "a.wet"
    p.write_bytes(_wet_bytes(5))
    df = read_wet(str(p)).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(df) == 5  # warcinfo record excluded
    assert list(df["url"]) == [f"https://example.com/p{i}" for i in range(5)]
    assert df["text"][2] == "doc 2 text\nline two 2"
    assert str(df["warc_ts"].dtype).startswith("datetime64")
    assert df["warc_ts"][0].day == 1 and df["warc_ts"][0].hour == 12
    assert df["content_length"][0] == len(b"doc 0 text\nline two 0")
    assert df["parse_ok"].all()


def test_wet_gzip_single_and_multimember(ray_session, tmp_path):
    # single-stream gzip
    (tmp_path / "one.wet.gz").write_bytes(gzip.compress(_wet_bytes(4)))
    assert read_wet(str(tmp_path / "one.wet.gz")).count() == 4
    # per-record gzip members concatenated — the Common Crawl layout
    members = b"".join(
        gzip.compress(build_wet_record(f"https://example.com/m{i}", f"t{i}"))
        for i in range(6))
    (tmp_path / "multi.wet.gz").write_bytes(members)
    df = read_wet(str(tmp_path / "multi.wet.gz")).to_pandas()
    assert sorted(df["url"]) == [f"https://example.com/m{i}" for i in range(6)]


def test_wet_many_files_and_batching(ray_session, tmp_path):
    for j in range(3):
        (tmp_path / f"part{j}.wet").write_bytes(_wet_bytes(4))
    ds = read_wet(str(tmp_path), batch_rows=2)
    assert ds.count() == 12
    assert set(ds.schema().names) >= {"url", "warc_ts", "text"}


def test_warc_responses(ray_session, tmp_path):
    p = tmp_path / "a.warc"
    p.write_bytes(_warc_bytes(3))
    df = read_warc(str(p)).to_pandas().sort_values("url").reset_index(drop=True)
    # request + warcinfo records excluded, all 3 responses kept
    assert len(df) == 3
    assert df["html"][0] == b"<html><body>page 0</body></html>"
    assert list(df["http_status"]) == [200, 404, 200]
    assert df["content_type"][0].startswith("text/html")


def test_skip_policy_resyncs_and_marks(ray_session, tmp_path):
    good1 = build_wet_record("https://example.com/ok1", "first")
    corrupt = b"WARC/1.0\r\nWARC-Type: conversion\r\nNo-Length: x\r\n\r\njunk"
    good2 = build_wet_record("https://example.com/ok2", "second")
    p = tmp_path / "bad.wet"
    p.write_bytes(good1 + corrupt + good2)
    df = read_wet(str(p)).to_pandas()
    assert sorted(df["url"]) == ["https://example.com/ok1",
                                 "https://example.com/ok2"]
    marked = read_wet(str(p), include_failed=True).to_pandas()
    assert len(marked) == 3 and (~marked["parse_ok"]).sum() == 1


def test_truncated_tail_skips_or_raises(ray_session, tmp_path):
    good = build_wet_record("https://example.com/ok", "fine")
    trunc = build_wet_record("https://example.com/cut", "x" * 100)[:-60]
    p = tmp_path / "trunc.wet"
    p.write_bytes(good + trunc)
    assert read_wet(str(p)).to_pandas()["url"].tolist() == \
        ["https://example.com/ok"]
    with pytest.raises(Exception):  # WarcFormatError crosses Ray task boundary
        read_wet(str(p), policy="strict").materialize()


def test_runaway_header_terminates(tmp_path):
    """A header block that never terminates must not loop forever in skip
    mode (resync used to re-find the failed record's own magic at _pos) and
    must raise in strict mode."""
    import io
    import itertools

    from dataprof_ray.sources.warc import _iter_file

    bad = b"WARC/1.0\r\nX: " + b"a" * ((1 << 22) + 100)
    rows = list(itertools.islice(
        _iter_file(io.BytesIO(bad), "mem", "wet", "skip"), 10))
    assert rows == []  # terminated, no infinite parse_ok=False markers
    with pytest.raises(WarcFormatError):
        list(_iter_file(io.BytesIO(bad), "mem", "wet", "strict"))


def test_truncated_header_at_eof(tmp_path):
    """An unterminated header at EOF raises in strict mode (it used to be
    silently swallowed) and terminates cleanly in skip mode."""
    import io
    import itertools

    from dataprof_ray.sources.warc import _iter_file, build_wet_record

    good = build_wet_record("https://example.com/ok", "fine")
    trunc = b"WARC/1.0\r\nWARC-Type: conversion\r\nContent-Le"
    data = good + trunc
    rows = list(itertools.islice(
        _iter_file(io.BytesIO(data), "mem", "wet", "skip"), 10))
    assert [r.get("url") for r in rows] == ["https://example.com/ok"]
    with pytest.raises(WarcFormatError, match="truncated header"):
        list(_iter_file(io.BytesIO(data), "mem", "wet", "strict"))


def test_strict_policy_clean_file_ok(ray_session, tmp_path):
    p = tmp_path / "clean.wet"
    p.write_bytes(_wet_bytes(3))
    assert read_wet(str(p), policy="strict").count() == 3


def test_policy_validation():
    with pytest.raises(ValueError):
        read_wet("/tmp/x.wet", policy="lenient")


def test_warc_corpus_adapter_feeds_quality_filter(ray_session, tmp_path):
    p = tmp_path / "crawl.warc"
    p.write_bytes(_warc_bytes(4))
    ds = warc_corpus(str(p), lang="en")
    df = ds.to_pandas()
    assert set(df.columns) == {"url", "warc_ts", "html", "text", "lang"}
    # the 404 row is dropped, only 200s feed the pipeline
    assert len(df) == 3
    # and the quality-filter extract stage consumes it: html -> text
    from dataprof_ray.pipelines.quality_filter import extract_stage
    out = ds.map_batches(extract_stage, batch_format="pyarrow").to_pandas()
    assert len(out) == 3
    assert all("page" in t for t in out["extracted_text"])
