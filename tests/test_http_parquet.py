"""Remote Parquet over HTTP ranges, against a local range-honoring server
(loopback only — the sandbox has no external network). Mirrors the
reference's mock-server test strategy (async_http.rs:399-531: ranges,
HEAD-less fallback, ignored-Range abort)."""

import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dataprof_ray.sources.http_parquet import (HttpRandomAccessFile,
                                               HttpRangeError,
                                               discover_size,
                                               http_parquet_metadata,
                                               read_parquet_http)

_RANGE = re.compile(r"bytes=(\d+)-(\d+)")


def _make_handler(payload: bytes, head_content_length: bool,
                  honor_range: bool):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_HEAD(self):
            self.send_response(200)
            if head_content_length:
                self.send_header("Content-Length", str(len(payload)))
            self.send_header("Accept-Ranges", "bytes")
            self.end_headers()

        def do_GET(self):
            rng = self.headers.get("Range")
            m = _RANGE.match(rng) if rng and honor_range else None
            if m:
                a, b = int(m.group(1)), min(int(m.group(2)),
                                            len(payload) - 1)
                body = payload[a:b + 1]
                self.send_response(206)
                self.send_header("Content-Range",
                                 f"bytes {a}-{b}/{len(payload)}")
            else:
                body = payload
                self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


@pytest.fixture
def serve():
    servers = []

    def _start(payload: bytes, head_content_length=True, honor_range=True):
        srv = ThreadingHTTPServer(
            ("127.0.0.1", 0),
            _make_handler(payload, head_content_length, honor_range))
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers.append(srv)
        return f"http://127.0.0.1:{srv.server_address[1]}/f.parquet"

    yield _start
    for s in servers:
        s.shutdown()


def _parquet_bytes(n_row_groups: int = 3, rows_per_group: int = 40) -> bytes:
    import io

    t = pa.table({
        "i": pa.array(range(n_row_groups * rows_per_group), pa.int64()),
        "s": [f"v{j}" for j in range(n_row_groups * rows_per_group)],
    })
    buf = io.BytesIO()
    pq.write_table(t, buf, row_group_size=rows_per_group)
    return buf.getvalue()


def test_footer_only_metadata(serve):
    data = _parquet_bytes()
    url = serve(data)
    meta = http_parquet_metadata(url)
    assert meta.num_rows == 120
    assert meta.num_row_groups == 3


def test_read_matches_local(ray_session, serve):
    data = _parquet_bytes()
    url = serve(data)
    got = read_parquet_http(url).to_pandas().sort_values("i") \
        .reset_index(drop=True)
    import io
    want = pq.read_table(io.BytesIO(data)).to_pandas()
    assert got.equals(want)


def test_column_pruning(ray_session, serve):
    url = serve(_parquet_bytes())
    out = read_parquet_http(url, columns=["i"]).to_pandas()
    assert list(out.columns) == ["i"]
    assert len(out) == 120


def test_headless_server_range_probe_fallback(serve):
    data = _parquet_bytes()
    url = serve(data, head_content_length=False)
    assert discover_size(url) == len(data)
    f = HttpRandomAccessFile(url)
    f.seek(-4, 2)
    assert f.read(4) == b"PAR1"


def test_ignored_range_header_aborts(serve):
    data = _parquet_bytes()
    url = serve(data, head_content_length=True, honor_range=False)
    f = HttpRandomAccessFile(url)
    with pytest.raises(HttpRangeError, match="ignored Range"):
        f.seek(0)
        f.read(8)


def test_headless_and_rangeless_fails_loudly(serve):
    url = serve(_parquet_bytes(), head_content_length=False,
                honor_range=False)
    with pytest.raises(HttpRangeError, match="ignored Range"):
        discover_size(url)
