"""WARC / WET web-archive readers — the Common-Crawl-style ingestion path.

A web-scale text pipeline rarely starts from parquet: the crawl lands as
WARC segments (``*.warc.gz``, HTTP response records with raw HTML payloads)
or their WET conversions (``*.wet.gz``, extracted plain text). This module
reads both container formats straight into a ``ray.data.Dataset`` whose
rows slot into the corpus schema the quality-filter pipeline consumes
(``url, warc_ts, html | text``) — see ``pipelines/quality_filter.py``.

Design for scale
----------------
* One read task per archive file (WARC is not splittable mid-stream —
  records are length-prefixed with no sync markers — and crawl segments
  are sized ~1 GB for exactly this reason). Parallelism comes from the
  file count, which at crawl scale is tens of thousands per dump.
* Streaming: records are parsed incrementally off the (decompressed)
  byte stream and emitted as Arrow batches of ``batch_rows`` records, so
  a 1 GB member never materializes as one Python blob. Ray's
  ``FileBasedDatasource`` handles gzip transparently (Arrow codec
  detection on the ``.gz`` suffix).
* Malformed input follows the same Skip/Strict policy as
  ``read_jsonl`` (readers.py): ``policy="skip"`` re-syncs on the next
  ``WARC/`` magic and keeps going (each record additionally carries
  ``parse_ok`` so downstream can count drops); ``policy="strict"``
  raises with the file path and byte offset.

Record grammar (ISO 28500): ``WARC/1.X CRLF`` + header lines + CRLF +
``Content-Length`` payload bytes + CRLF CRLF. WET text lives in
``conversion`` records; crawl HTML lives in ``response`` records whose
payload is an HTTP/1.1 message (status line + headers + body).
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Iterator, Optional

import pyarrow as pa

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"
_MAGIC = b"WARC/"

WET_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("ms")),
    ("record_id", pa.string()),
    ("text", pa.string()),
    ("content_length", pa.int64()),
    ("parse_ok", pa.bool_()),
])

WARC_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("ms")),
    ("record_id", pa.string()),
    ("http_status", pa.int32()),
    ("content_type", pa.string()),
    ("html", pa.binary()),
    ("content_length", pa.int64()),
    ("parse_ok", pa.bool_()),
])


class WarcFormatError(ValueError):
    """Raised in strict mode on a malformed record."""


class _StreamParser:
    """Incremental WARC record parser over a read()-able binary stream."""

    _CHUNK = 1 << 20  # 1 MiB refills

    def __init__(self, f, path: str):
        self._f = f
        self._path = path
        self._buf = bytearray()
        self._pos = 0          # consumed offset within _buf
        self._abs = 0          # absolute offset of _buf[0] in the stream
        self._eof = False

    def _offset(self) -> int:
        return self._abs + self._pos

    def _fill(self) -> bool:
        chunk = self._f.read(self._CHUNK)
        if not chunk:
            self._eof = True
            return False
        self._buf += chunk
        return True

    def _compact(self) -> None:
        if self._pos > self._CHUNK:
            del self._buf[:self._pos]
            self._abs += self._pos
            self._pos = 0

    def _read_until(self, delim: bytes, limit: int = 1 << 22) -> Optional[bytes]:
        """Bytes up to and including delim, or None at clean EOF before any
        data. Raises WarcFormatError past `limit` (runaway header guard)."""
        while True:
            idx = self._buf.find(delim, self._pos)
            if idx >= 0:
                end = idx + len(delim)
                out = bytes(self._buf[self._pos:end])
                self._pos = end
                self._compact()
                return out
            if len(self._buf) - self._pos > limit:
                # Consume one byte before raising so a skip-mode resync()
                # cannot re-find the failed record's own magic at _pos and
                # loop forever on the same record.
                off = self._offset()
                self._pos += 1
                raise WarcFormatError(
                    f"{self._path}: no {delim!r} within {limit} bytes "
                    f"at offset {off}")
            if not self._fill():
                return None

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) - self._pos < n:
            if not self._fill():
                raise WarcFormatError(
                    f"{self._path}: truncated record at offset "
                    f"{self._offset()} (wanted {n} payload bytes)")
        out = bytes(self._buf[self._pos:self._pos + n])
        self._pos += n
        self._compact()
        return out

    def _skip_blank(self) -> None:
        while True:
            while self._pos < len(self._buf) and \
                    self._buf[self._pos:self._pos + 1] in (b"\r", b"\n"):
                self._pos += 1
            if self._pos < len(self._buf) or not self._fill():
                self._compact()
                return

    def resync(self) -> bool:
        """Skip forward to the next 'WARC/' magic. True if found."""
        while True:
            idx = self._buf.find(_MAGIC, self._pos)
            if idx >= 0:
                self._pos = idx
                self._compact()
                return True
            # keep a magic-length tail so a boundary-straddling match survives
            keep = max(len(self._buf) - len(_MAGIC) + 1, self._pos)
            self._pos = keep
            self._compact()
            if not self._fill():
                return False

    def records(self) -> Iterator[tuple[dict, bytes]]:
        """Yield (headers, payload) per record. Malformed data raises
        WarcFormatError; the caller decides skip/strict."""
        while True:
            self._skip_blank()
            head = self._read_until(_HDR_END)
            if head is None:
                if self._pos < len(self._buf):
                    # EOF with an unterminated header: consume the tail so
                    # skip-mode resync() terminates, and surface the error.
                    off = self._offset()
                    self._pos = len(self._buf)
                    raise WarcFormatError(
                        f"{self._path}: truncated header at EOF "
                        f"(offset {off})")
                return
            if not head.startswith(_MAGIC):
                raise WarcFormatError(
                    f"{self._path}: expected WARC/ magic at offset "
                    f"{self._offset() - len(head)}")
            headers: dict = {}
            for line in head.split(_CRLF):
                if b":" in line:
                    k, v = line.split(b":", 1)
                    headers[k.strip().decode("ascii", "replace").lower()] = \
                        v.strip().decode("utf-8", "replace")
            try:
                length = int(headers["content-length"])
                if length < 0:
                    raise ValueError
            except (KeyError, ValueError):
                raise WarcFormatError(
                    f"{self._path}: missing/invalid Content-Length at "
                    f"offset {self._offset()}") from None
            payload = self._read_exact(length)
            yield headers, payload


def _parse_ts(value: Optional[str]):
    """WARC-Date (ISO 8601, UTC) -> epoch ms, or None."""
    if not value:
        return None
    try:
        dt = datetime.fromisoformat(value.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1000)
    except ValueError:
        return None


def _split_http(payload: bytes) -> tuple[Optional[int], Optional[str], bytes]:
    """HTTP/1.1 message -> (status, content-type, body)."""
    sep = payload.find(_HDR_END)
    if sep < 0 or not payload.startswith(b"HTTP/"):
        return None, None, payload
    head, body = payload[:sep], payload[sep + len(_HDR_END):]
    lines = head.split(_CRLF)
    status = None
    parts = lines[0].split(b" ", 2)
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    ctype = None
    for line in lines[1:]:
        if line[:13].lower() == b"content-type:":
            ctype = line[13:].strip().decode("utf-8", "replace")
            break
    return status, ctype, body


def _iter_file(f, path: str, mode: str, policy: str) -> Iterator[dict]:
    """Rows for one archive file. mode: 'wet' | 'warc'."""
    parser = _StreamParser(f, path)
    rec_iter = parser.records()
    while True:
        try:
            item = next(rec_iter, None)
        except WarcFormatError:
            if policy == "strict":
                raise
            if not parser.resync():
                return
            rec_iter = parser.records()
            yield {"parse_ok": False}
            continue
        if item is None:
            return
        headers, payload = item
        rtype = headers.get("warc-type", "")
        base = {
            "url": headers.get("warc-target-uri"),
            "warc_ts": _parse_ts(headers.get("warc-date")),
            "record_id": headers.get("warc-record-id"),
            "content_length": len(payload),
            "parse_ok": True,
        }
        if mode == "wet":
            if rtype != "conversion":
                continue  # warcinfo / metadata records carry no text
            base["text"] = payload.decode("utf-8", "replace")
            yield base
        else:
            if rtype != "response":
                continue
            status, ctype, body = _split_http(payload)
            base.update(http_status=status, content_type=ctype, html=body)
            yield base


def _rows_to_table(rows: list[dict], schema: pa.Schema) -> pa.Table:
    cols = {
        name: pa.array([r.get(name) for r in rows], schema.field(name).type)
        for name in schema.names
    }
    return pa.table(cols, schema=schema)


def _make_datasource(paths, mode: str, policy: str, batch_rows: int,
                     file_extensions, **source_args):
    from ray.data.datasource import FileBasedDatasource

    schema = WET_SCHEMA if mode == "wet" else WARC_SCHEMA

    class _WarcDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = file_extensions

        def _read_stream(self, f, path: str):
            rows: list[dict] = []
            for row in _iter_file(f, path, mode, policy):
                rows.append(row)
                if len(rows) >= batch_rows:
                    yield _rows_to_table(rows, schema)
                    rows = []
            if rows:
                yield _rows_to_table(rows, schema)

    return _WarcDatasource(paths, file_extensions=file_extensions,
                           **source_args)


def read_wet(paths, *, policy: str = "skip", batch_rows: int = 1024,
             include_failed: bool = False, **source_args):
    """WET (extracted-text) archives -> Dataset[url, warc_ts, record_id,
    text, content_length, parse_ok].

    ``policy="skip"`` re-syncs past corrupt records (dropped records leave
    a ``parse_ok=false`` marker row when ``include_failed=True``, else are
    filtered); ``"strict"`` raises ``WarcFormatError``. One read task per
    file — parallelism is the file count (WARC is not splittable)."""
    import ray

    if policy not in ("skip", "strict"):
        raise ValueError(f"policy must be 'skip' or 'strict', got {policy!r}")
    ds = ray.data.read_datasource(_make_datasource(
        paths, "wet", policy, batch_rows,
        ["wet", "wet.gz", "warc.wet", "warc.wet.gz"], **source_args))
    if not include_failed:
        ds = ds.filter(expr="parse_ok == True")
    return ds


def read_warc(paths, *, policy: str = "skip", batch_rows: int = 256,
              include_failed: bool = False, **source_args):
    """Raw crawl WARC (HTTP response records) -> Dataset[url, warc_ts,
    record_id, http_status, content_type, html, content_length, parse_ok].

    HTML payloads are wide — the default ``batch_rows`` is small so a
    batch stays object-store friendly. Same policy semantics as
    :func:`read_wet`."""
    import ray

    if policy not in ("skip", "strict"):
        raise ValueError(f"policy must be 'skip' or 'strict', got {policy!r}")
    ds = ray.data.read_datasource(_make_datasource(
        paths, "warc", policy, batch_rows,
        ["warc", "warc.gz"], **source_args))
    if not include_failed:
        ds = ds.filter(expr="parse_ok == True")
    return ds


def warc_corpus(paths, *, lang: Optional[str] = None, **read_args):
    """Adapt raw WARC responses to the quality-filter corpus schema
    (``url, warc_ts, html, text, lang`` — quality_filter.py reads exactly
    these columns): keeps 200-status HTML rows; ``text`` starts null and
    is filled by the pipeline's extract stage."""
    ds = read_warc(paths, **read_args)

    def adapt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.fill_null(pc.equal(batch.column("http_status"), 200), False)
        batch = batch.filter(keep)
        n = batch.num_rows
        return pa.table({
            "url": batch.column("url"),
            "warc_ts": batch.column("warc_ts"),
            "html": batch.column("html"),
            "text": pa.nulls(n, pa.string()),
            "lang": pa.array([lang] * n, pa.string()),
        })

    return ds.map_batches(adapt, batch_format="pyarrow")


# ---------------------------------------------------------------- builders
# Deterministic record builders — the write half of the roundtrip tests and
# a convenience for exporting small corpora back to archive form.

def build_record(warc_type: str, payload: bytes, *, url: Optional[str] = None,
                 date: str = "2024-01-01T00:00:00Z",
                 record_id: str = "<urn:uuid:00000000-0000-0000-0000-000000000000>",
                 extra_headers: Optional[dict] = None) -> bytes:
    head = [f"WARC/1.0", f"WARC-Type: {warc_type}", f"WARC-Date: {date}",
            f"WARC-Record-ID: {record_id}",
            f"Content-Length: {len(payload)}"]
    if url:
        head.insert(2, f"WARC-Target-URI: {url}")
    for k, v in (extra_headers or {}).items():
        head.append(f"{k}: {v}")
    return ("\r\n".join(head) + "\r\n\r\n").encode() + payload + b"\r\n\r\n"


def build_wet_record(url: str, text: str, **kw) -> bytes:
    return build_record("conversion", text.encode(), url=url, **kw)


def build_warc_response(url: str, html: bytes, *, status: int = 200,
                        content_type: str = "text/html", **kw) -> bytes:
    http = (f"HTTP/1.1 {status} OK\r\nContent-Type: {content_type}\r\n"
            f"Content-Length: {len(html)}\r\n\r\n").encode() + html
    return build_record("response", http, url=url, **kw)
