"""Byte-stream profiling: profile CSV/JSONL arriving incrementally.

Behavior parity (not a port) with the reference's async streaming surface
(/root/reference/crates/dataprof/src/profiler.rs:929-1068 ``profile_stream``
/ ``profile_url``; dataprof-engines/src/streaming/async_reader.rs:97): a
byte source is consumed chunk-by-chunk, each record-aligned chunk folds
into the SAME accumulators the distributed profiler uses, and stop
conditions fire per chunk via ``state.stop.StopEvaluator``.

Design note: a single byte stream is inherently sequential, so this path
is DRIVER-side by design — memory is bounded by one chunk plus the
accumulator state (KBs). For data at rest, use the distributed
``profile_dataset``; this surface exists for sockets, pipes, HTTP bodies
and other arrive-once sources. ``profile_url`` accepts any urllib scheme —
``file://`` works offline (the sandbox smoke path), ``https://`` when the
environment has network.
"""

from __future__ import annotations

import io
import json
from typing import Iterable, Optional, Union

import pyarrow as pa

from dataprof_ray.state import accumulators as A
from dataprof_ray.state.stop import StopCondition, StopEvaluator

DEFAULT_CHUNK_BYTES = 1 << 20


def iter_record_chunks(source: Union[Iterable[bytes], "io.RawIOBase"],
                       chunk_bytes: int = DEFAULT_CHUNK_BYTES):
    """Yield newline-aligned byte chunks from a file-like object or an
    iterable of byte blocks. Partial trailing records carry over to the
    next chunk; the final partial record (no trailing newline) is yielded
    at end of stream."""
    if hasattr(source, "read"):
        def blocks():
            while True:
                b = source.read(chunk_bytes)
                if not b:
                    return
                yield b
        it = blocks()
    else:
        it = iter(source)
    carry = b""
    for block in it:
        buf = carry + block
        cut = buf.rfind(b"\n")
        if cut < 0:
            carry = buf
            continue
        yield buf[: cut + 1]
        carry = buf[cut + 1:]
    if carry:
        yield carry


def _parse_csv_chunk(chunk: bytes, header: bytes, delimiter: str) -> pa.Table:
    import pyarrow.csv as pacsv

    return pacsv.read_csv(
        io.BytesIO(header + chunk),
        parse_options=pacsv.ParseOptions(
            delimiter=delimiter, invalid_row_handler=lambda row: "skip"),
    )


def _parse_jsonl_chunk(chunk: bytes, policy: str) -> tuple[pa.Table, int]:
    rows = []
    errors = 0
    for line in chunk.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            obj = json.loads(line)
            if not isinstance(obj, dict):
                raise ValueError("not an object")
            rows.append(obj)
        except Exception:
            if policy == "strict":
                raise ValueError(f"malformed JSON line: {line[:80]!r}")
            errors += 1
    if not rows:
        return pa.table({}), errors
    return pa.Table.from_pylist(rows), errors


def profile_stream(
    source,
    *,
    format: str = "csv",
    delimiter: Optional[str] = None,
    json_error_policy: str = "skip",
    stop_condition: Optional[StopCondition] = None,
    sample_capacity: int = A.DEFAULT_RESERVOIR_CAPACITY,
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
    **assemble_kwargs,
):
    """Profile a byte stream of CSV or JSONL without ever holding more
    than one chunk. Returns a ``ProfileReport``; a fired stop condition is
    recorded as ``execution.truncation_reason`` (truncation-vs-exhaustion
    precision, as in the incremental reference engine)."""
    from dataprof_ray.pipelines.profile import assemble_report
    from dataprof_ray.sources.readers import sniff_delimiter

    if format not in ("csv", "json"):
        raise ValueError(f"profile_stream supports csv/json, not {format!r}")
    coll = A.ColumnCollection(sample_capacity=sample_capacity)
    evaluator = (StopEvaluator(stop_condition)
                 if stop_condition is not None
                 and stop_condition.kind != "never" else None)
    header: Optional[bytes] = None
    truncation = None
    json_errors = 0
    for chunk in iter_record_chunks(source, chunk_bytes):
        if format == "csv":
            if header is None:
                nl = chunk.find(b"\n")
                if nl < 0:
                    header = chunk + b"\n"
                    continue
                header = chunk[: nl + 1]
                chunk = chunk[nl + 1:]
                if delimiter is None:
                    delimiter = sniff_delimiter(header + chunk[:4096])
                if not chunk:
                    continue
            table = _parse_csv_chunk(chunk, header, delimiter)
        else:
            table, errs = _parse_jsonl_chunk(chunk, json_error_policy)
            json_errors += errs
        if table.num_rows == 0:
            continue
        coll.update_table(table)
        if evaluator is not None:
            fired = evaluator.observe(table)
            if fired is not None:
                truncation = fired
                break
    report = assemble_report(coll, data_source={
        "type": "Stream", "format": format,
        **({"json_errors": json_errors} if format == "json" else {}),
    }, **assemble_kwargs)
    if truncation is not None:
        report.execution.truncation_reason = truncation
    return report


def profile_url(url: str, *, format: Optional[str] = None, **kwargs):
    """Fetch a URL and profile its body as a stream. Scheme support is
    urllib's: ``file://`` works offline; ``http(s)://`` needs network
    (async_http.rs's range-request optimization is delegated to Arrow FS
    for parquet — this path is for record streams)."""
    import urllib.request
    from urllib.parse import urlparse

    if format is None:
        path = urlparse(url).path.lower()
        format = "json" if path.endswith((".json", ".jsonl", ".ndjson")) else "csv"
    with urllib.request.urlopen(url) as resp:  # noqa: S310 — caller's URL
        return profile_stream(resp, format=format, **kwargs)
