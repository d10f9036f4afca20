"""Partial analysis: fast structure scan without a full profile.

Behavior parity (not a port) with the reference's partial-analysis crate
(/root/reference/crates/dataprof-partial/src/lib.rs:26-120):

- ``infer_schema``    — column names + semantic types from a 1000-row
  sample (Parquet: straight from the footer schema, zero rows read)
- ``quick_row_count`` — exact for Parquet (footer) and small text files;
  windowed byte-rate estimate for large CSV/JSON (multiple offsets, not
  first-N lines, to avoid prefix bias — lib.rs:36-44)
- ``analyze_structure`` — the combined cheap scan: format, row count,
  per-column name/type/sample-null-count

These are driver-side by design: they touch footers and O(sample) bytes,
never the data. The full distributed profile is ``profile_dataset``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

import pyarrow as pa

from dataprof_ray.functions import kernels as K

SCHEMA_SAMPLE_ROWS = 1000
FULL_SCAN_THRESHOLD = 10 * 1024 * 1024  # 10 MB: full-scan vs sampled count
ROW_SAMPLE_WINDOWS = 16
ROW_SAMPLE_LINES_PER_WINDOW = 10_000 // ROW_SAMPLE_WINDOWS


@dataclass
class RowCountEstimate:
    count: int
    exact: bool
    method: str  # parquet_footer | full_scan | windowed_estimate


@dataclass
class ColumnSchema:
    name: str
    data_type: str  # kernels.TYPE_*


@dataclass
class StructureReport:
    format: str
    row_count: RowCountEstimate
    columns: list = field(default_factory=list)  # [ColumnSchema]
    sampled_rows: int = 0
    sample_null_counts: dict = field(default_factory=dict)


def _detect_format(path: str) -> str:
    from dataprof_ray.profiler import detect_format

    return detect_format(path)


def _arrow_type_name(t: pa.DataType) -> str:
    if pa.types.is_boolean(t):
        return K.TYPE_BOOLEAN
    if pa.types.is_integer(t):
        return K.TYPE_INTEGER
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        return K.TYPE_FLOAT
    if pa.types.is_temporal(t):
        return K.TYPE_DATE
    return K.TYPE_STRING


def quick_row_count(path: str) -> RowCountEstimate:
    """Fast row count: Parquet reads only the footer (exact); small text
    files get a full line count (exact); large CSV/JSON sample
    ``ROW_SAMPLE_WINDOWS`` evenly spaced windows, measure bytes/line, and
    divide (estimate; prefix-bias-free per lib.rs:36-44)."""
    fmt = _detect_format(path)
    if fmt == "parquet":
        import pyarrow.parquet as pq

        return RowCountEstimate(pq.ParquetFile(path).metadata.num_rows,
                                True, "parquet_footer")
    size = os.path.getsize(path)
    header_rows = 1 if fmt == "csv" else 0
    if size <= FULL_SCAN_THRESHOLD:
        with open(path, "rb") as f:
            data = f.read()
        n = data.count(b"\n")
        if data and not data.endswith(b"\n"):
            n += 1
        return RowCountEstimate(max(n - header_rows, 0), True, "full_scan")
    # windowed estimate: average line length at several offsets
    line_bytes: list = []
    with open(path, "rb") as f:
        for w in range(ROW_SAMPLE_WINDOWS):
            f.seek(size * w // ROW_SAMPLE_WINDOWS)
            f.readline()  # discard the partial line at the seek point
            for _ in range(ROW_SAMPLE_LINES_PER_WINDOW):
                line = f.readline()
                if not line:
                    break
                line_bytes.append(len(line))
    if not line_bytes:
        return RowCountEstimate(0, True, "full_scan")
    avg = sum(line_bytes) / len(line_bytes)
    est = int(size / avg) - header_rows
    return RowCountEstimate(max(est, 0), False, "windowed_estimate")


def _sample_table(path: str, fmt: str, sample_rows: int) -> pa.Table:
    if fmt == "parquet":
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(path)
        batches = pf.iter_batches(batch_size=sample_rows)
        try:
            return pa.Table.from_batches([next(batches)])
        except StopIteration:
            return pf.schema_arrow.empty_table()
    if fmt == "csv":
        import pyarrow.csv as pacsv

        # incremental reader: only the first batch(es) are pulled — a
        # plain read_csv would eagerly parse the WHOLE file, breaking the
        # module's O(sample)-bytes contract on a 50 GB input
        batches = []
        rows = 0
        with pacsv.open_csv(
                path, read_options=pacsv.ReadOptions(block_size=1 << 20)) as r:
            for batch in r:
                batches.append(batch)
                rows += batch.num_rows
                if rows >= sample_rows:
                    break
        if not batches:
            return pa.table({})
        return pa.Table.from_batches(batches).slice(0, sample_rows)
    import io

    import pyarrow.json as pajson

    # bounded byte prefix, cut at the last complete line (pyarrow.json has
    # no incremental reader)
    budget = max(1 << 20, sample_rows * 4096)
    with open(path, "rb") as f:
        prefix = f.read(budget)
    if len(prefix) == budget:
        cut = prefix.rfind(b"\n")
        if cut > 0:
            prefix = prefix[: cut + 1]
    t = pajson.read_json(io.BytesIO(prefix))
    return t.slice(0, sample_rows)


def infer_schema(path: str, sample_rows: int = SCHEMA_SAMPLE_ROWS) -> list:
    """Column names + semantic types. Parquet: mapped from the footer
    schema (zero rows read). CSV/JSON: first ``sample_rows`` rows are
    string-rendered through the SAME threshold inference the profiler uses
    (kernels.infer_type, inference.rs:33-96), so a numeric-looking CSV
    column infers Integer/Float even though the file stores text."""
    fmt = _detect_format(path)
    if fmt == "parquet":
        import pyarrow.parquet as pq

        schema = pq.ParquetFile(path).schema_arrow
        return [ColumnSchema(f.name, _arrow_type_name(f.type)) for f in schema]
    table = _sample_table(path, fmt, sample_rows)
    out = []
    for name in table.schema.names:
        col = table.column(name)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            vals = [v for v in col.to_pylist() if v is not None]
            out.append(ColumnSchema(name, K.infer_type(vals)))
        else:
            out.append(ColumnSchema(name, _arrow_type_name(col.type)))
    return out


def analyze_structure(path: str, sample_rows: int = SCHEMA_SAMPLE_ROWS) -> StructureReport:
    """The combined cheap scan (lib.rs ``analyze_structure``): format +
    quick row count + per-column schema + null counts within the sample."""
    fmt = _detect_format(path)
    count = quick_row_count(path)
    table = _sample_table(path, fmt, sample_rows)
    columns = []
    nulls = {}
    for name in table.schema.names:
        col = table.column(name)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            vals = [v for v in col.to_pylist() if v is not None]
            columns.append(ColumnSchema(name, K.infer_type(vals)))
            nulls[name] = col.null_count + sum(
                1 for v in col.to_pylist()
                if v is not None and K.is_null_like_token(v))
        else:
            columns.append(ColumnSchema(name, _arrow_type_name(col.type)))
            nulls[name] = col.null_count
    return StructureReport(
        format=fmt,
        row_count=count,
        columns=columns,
        sampled_rows=table.num_rows,
        sample_null_counts=nulls,
    )
