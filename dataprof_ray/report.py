"""Report sinks: markdown / dataframe / LLM-context / compare.

Behavior parity (not a port) with the reference's Python report surface:
/root/reference/python/dataprof/__init__.py:1869-2357 (`to_markdown`:2122,
`to_llm_context`:2162, `compare`:2277, `describe`/`quality_summary` nearby).
JSON save/load with the schema-version gate lives on
``schema.ProfileReport.save/load``.

These are driver-side functions over the (small) assembled report — corpus-
sized outputs go through ``ds.write_parquet``, never through here.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd

from dataprof_ray.schema import (
    BooleanStats,
    ColumnProfile,
    DateTimeStats,
    NumericStats,
    ProfileReport,
    TextStats,
)

# Pattern categories whose matched values are PII-like; to_llm_context
# redacts rather than quotes them (reference __init__.py:773-791).
_REDACT_CATEGORIES = {"Contact", "Identifier", "Financial"}


def _fmt(v, nd: int = 4) -> str:
    if v is None:
        return "-"
    if isinstance(v, float):
        return f"{v:.{nd}g}"
    return str(v)


def describe(report: ProfileReport) -> pd.DataFrame:
    """One row per column: type, counts, null %, key stats."""
    rows = []
    for p in report.column_profiles:
        row = {
            "column": p.name,
            "data_type": p.data_type,
            "total_count": p.total_count,
            "null_count": p.null_count,
            "null_pct": round(p.null_percentage, 2),
            "unique_count": p.unique_count,
            "invalid_count": p.invalid_count,
        }
        s = p.stats
        if isinstance(s, NumericStats):
            row.update(min=s.min, max=s.max, mean=s.mean, std_dev=s.std_dev)
        elif isinstance(s, TextStats):
            row.update(min_len=s.min_length, max_len=s.max_length,
                       avg_len=round(s.avg_length, 2))
        elif isinstance(s, DateTimeStats):
            row.update(min_dt=s.min_datetime, max_dt=s.max_datetime,
                       duration_days=s.duration_days)
        elif isinstance(s, BooleanStats):
            row.update(true_count=s.true_count, false_count=s.false_count,
                       true_ratio=round(s.true_ratio, 4))
        rows.append(row)
    return pd.DataFrame(rows)


def quality_summary(report: ProfileReport) -> dict:
    """Dimension scores + overall, None for unassessed dimensions."""
    if report.quality is None:
        return {"overall_score": None, "dimensions": {}, "confidence": report.metric_confidence}
    q = report.quality
    return {
        "overall_score": q.overall_score(),
        "dimensions": q.dimension_scores(),
        "confidence": report.metric_confidence,
        "low_sample_warning": q.low_sample_warning,
    }


def to_markdown(report: ProfileReport) -> str:
    """Human-readable report (reference `to_markdown`, __init__.py:2122)."""
    lines = [
        f"# Profile report `{report.id[:8]}`",
        "",
        f"- source: `{report.data_source or 'in-memory'}`",
        f"- rows: {report.rows} | columns: {len(report.column_profiles)}",
        f"- engine: {report.execution.engine} | scan: {report.execution.scan_time_ms:.0f} ms"
        f" | throughput: {report.execution.throughput_rows_sec:.0f} rows/s",
        f"- confidence: {report.metric_confidence}",
        "",
        "## Columns",
        "",
        "| column | type | nulls | null % | unique | stats |",
        "|---|---|---|---|---|---|",
    ]
    for p in report.column_profiles:
        s = p.stats
        if isinstance(s, NumericStats):
            stat = (f"min {_fmt(s.min)} / max {_fmt(s.max)} / mean {_fmt(s.mean)}"
                    f" / sd {_fmt(s.std_dev)}")
        elif isinstance(s, TextStats):
            stat = f"len {s.min_length}-{s.max_length} (avg {_fmt(s.avg_length, 3)})"
        elif isinstance(s, DateTimeStats):
            stat = f"{s.min_datetime} .. {s.max_datetime} ({_fmt(s.duration_days, 3)} d)"
        elif isinstance(s, BooleanStats):
            stat = f"true {s.true_count} / false {s.false_count}"
        else:
            stat = "-"
        approx = "~" if p.unique_count_is_approximate else ""
        lines.append(
            f"| {p.name} | {p.data_type} | {p.null_count} "
            f"| {p.null_percentage:.1f}% | {approx}{_fmt(p.unique_count)} | {stat} |"
        )
    qs = quality_summary(report)
    if qs["overall_score"] is not None:
        lines += ["", "## Quality", "",
                  f"overall score: **{qs['overall_score']:.2f}** ({qs['confidence']})", ""]
        for dim, score in qs["dimensions"].items():
            if score is not None:
                lines.append(f"- {dim}: {score:.2f}")
    pat_lines = []
    for p in report.column_profiles:
        for pat in (p.patterns or []):
            pat_lines.append(
                f"- `{p.name}`: {pat.name} ({pat.category}) x{pat.match_count}"
                f" @ {pat.confidence:.2f}"
            )
    if pat_lines:
        lines += ["", "## Patterns", ""] + pat_lines
    return "\n".join(lines) + "\n"


def to_html(report: ProfileReport) -> str:
    """Embeddable HTML fragment of the report (reference `to_html`,
    __init__.py:2113 — the `_repr_html_` surface): header summary line,
    per-column table, quality dimensions, detected patterns. Values are
    HTML-escaped; the fragment carries no <html>/<head> wrapper so it can
    be dropped into CI summaries or notebooks."""
    import html as _html

    def esc(v) -> str:
        return _html.escape(_fmt(v))

    score = report.quality_score()
    qs_str = f"{score:.1f}" if score is not None else "N/A"
    parts = [
        '<div class="dataprof-report">',
        f"<p><b>Source:</b> {esc(report.data_source or 'in-memory')} | "
        f"<b>Rows:</b> {report.rows:,} | "
        f"<b>Columns:</b> {len(report.column_profiles)} | "
        f"<b>Quality:</b> {qs_str} | "
        f"<b>Confidence:</b> {esc(report.metric_confidence)}</p>",
        "<table>",
        "<thead><tr><th>Column</th><th>Type</th><th>Nulls</th>"
        "<th>Null %</th><th>Unique</th><th>Stats</th></tr></thead>",
        "<tbody>",
    ]
    for p in report.column_profiles:
        s = p.stats
        if isinstance(s, NumericStats):
            stat = (f"min {_fmt(s.min)} / max {_fmt(s.max)} / mean {_fmt(s.mean)}"
                    f" / sd {_fmt(s.std_dev)}")
        elif isinstance(s, TextStats):
            stat = f"len {s.min_length}-{s.max_length} (avg {_fmt(s.avg_length, 3)})"
        elif isinstance(s, DateTimeStats):
            stat = f"{s.min_datetime} .. {s.max_datetime} ({_fmt(s.duration_days, 3)} d)"
        elif isinstance(s, BooleanStats):
            stat = f"true {s.true_count} / false {s.false_count}"
        else:
            stat = "-"
        approx = "~" if p.unique_count_is_approximate else ""
        parts.append(
            f"<tr><td>{esc(p.name)}</td><td>{esc(p.data_type)}</td>"
            f"<td>{p.null_count}</td><td>{p.null_percentage:.1f}%</td>"
            f"<td>{approx}{esc(p.unique_count)}</td><td>{esc(stat)}</td></tr>"
        )
    parts += ["</tbody>", "</table>"]
    qs = quality_summary(report)
    if qs["overall_score"] is not None:
        parts.append(f"<p><b>Quality score:</b> {qs['overall_score']:.2f} "
                     f"({esc(qs['confidence'])})</p>")
        dims = [f"{esc(d)}: {v:.2f}" for d, v in qs["dimensions"].items()
                if v is not None]
        if dims:
            parts.append("<ul>" + "".join(f"<li>{d}</li>" for d in dims) + "</ul>")
    pat_items = []
    for p in report.column_profiles:
        for pat in (p.patterns or []):
            pat_items.append(
                f"<li><code>{esc(p.name)}</code>: {esc(pat.name)} "
                f"({esc(pat.category)}) x{pat.match_count} @ {pat.confidence:.2f}</li>"
            )
    if pat_items:
        parts.append("<p><b>Patterns</b></p><ul>" + "".join(pat_items) + "</ul>")
    parts.append("</div>")
    return "\n".join(parts)


def to_llm_context(report: ProfileReport, max_tokens: int = 1000) -> str:
    """Token-bounded plain-text context for an LLM (~4 chars/token budget),
    PII-redacting: pattern NAMES are disclosed, matched VALUES never are;
    columns whose dominant pattern is a PII category are marked redacted
    (reference `to_llm_context`, __init__.py:2162, redaction 773-791)."""
    budget = max(max_tokens, 50) * 4
    parts = [
        f"Table: {report.rows} rows, {len(report.column_profiles)} columns.",
    ]
    qs = quality_summary(report)
    if qs["overall_score"] is not None:
        parts.append(f"Quality score {qs['overall_score']:.1f}/100 ({qs['confidence']}).")
    shown = 0
    for p in report.column_profiles:
        desc = f"{p.name}: {p.data_type}, {p.null_percentage:.0f}% null"
        if p.unique_count is not None:
            desc += f", {p.unique_count} distinct"
        pii = [pat for pat in (p.patterns or []) if pat.category in _REDACT_CATEGORIES]
        if pii:
            desc += f" [REDACTED: matches {', '.join(sorted({x.name for x in pii}))}]"
        elif isinstance(p.stats, NumericStats):
            desc += f", range [{_fmt(p.stats.min)}, {_fmt(p.stats.max)}]"
        elif isinstance(p.stats, DateTimeStats):
            desc += f", {p.stats.min_datetime}..{p.stats.max_datetime}"
        candidate = "\n".join(parts + [desc])
        if len(candidate) > budget:
            parts.append(f"(+{len(report.column_profiles) - shown} more columns)")
            break
        parts.append(desc)
        shown += 1
    out = "\n".join(parts)
    return out[:budget]


def compare(a: ProfileReport, b: ProfileReport) -> dict:
    """Structural + metric diff of two reports (reference `compare`,
    __init__.py:2277): added/removed columns, per-column deltas on
    null/unique counts and type changes, quality-score delta."""
    cols_a = {p.name: p for p in a.column_profiles}
    cols_b = {p.name: p for p in b.column_profiles}
    added = sorted(set(cols_b) - set(cols_a))
    removed = sorted(set(cols_a) - set(cols_b))
    changed = {}
    for name in sorted(set(cols_a) & set(cols_b)):
        pa_, pb_ = cols_a[name], cols_b[name]
        delta = {}
        if pa_.data_type != pb_.data_type:
            delta["data_type"] = (pa_.data_type, pb_.data_type)
        if pa_.null_count != pb_.null_count:
            delta["null_count"] = (pa_.null_count, pb_.null_count)
        if pa_.unique_count != pb_.unique_count:
            delta["unique_count"] = (pa_.unique_count, pb_.unique_count)
        if delta:
            changed[name] = delta
    score_a = a.quality_score()
    score_b = b.quality_score()
    return {
        "rows": (a.rows, b.rows),
        "added_columns": added,
        "removed_columns": removed,
        "changed_columns": changed,
        "quality_score": (score_a, score_b),
        "quality_score_delta": (
            None if score_a is None or score_b is None else round(score_b - score_a, 2)
        ),
    }
