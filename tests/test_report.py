"""Report sinks: markdown / describe / llm-context / compare / save-load."""

import numpy as np
import pyarrow as pa
import pytest

from dataprof_ray import report as R
from dataprof_ray.pipelines.profile import profile_table
from dataprof_ray.schema import ProfileReport


@pytest.fixture(scope="module")
def sample_report():
    table = pa.table({
        "id": pa.array(range(100), pa.int64()),
        "amount": pa.array(np.linspace(0, 99, 100)),
        "email": pa.array([f"user{i}@example.com" for i in range(100)]),
        "flag": pa.array([i % 2 == 0 for i in range(100)]),
        "note": pa.array((["ok", "fine", None, "null"] * 25)),
    })
    return profile_table(table)


def test_describe_shape(sample_report):
    df = R.describe(sample_report)
    assert list(df["column"]) == ["id", "amount", "email", "flag", "note"]
    assert df.set_index("column").loc["note", "null_count"] == 50  # None + "null" tokens


def test_to_markdown(sample_report):
    md = R.to_markdown(sample_report)
    assert "| id |" in md and "## Columns" in md
    assert "## Quality" in md
    assert "Email" in md  # pattern section mentions detected email pattern


def test_to_html(sample_report):
    html = R.to_html(sample_report)
    assert html.startswith('<div class="dataprof-report">') and html.endswith("</div>")
    assert "<td>id</td>" in html
    assert "<b>Quality score:</b>" in html
    assert "Email" in html  # pattern section mentions detected email pattern
    assert "<script" not in html


def test_to_html_escapes_values():
    table = pa.table({"a<b": pa.array(["<x>&", "y"])})
    rep = profile_table(table)
    html = R.to_html(rep)
    assert "a&lt;b" in html
    assert "<x>" not in html


def test_llm_context_redacts_and_bounds(sample_report):
    ctx = R.to_llm_context(sample_report, max_tokens=200)
    assert len(ctx) <= 200 * 4
    assert "@example.com" not in ctx  # raw PII values never quoted
    assert "REDACTED" in ctx


def test_compare(sample_report):
    table2 = pa.table({
        "id": pa.array(range(100), pa.int64()),
        "amount": pa.array([None] * 10 + list(np.linspace(0, 89, 90))),
        "extra": pa.array(["x"] * 100),
    })
    other = profile_table(table2)
    diff = R.compare(sample_report, other)
    assert diff["added_columns"] == ["extra"]
    assert set(diff["removed_columns"]) == {"email", "flag", "note"}
    assert "amount" in diff["changed_columns"]
    assert diff["changed_columns"]["amount"]["null_count"] == (0, 10)


def test_save_load_roundtrip(sample_report, tmp_path):
    p = tmp_path / "report.json"
    sample_report.save(str(p))
    loaded = ProfileReport.load(str(p))
    assert loaded.rows == sample_report.rows
    assert loaded.columns == sample_report.columns
    assert loaded["note"].null_count == 50


def test_load_rejects_future_schema(sample_report, tmp_path):
    import json

    p = tmp_path / "future.json"
    d = sample_report.to_dict()
    d["schema_version"] = 999
    p.write_text(json.dumps(d, default=str))
    with pytest.raises(ValueError, match="schema_version"):
        ProfileReport.load(str(p))


def test_quality_roundtrip(sample_report, tmp_path):
    p = tmp_path / "q.json"
    sample_report.save(str(p))
    loaded = ProfileReport.load(str(p))
    assert loaded.quality is not None
    assert loaded.quality_score() == pytest.approx(sample_report.quality_score(), abs=0.01)
    assert loaded.quality.dimension_scores().keys() == \
        sample_report.quality.dimension_scores().keys()


def test_report_methods_delegate(sample_report):
    assert "## Columns" in sample_report.to_markdown()
    assert sample_report.describe().shape[0] == 5
    assert sample_report.quality_summary()["overall_score"] is not None
    assert sample_report.to_arrow().num_rows == 5
    assert sample_report.to_polars().height == 5
