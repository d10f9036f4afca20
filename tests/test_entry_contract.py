"""Local replica of the driver's correctness gate: every __ray_entry__
query with an oracle must match DuckDB exactly (schema + rows + values)
at sf0.001; rows-only queries must execute and return a frame."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __ray_entry__ as E  # noqa: E402

from entry_parity import compare, oracle_connection, to_pandas  # noqa: E402

SF = "/root/testdata/sf0.001"

_ORACLES = E.oracle_sql()
_QUERIES = E.queries()


@pytest.fixture(scope="module")
def oracle(ray_session):
    con = oracle_connection(SF)
    yield con
    con.close()


def test_all_oracle_keys_have_queries():
    assert set(_ORACLES) <= set(_QUERIES)


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(name, oracle):
    compare(_QUERIES[name](SF), oracle, _ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_query_runs(name, ray_session):
    df = to_pandas(_QUERIES[name](SF))
    assert df is not None
    assert len(df.columns) > 0


def test_entry_smoke(ray_session):
    out = to_pandas(E.entry())
    assert len(out) > 0
    assert {"url", "keep", "scrubbed_text", "quality_score"} <= set(out.columns)
