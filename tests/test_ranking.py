"""Distributed global rank / NTILE / percent_rank (pipelines/ranking.py).

Parity is pinned against DuckDB's ROW_NUMBER / NTILE / percent_rank over
the identical window, including bit-exact percent_rank doubles, with the
multi-split path forced (splits >> 1 on small data) and the degenerate
shapes (hot-value ties, all-equal column, empty input) exercised."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from dataprof_ray.pipelines.ranking import _ntile_of, global_rank


def _ref_ntile(total: int, n: int) -> list[int]:
    # ANSI NTILE by construction: deal rows into n buckets, first
    # total % n buckets one row larger
    q, rem = divmod(total, n)
    out = []
    for b in range(1, n + 1):
        out.extend([b] * (q + 1 if b <= rem else q))
    return out


class TestNtileFormula:
    def test_exhaustive_small(self):
        for total in range(1, 40):
            for n in range(1, 12):
                got = _ntile_of(np.arange(total), total, n)
                assert got.tolist() == _ref_ntile(total, n), (total, n)


def _duck_window(df: pd.DataFrame, order: str, n_tile: int) -> pd.DataFrame:
    # dense_rank / cume_dist windows order by the VALUE alone (peer
    # groups); row_number / ntile / percent_rank use the full unique order
    vorder = order.split(",")[0]
    return duckdb.sql(
        f"SELECT id, v, ROW_NUMBER() OVER w AS rnk, "
        f"NTILE({n_tile}) OVER w AS tile, percent_rank() OVER w AS pct, "
        f"DENSE_RANK() OVER w2 AS drnk, CUME_DIST() OVER w2 AS cume "
        f"FROM df WINDOW w AS (ORDER BY {order}), "
        f"w2 AS (ORDER BY {vorder}) ORDER BY id").df()


class TestGlobalRank:
    def _run(self, df, descending, splits, n_tile=7):
        out = global_rank(
            rd.from_pandas(df).repartition(6), by="v", tiebreak=["id"],
            descending=descending, splits=splits, ntile=n_tile,
            percent_col="pct", dense_col="drnk", cume_col="cume")
        got = (out.to_pandas().sort_values("id").reset_index(drop=True)
               [["id", "v", "rnk", "tile", "pct", "drnk", "cume"]])
        order = "v DESC, id" if descending else "v, id"
        want = _duck_window(df, order, n_tile)
        assert list(got["rnk"]) == list(want["rnk"])
        assert list(got["tile"]) == list(want["tile"])
        assert list(got["drnk"]) == list(want["drnk"])
        # percent_rank / cume_dist are integer-ratio doubles on both
        # sides: bit-exact
        assert (got["pct"].to_numpy() == want["pct"].to_numpy()).all()
        assert (got["cume"].to_numpy() == want["cume"].to_numpy()).all()

    def test_matches_duckdb_descending(self, ray_session):
        rng = np.random.default_rng(11)
        n = 5000
        df = pd.DataFrame({
            "id": np.arange(n, dtype=np.int64),
            # coarse grid -> plenty of cross-block ties
            "v": np.round(rng.uniform(0, 100, n), 1),
        })
        self._run(df, descending=True, splits=16)

    def test_matches_duckdb_ascending_int(self, ray_session):
        rng = np.random.default_rng(12)
        n = 3000
        df = pd.DataFrame({
            "id": np.arange(n, dtype=np.int64),
            "v": rng.integers(-50, 50, n).astype(np.int64),
        })
        self._run(df, descending=False, splits=8, n_tile=4)

    def test_hot_value_ties(self, ray_session):
        # 60% of rows share one value: all of them must land in one
        # split and still rank correctly by the tiebreak
        rng = np.random.default_rng(13)
        n = 2000
        v = rng.uniform(0, 10, n)
        v[: int(n * 0.6)] = 5.0
        df = pd.DataFrame({"id": np.arange(n, dtype=np.int64), "v": v})
        self._run(df, descending=True, splits=16)

    def test_all_equal_column(self, ray_session):
        df = pd.DataFrame({"id": np.arange(100, dtype=np.int64),
                           "v": np.full(100, 3.5)})
        self._run(df, descending=False, splits=8, n_tile=3)

    def test_empty_input_typed(self, ray_session):
        df = pd.DataFrame({"id": pd.Series([], dtype=np.int64),
                           "v": pd.Series([], dtype=np.float64)})
        out = global_rank(rd.from_pandas(df), by="v", tiebreak=["id"],
                          ntile=4, percent_col="pct")
        mat = out.materialize()
        assert mat.count() == 0
        schema = mat.schema().base_schema
        assert schema.field("rnk").type == pa.int64()
        assert schema.field("tile").type == pa.int64()
        assert schema.field("pct").type == pa.float64()

    def test_null_order_value_raises(self, ray_session):
        df = pd.DataFrame({"id": [1, 2], "v": [1.0, None]})
        with pytest.raises(Exception, match="nulls"):
            global_rank(rd.from_pandas(df), by="v",
                        tiebreak=["id"]).materialize()

    def test_requires_tiebreak(self, ray_session):
        df = pd.DataFrame({"id": [1], "v": [1.0]})
        with pytest.raises(ValueError, match="tiebreak"):
            global_rank(rd.from_pandas(df), by="v", tiebreak=[])
