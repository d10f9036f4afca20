"""Selection-family coverage: budget select, DSIR, cap_per_key, SemDeDup,
distributed PCA."""

import hashlib
import math

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from dataprof_ray.pipelines.selection import (dsir_log_ratios, dsir_select,
                                              dsir_weights, gumbel_from_id,
                                              hash_bucket,
                                              hashed_token_counts,
                                              select_by_budget)


def _ds(table: pa.Table, parts: int = 4):
    import ray.data as rd

    return rd.from_arrow(table).repartition(parts)


def _docs_table(n: int = 300, seed: int = 3) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "Gamma", "delta42", "x", "longword" * 3, "zz!"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 12)))
             for _ in range(n)]
    texts[5] = ""          # empty doc
    texts[6] = "   \t\n "  # whitespace-only doc
    return pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                     "text": pa.array(texts, pa.string())})


# ----------------------------------------------------------- budget select


def _scored_table(n: int = 400, seed: int = 11) -> pa.Table:
    rng = np.random.default_rng(seed)
    scores = rng.choice([0.1, 0.25, 0.25, 0.5, 0.77, 0.9], size=n)  # ties
    weights = rng.integers(0, 40, size=n)  # includes zero-weight rows
    return pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                     "score": pa.array(scores, pa.float64()),
                     "n_tokens": pa.array(weights, pa.int64())})


def _sql_budget(table: pa.Table, budget: float) -> set:
    con = duckdb.connect()
    con.register("t", table)
    rows = con.execute(
        "SELECT doc_id FROM (SELECT doc_id, SUM(n_tokens) OVER ("
        "ORDER BY score DESC, doc_id ROWS UNBOUNDED PRECEDING) AS c FROM t) "
        f"WHERE c <= {budget}").fetchall()
    return {r[0] for r in rows}


@pytest.mark.parametrize("frac", [0.0, 0.3, 0.5, 0.999])
def test_budget_select_matches_sql_window(ray_session, frac):
    t = _scored_table()
    total = float(pa.compute.sum(t.column("n_tokens")).as_py())
    got = select_by_budget(_ds(t), budget=frac * total,
                           id_col="doc_id").to_pandas()
    got_ids = set(got["doc_id"]) if len(got) else set()
    assert got_ids == _sql_budget(t, frac * total)


def test_budget_select_fraction_form(ray_session):
    t = _scored_table()
    total = float(pa.compute.sum(t.column("n_tokens")).as_py())
    got = select_by_budget(_ds(t), budget_fraction=0.4).to_pandas()
    assert set(got["doc_id"]) == _sql_budget(t, 0.4 * total)


def test_budget_select_budget_covers_everything(ray_session):
    t = _scored_table(n=50)
    got = select_by_budget(_ds(t, 2), budget=10 ** 9).to_pandas()
    assert len(got) == 50


def test_budget_select_stable_under_partitioning(ray_session):
    t = _scored_table(n=200, seed=7)
    a = set(select_by_budget(_ds(t, 2), budget=900).to_pandas()["doc_id"])
    b = set(select_by_budget(_ds(t, 9), budget=900).to_pandas()["doc_id"])
    assert a == b


def test_budget_select_rejects_negative_weight(ray_session):
    t = pa.table({"doc_id": [1, 2], "score": [0.5, 0.9],
                  "n_tokens": [3, -1]})
    with pytest.raises(Exception, match="negative weight"):
        select_by_budget(_ds(t, 1), budget=10).to_pandas()


def test_budget_select_param_validation(ray_session):
    t = _scored_table(n=10)
    with pytest.raises(ValueError, match="exactly one"):
        select_by_budget(_ds(t, 1), budget=5, budget_fraction=0.5)
    with pytest.raises(ValueError, match="exactly one"):
        select_by_budget(_ds(t, 1))


# --------------------------------------------------------------------- DSIR


def _py_tokens(text: str) -> list:
    t = (text or "").lower().strip()
    return t.split() if t else []  # \s+ split == str.split for these tests


def test_hashed_token_counts_matches_single_process(ray_session):
    t = _docs_table()
    got = hashed_token_counts(_ds(t), buckets=64)
    want = np.zeros(64, dtype=np.int64)
    for txt in t.column("text").to_pylist():
        for tok in _py_tokens(txt):
            want[int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 64] += 1
    assert (got == want).all()
    assert got.sum() == sum(len(_py_tokens(x))
                            for x in t.column("text").to_pylist())


def test_dsir_weights_match_single_process_oracle(ray_session):
    t = _docs_table(n=200)
    target = t.filter(pa.compute.less(t.column("doc_id"), 40))
    raw_c = hashed_token_counts(_ds(t), buckets=128)
    tgt_c = hashed_token_counts(_ds(target, 2), buckets=128)
    lr = dsir_log_ratios(tgt_c, raw_c)

    got = (dsir_weights(_ds(t), lr).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    # independent single-process oracle: dict counting + math.log
    nb = 128
    tn, rn = int(tgt_c.sum()), int(raw_c.sum())
    ratio = [math.log((int(tgt_c[b]) + 1.0) / (tn + nb))
             - math.log((int(raw_c[b]) + 1.0) / (rn + nb))
             for b in range(nb)]
    for i, txt in enumerate(t.column("text").to_pylist()):
        toks = _py_tokens(txt)
        want = sum(ratio[hash_bucket(tok, nb)] for tok in toks)
        assert got["dsir_weight"][i] == pytest.approx(want, rel=1e-12, abs=1e-12)
        assert got["n_tokens"][i] == len(toks)


def test_dsir_log_ratios_shape_mismatch_raises():
    with pytest.raises(ValueError, match="align"):
        dsir_log_ratios(np.zeros(4), np.zeros(8))


def test_dsir_select_deterministic_and_correct(ray_session):
    t = _docs_table(n=150)
    raw_c = hashed_token_counts(_ds(t), buckets=64)
    tgt_c = hashed_token_counts(
        _ds(t.filter(pa.compute.less(t.column("doc_id"), 30)), 2), buckets=64)
    weighted = dsir_weights(_ds(t), dsir_log_ratios(tgt_c, raw_c)).to_pandas()

    got = dsir_select(_ds(pa.Table.from_pandas(weighted), 3), k=20).to_pandas()
    got2 = dsir_select(_ds(pa.Table.from_pandas(weighted), 7), k=20).to_pandas()
    assert len(got) == 20
    assert set(got["doc_id"]) == set(got2["doc_id"])  # partition-stable

    keys = weighted["dsir_weight"] + [
        gumbel_from_id(i) for i in weighted["doc_id"]]
    want = set(weighted["doc_id"][np.argsort(-keys.to_numpy())[:20]])
    assert set(got["doc_id"]) == want


def test_dsir_select_k_validation(ray_session):
    t = pa.table({"doc_id": [1], "dsir_weight": [0.0]})
    with pytest.raises(ValueError, match="k must be"):
        dsir_select(_ds(t, 1), k=0)


# -------------------------------------------------------------- cap_per_key


def test_cap_per_key_matches_sql_qualify(ray_session):
    from dataprof_ray.pipelines.sampling import cap_per_key

    rng = np.random.default_rng(5)
    t = pa.table({
        "doc_id": pa.array(np.arange(500), pa.int64()),
        "source": pa.array([f"s{v}" for v in rng.integers(0, 7, 500)]),
    })
    got = cap_per_key(_ds(t, 5), ["source"], per_key=12)
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        "SELECT doc_id, source FROM t QUALIFY ROW_NUMBER() OVER ("
        "PARTITION BY source ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) "
        "<= 12 ORDER BY source, doc_id").df()
    got = got.sort_values(["source", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "source"]], want, check_dtype=False)
    assert got.groupby("source").size().max() <= 12


def test_cap_per_key_dataset_form_matches_pandas_form(ray_session):
    from dataprof_ray.pipelines.sampling import cap_per_key

    rng = np.random.default_rng(8)
    t = pa.table({
        "doc_id": pa.array(np.arange(200), pa.int64()),
        "source": pa.array([f"s{v}" for v in rng.integers(0, 5, 200)]),
    })
    df = cap_per_key(_ds(t, 4), ["source"], per_key=9)
    ds_out = cap_per_key(_ds(t, 4), ["source"], per_key=9,
                         as_pandas=False)
    assert hasattr(ds_out, "iter_batches")  # stays a Dataset
    got = ds_out.to_pandas()
    assert sorted(got.columns) == ["doc_id", "source"]
    assert set(got["doc_id"]) == set(df["doc_id"])


def test_cap_per_key_small_groups_uncapped(ray_session):
    from dataprof_ray.pipelines.sampling import cap_per_key

    t = pa.table({"doc_id": [1, 2, 3], "source": ["a", "a", "b"]})
    got = cap_per_key(_ds(t, 2), ["source"], per_key=10)
    assert len(got) == 3


# ------------------------------------------------------------ semantic dedup


def _clone_embeddings(n: int = 240, d: int = 16, seed: int = 9):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, d))
    clones = {}  # id -> original id
    plants = [(10, [60, 61]), (25, [70]), (80, [81, 82, 83])]
    for orig, copies in plants:
        for c in copies:
            if c < n:
                m[c] = m[orig]
                clones[c] = orig
    return pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.ravel(), pa.float64()), d),
    }), clones


def test_semantic_dedup_drops_planted_clones(ray_session):
    from dataprof_ray.pipelines.dedup import semantic_dedup

    t, clones = _clone_embeddings()
    out = (semantic_dedup(_ds(t), threshold=0.95, n_cells=6)
           .to_pandas().set_index("vec_id"))
    assert len(out) == len(t)
    for copy_id, orig_id in clones.items():
        # identical vectors share a cell; the smallest id is kept
        assert bool(out.loc[orig_id, "kept"]) is True
        assert bool(out.loc[copy_id, "kept"]) is False
        assert out.loc[copy_id, "max_cos_to_kept"] >= 0.95


def test_semantic_dedup_invariants(ray_session):
    from dataprof_ray.pipelines.dedup import semantic_dedup
    from dataprof_ray.pipelines.similarity import _normalize_rows, _to_matrix

    t, _ = _clone_embeddings(n=120, seed=21)
    thr = 0.3  # low threshold so drops happen among random vectors too
    out = semantic_dedup(_ds(t, 3), threshold=thr, n_cells=4).to_pandas()
    dropped = out[~out["kept"]]
    assert len(dropped) > 0
    # every drop decision carries a witness >= threshold
    assert (dropped["max_cos_to_kept"] >= thr).all()
    # kept docs within one cell are pairwise below threshold
    vecs = _normalize_rows(_to_matrix(t.column("embedding")))
    for cell, grp in out[out["kept"]].groupby("cell"):
        m = vecs[grp["vec_id"].to_numpy()]
        s = m @ m.T
        np.fill_diagonal(s, -1.0)
        assert s.max() < thr + 1e-9


def test_semantic_dedup_stable_under_partitioning(ray_session):
    from dataprof_ray.pipelines.dedup import semantic_dedup

    t, _ = _clone_embeddings(n=100, seed=2)
    a = (semantic_dedup(_ds(t, 2), threshold=0.5, n_cells=4)
         .to_pandas().sort_values("vec_id").reset_index(drop=True))
    b = (semantic_dedup(_ds(t, 8), threshold=0.5, n_cells=4)
         .to_pandas().sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a[["vec_id", "kept"]], b[["vec_id", "kept"]])


def test_semantic_dedup_threshold_validation(ray_session):
    from dataprof_ray.pipelines.dedup import semantic_dedup

    t, _ = _clone_embeddings(n=20)
    with pytest.raises(ValueError, match="threshold"):
        semantic_dedup(_ds(t, 1), threshold=1.5)


# ------------------------------------------------------------------ PCA


def _emb_table(n: int = 300, d: int = 12, seed: int = 13):
    rng = np.random.default_rng(seed)
    # low-rank structure + noise so top-k explains most variance
    basis = rng.normal(size=(3, d))
    m = rng.normal(size=(n, 3)) @ basis + 0.1 * rng.normal(size=(n, d))
    return m, pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.ravel(), pa.float64()), d),
    })


def test_pca_fit_matches_numpy_oracle(ray_session):
    from dataprof_ray.pipelines.similarity import pca_fit

    m, t = _emb_table()
    model = pca_fit(_ds(t), k=3)
    cov = np.cov(m, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    idx = np.argsort(evals)[::-1][:3]
    want_var = evals[idx]
    np.testing.assert_allclose(model["mean"], m.mean(axis=0), rtol=1e-10)
    np.testing.assert_allclose(model["explained_variance"], want_var,
                               rtol=1e-8)
    # components match up to the canonical sign
    for row, col in zip(model["components"], idx):
        v = evecs[:, col]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        np.testing.assert_allclose(row, v, rtol=0, atol=1e-8)


def test_pca_transform_and_audit(ray_session):
    from dataprof_ray.pipelines.similarity import (pca_audit, pca_fit,
                                                   pca_transform)

    m, t = _emb_table(n=200)
    model = pca_fit(_ds(t), k=3)
    out = (pca_transform(_ds(t, 3), model).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    want = (m - model["mean"]) @ model["components"].T
    got = np.stack(out["pc"].map(np.asarray))
    np.testing.assert_allclose(got, want, atol=1e-10)

    a = pca_audit(_ds(t), k=3)
    assert a["rel_gap"] < 1e-9  # exact PCA identity, numeric error only
    assert 0.9 < a["explained_ratio"] <= 1.0  # planted rank-3 structure


def test_pca_fit_needs_two_rows(ray_session):
    from dataprof_ray.pipelines.similarity import pca_fit

    _, t = _emb_table(n=1)
    with pytest.raises(ValueError, match=">= 2 rows"):
        pca_fit(_ds(t, 1), k=2)


def test_temperature_mixture_rates(ray_session):
    from dataprof_ray.pipelines.sampling import (temperature_mixture_rates,
                                                 weighted_source_sample)

    rng = np.random.default_rng(5)
    srcs = (["big"] * 700) + (["mid"] * 200) + (["tiny"] * 100)
    t = pa.table({
        "doc_id": pa.array(np.arange(1000), pa.int64()),
        "source": pa.array(srcs),
    })
    rates = temperature_mixture_rates(_ds(t, 4), alpha=0.5,
                                      target_fraction=0.5)
    r = dict(zip(rates["source"], rates["rate"]))
    # alpha<1 upweights small sources: tiny gets the highest keep rate
    assert r["tiny"] > r["mid"] > r["big"]
    # expected kept fraction ~ target (before the min-1 cap binds)
    n = dict(zip(rates["source"], rates["n_docs"]))
    expected = sum(r[s] * n[s] for s in r) / 1000
    assert abs(expected - 0.5) < 0.02
    # rates feed the deterministic apply
    kept = weighted_source_sample(_ds(t, 4), rates=r).to_pandas()
    assert 0.35 < len(kept) / 1000 < 0.65
    assert set(kept["source"]) == {"big", "mid", "tiny"}


def test_temperature_mixture_alpha_one_is_uniform_rate(ray_session):
    from dataprof_ray.pipelines.sampling import temperature_mixture_rates

    t = pa.table({
        "doc_id": pa.array(np.arange(300), pa.int64()),
        "source": pa.array((["a"] * 200) + (["b"] * 100)),
    })
    rates = temperature_mixture_rates(_ds(t, 3), alpha=1.0,
                                      target_fraction=0.4)
    assert set(np.round(rates["rate"], 6)) == {0.4}
