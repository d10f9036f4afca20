"""Sequence packing: concat-chunk offsets vs hand computation, FFD bin
invariants, partitioning determinism, efficiency audit."""

import numpy as np
import pyarrow as pa
import ray

from dataprof_ray.pipelines.packing import (pack_bins, pack_concat_chunk,
                                            packing_efficiency)


def _tbl(token_counts):
    texts = [" ".join(f"w{i}" for i in range(n)) for n in token_counts]
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })


def _ds(t, blocks=3):
    return ray.data.from_arrow(t).repartition(blocks)


def test_concat_chunk_manual(ray_session):
    # one partition; stream: 3 + 4 + 0 + 6 + 2 tokens, max_len=5
    out = (pack_concat_chunk(_ds(_tbl([3, 4, 0, 6, 2])), max_len=5, parts=1)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out["tok_offset"]) == [0, 3, 7, 7, 13]
    assert list(out["seq_start"]) == [0, 0, 1, 1, 2]
    # doc1 spans tokens 3..6 -> seqs 0..1; doc3 spans 7..12 -> seqs 1..2
    assert list(out["seq_end"]) == [0, 1, 1, 2, 2]
    assert list(out["n_tokens"]) == [3, 4, 0, 6, 2]


def test_concat_chunk_partition_is_doc_hash(ray_session):
    out = (pack_concat_chunk(_ds(_tbl([2] * 20)), max_len=4, parts=4)
           .to_pandas())
    assert (out["part"] == out["doc_id"] % 4).all()
    # within each partition offsets restart at 0 and step by 2
    for _, g in out.groupby("part"):
        g = g.sort_values("doc_id")
        assert list(g["tok_offset"]) == [2 * i for i in range(len(g))]


def test_pack_bins_invariants(ray_session):
    rng = np.random.default_rng(7)
    counts = rng.integers(1, 120, 300).tolist() + [500, 700]  # 2 oversize
    out = pack_bins(_ds(_tbl(counts), 5), max_len=128, parts=4).to_pandas()
    assert len(out) == len(counts)
    over = out[out["bin_id"] < 0]
    assert set(over["n_tokens"]) == {500, 700}
    ok = out[out["bin_id"] >= 0]
    fills = ok.groupby(["part", "bin_id"])["n_tokens"].sum()
    assert (fills <= 128).all()
    # bin ids are contiguous 0..n-1 within each partition
    for _, g in ok.groupby("part"):
        assert sorted(g["bin_id"].unique()) == list(range(g["bin_id"].max() + 1))


def test_pack_bins_deterministic_across_partitionings(ray_session):
    counts = list(np.random.default_rng(3).integers(1, 60, 200))
    a = (pack_bins(_ds(_tbl(counts), 2), max_len=64, parts=4)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (pack_bins(_ds(_tbl(counts), 9), max_len=64, parts=4)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)


def test_packing_efficiency_audit(ray_session):
    counts = list(np.random.default_rng(11).integers(1, 100, 400)) + [9999]
    row = packing_efficiency(_ds(_tbl(counts), 4), max_len=128,
                             parts=8).iloc[0]
    assert row["n_docs"] == 401
    assert row["oversize_docs"] == 1
    assert row["lb_bins"] <= row["n_bins"]
    assert row["max_bin_tokens"] <= 128
    assert 0.5 < row["efficiency"] <= 1.0


def test_max_len_validated(ray_session):
    import pytest

    with pytest.raises(ValueError):
        pack_concat_chunk(_ds(_tbl([1])), max_len=0)
    with pytest.raises(ValueError):
        pack_bins(_ds(_tbl([1])), max_len=-5)


def test_packed_sequences_reconstructs_partition_streams(ray_session):
    import re

    from dataprof_ray.pipelines.packing import packed_sequences

    rng = np.random.default_rng(13)
    counts = rng.integers(0, 40, 120).tolist()
    tbl = _tbl(counts)
    out = (packed_sequences(_ds(tbl, 5), max_len=16, parts=4,
                            docs_per_bucket=10)
           .to_pandas().sort_values(["part", "seq_id"])
           .reset_index(drop=True))
    ws = re.compile(r"\s+")
    ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    for p in range(4):
        stream = []
        for i, t in sorted((i, t) for i, t in zip(ids, texts) if i % 4 == p):
            tt = (t or "").strip()
            if tt:
                stream.extend(ws.split(tt))
        want = [" ".join(stream[s:s + 16])
                for s in range(0, len(stream), 16)]
        got = out[out["part"] == p]
        assert list(got["seq_id"]) == list(range(len(want)))
        assert list(got["text"]) == want
        full = got["n_tokens"].to_list()
        assert all(v == 16 for v in full[:-1])  # only the tail is short
        if full:
            assert 1 <= full[-1] <= 16


def test_packed_sequences_stable_across_partitionings(ray_session):
    from dataprof_ray.pipelines.packing import packed_sequences

    counts = list(np.random.default_rng(17).integers(1, 30, 80))
    a = (packed_sequences(_ds(_tbl(counts), 2), max_len=24, parts=4,
                          docs_per_bucket=7)
         .to_pandas().sort_values(["part", "seq_id"]).reset_index(drop=True))
    b = (packed_sequences(_ds(_tbl(counts), 9), max_len=24, parts=4,
                          docs_per_bucket=33)
         .to_pandas().sort_values(["part", "seq_id"]).reset_index(drop=True))
    assert a.equals(b)


def test_export_packed_sequences_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from dataprof_ray.pipelines.packing import export_packed_sequences

    out = str(tmp_path / "packed")
    export_packed_sequences(_ds(_tbl([10] * 50), 3), out, max_len=16,
                            parts=4)
    back = rd.read_parquet(out).to_pandas()
    assert back["n_tokens"].sum() == 500
    assert set(back.columns) == {"part", "seq_id", "n_tokens", "text"}


def test_chunk_documents_coverage_and_overlap(ray_session):
    """Every token covered; each chunk after the first repeats exactly
    `overlap` tokens; short docs emit one chunk; empty docs emit none."""
    import ray.data as rd

    import pyarrow as pa

    from dataprof_ray.pipelines.packing import chunk_documents

    toks = [f"t{i}" for i in range(25)]
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": [" ".join(toks), "short doc", "", None],
    })
    out = (chunk_documents(rd.from_arrow(t).repartition(2),
                           max_tokens=10, overlap=4)
           .to_pandas().sort_values(["doc_id", "chunk_id"])
           .reset_index(drop=True))
    d1 = out[out["doc_id"] == 1]
    # stride 6: 25 tokens -> ceil((25-10)/6)+1 = 4 chunks
    assert d1["chunk_id"].tolist() == [0, 1, 2, 3]
    assert d1["n_tokens"].tolist() == [10, 10, 10, 7]
    c = d1["text"].tolist()
    assert c[0].split() == toks[0:10]
    assert c[1].split() == toks[6:16]     # 4 tokens of overlap
    assert c[3].split() == toks[18:25]    # tail chunk, every token covered
    covered = set()
    for ch in c:
        covered.update(ch.split())
    assert covered == set(toks)
    assert out[out["doc_id"] == 2]["n_tokens"].tolist() == [2]
    assert not set(out["doc_id"]) & {3, 4}  # empty docs emit nothing

    import pytest
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(rd.from_arrow(t), max_tokens=8, overlap=8)
