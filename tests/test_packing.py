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
