"""Partitioned export: hive layout, deterministic splits, round-trip."""

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _docs(n=500):
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([f"doc {i}" for i in range(n)], pa.string()),
    })


def test_export_splits_hive_layout_and_determinism(ray_session, tmp_path):
    import ray.data as rd

    from dataprof_ray.pipelines.export import export_splits
    from dataprof_ray.pipelines.sampling import hash_split

    out = str(tmp_path / "corpus")
    export_splits(rd.from_arrow(_docs()).repartition(4), out)

    dirs = sorted(d for d in os.listdir(out) if d.startswith("split="))
    assert dirs == ["split=test", "split=train", "split=val"]

    back = rd.read_parquet(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert len(back) == 500
    assert set(back.columns) == {"doc_id", "text", "split"}
    # the directory-derived split equals the hash_split assignment
    want = hash_split(rd.from_arrow(_docs())).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert back.split.tolist() == want.split.tolist()
    # text round-trips next to its id
    assert back.text[7] == "doc 7"


def test_export_overwrite_is_idempotent(ray_session, tmp_path):
    import ray.data as rd

    from dataprof_ray.pipelines.export import export_splits

    out = str(tmp_path / "corpus")
    export_splits(rd.from_arrow(_docs(100)).repartition(2), out)
    export_splits(rd.from_arrow(_docs(100)).repartition(3), out)
    back = rd.read_parquet(out).to_pandas()
    assert len(back) == 100  # overwrite, not append


def test_export_partitioned_by_key(ray_session, tmp_path):
    import ray.data as rd

    from dataprof_ray.pipelines.export import export_partitioned

    t = pa.table({"k": pa.array(["a", "b", "a", "c"], pa.string()),
                  "v": pa.array([1, 2, 3, 4], pa.int64())})
    out = str(tmp_path / "bykey")
    export_partitioned(rd.from_arrow(t), out, by="k")
    assert sorted(d for d in os.listdir(out) if d.startswith("k=")) == \
        ["k=a", "k=b", "k=c"]
    ds = rd.read_parquet(out, columns=["k", "v"])
    assert ds.count() == 4


def test_export_shuffled_roundtrip(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dataprof_ray.pipelines.export import export_shuffled
    from dataprof_ray.pipelines.sampling import global_shuffle

    t = pa.table({
        "doc_id": pa.array(range(200), pa.int64()),
        "text": pa.array([f"doc {i}" for i in range(200)]),
    })
    out = str(tmp_path / "shuffled")
    export_shuffled(rd.from_arrow(t, override_num_blocks=4), out)
    back = rd.read_parquet(out).to_pandas()
    assert len(back) == 200
    assert {"doc_id", "text", "shard", "pos"} <= set(back.columns)
    # per-shard pos order matches the global_shuffle assignment exactly
    want = (global_shuffle(rd.from_arrow(t, override_num_blocks=3))
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    got = (back[["doc_id", "shard", "pos"]].astype({"shard": "int64"})
           .sort_values("doc_id").reset_index(drop=True))
    assert got.equals(want)
    # re-export reproduces the identical order (pure function of ids)
    export_shuffled(rd.from_arrow(t, override_num_blocks=7), out)
    back2 = rd.read_parquet(out).to_pandas()
    a = back.sort_values("doc_id").reset_index(drop=True)
    b = back2.sort_values("doc_id").reset_index(drop=True)
    assert a[["doc_id", "pos"]].equals(b[["doc_id", "pos"]])
