"""Stage-level stats audit (dataprof_ray.audit.stage_summary)."""

import pyarrow as pa


def test_stage_summary_parses_real_stats(ray_session):
    import ray.data as rd

    from dataprof_ray.audit import stage_summary

    ds = (rd.from_arrow(pa.table({"x": list(range(10_000))}))
          .repartition(4)
          .map_batches(lambda b: b, batch_format="pyarrow")
          .materialize())
    df = stage_summary(ds)
    assert len(df) >= 1
    ops = " ".join(df["operator"])
    assert "MapBatches" in ops
    row = df[df["operator"].str.contains("MapBatches")].iloc[0]
    assert row["wall_sec"] >= 0
    assert row["output_rows"] == 10_000
    assert row["tasks"] >= 1 and row["blocks"] >= 1


def test_stage_summary_accepts_string():
    from dataprof_ray.audit import stage_summary

    stats = (
        "Operator 1 ReadParquet: 2 tasks executed, 2 blocks produced in 0.5s\n"
        "* UDF time: 1us min, 2us max, 1.5us mean, 3us total\n"
        "* Output num rows per block: 10 min, 20 max, 15 mean, 30 total\n"
        "* Output size bytes per block: 1 min, 2 max, 1 mean, 300 total\n"
    )
    df = stage_summary(stats)
    assert df.iloc[0]["operator"] == "1:ReadParquet"
    assert df.iloc[0]["wall_sec"] == 0.5
    assert df.iloc[0]["output_rows"] == 30
    assert df.iloc[0]["output_bytes"] == 300


def test_stage_summary_includes_shuffle_operators(ray_session):
    """AllToAll operators (the ones that usually dominate) use a different
    stats header and must still appear — review r2 finding."""
    import ray.data as rd

    from dataprof_ray.audit import stage_summary

    ds = (rd.from_arrow(pa.table({"x": list(range(5000))}))
          .repartition(4)
          .sort("x")
          .materialize())
    ops = " ".join(stage_summary(ds)["operator"])
    assert "Sort" in ops or "Repartition" in ops
