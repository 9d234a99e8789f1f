"""fan_out scale guard (queries/common.py): the round-robin fan-out of
single-row-group fixture scans must fail CLOSED — any path whose size
cannot be established locally (remote scheme, missing file) must leave
the plan untouched, and directory inputs must be sized recursively so
partitioned layouts are not undercounted (r12 ADVICE)."""

from __future__ import annotations

import os

from airquality_data_pipeline_spark.queries.common import (
    _path_bytes,
    fan_out,
)


def test_path_bytes_missing_is_zero():
    assert _path_bytes("/nonexistent/nowhere.parquet") == 0


def test_path_bytes_dir_recurses(tmp_path):
    (tmp_path / "date=2031-01-01").mkdir()
    (tmp_path / "date=2031-01-01" / "part-0.parquet").write_bytes(b"x" * 100)
    (tmp_path / "date=2031-01-02").mkdir()
    (tmp_path / "date=2031-01-02" / "part-0.parquet").write_bytes(b"y" * 50)
    (tmp_path / "_SUCCESS").write_bytes(b"")
    assert _path_bytes(str(tmp_path)) == 150


def test_unknown_size_fails_closed_to_noop(spark):
    df = spark.range(10)
    out = fan_out(df, spark, "/nonexistent", "missing_table")
    assert out is df  # no repartition injected when size is unknown


def test_small_input_fans_out(spark, tmp_path):
    (tmp_path / "t.parquet").write_bytes(b"x" * 10)
    df = spark.range(10)
    out = fan_out(df, spark, str(tmp_path), "t")
    assert out is not df
    assert "RoundRobinPartitioning" in out._jdf.queryExecution().toString()


def test_large_input_is_noop(spark, tmp_path):
    par = spark.sparkContext.defaultParallelism
    # sparse file: st_size is the logical size, no disk cost
    with open(tmp_path / "big.parquet", "wb") as f:
        f.truncate(par * (1 << 30))
    df = spark.range(10)
    out = fan_out(df, spark, str(tmp_path), "big")
    assert out is df


def test_fires_only_below_one_split_per_core(spark, tmp_path):
    par = spark.sparkContext.defaultParallelism
    split = 128 << 20
    with open(tmp_path / "edge.parquet", "wb") as f:
        f.truncate(par * split)  # exactly at the threshold: no-op
    df = spark.range(10)
    assert fan_out(df, spark, str(tmp_path), "edge") is df
    os.truncate(tmp_path / "edge.parquet", par * split - 1)
    assert fan_out(df, spark, str(tmp_path), "edge") is not df
