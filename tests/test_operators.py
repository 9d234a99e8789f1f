"""Unit tests for operators not fully pinned by the oracle catalog:
multimodal plumbing, IVF shape guarantees, cursor/merge edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airquality_data_pipeline_spark.operators import multimodal
from airquality_data_pipeline_spark.operators.cursor import (
    greatest_merge,
    incremental_filter,
)
from airquality_data_pipeline_spark.operators.dedup import word_shingles
from airquality_data_pipeline_spark.queries.common import table


def test_multimodal_extract_features(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(50)
    corpus = multimodal.synthesize_corpus(docs)
    feats = multimodal.extract_features(corpus).collect()
    assert len(feats) == 50
    for r in feats:
        assert r.modality in multimodal.MODALITIES
        assert r.n_bytes > 0
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-6  # normalized histogram


def test_multimodal_real_decode_raises(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(1)
    corpus = multimodal.synthesize_corpus(docs)
    with pytest.raises(Exception, match="NotImplementedError|real decode"):
        multimodal.extract_features(corpus, decode_mode="real").collect()


def test_multimodal_frame_sample(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(10)
    corpus = multimodal.synthesize_corpus(docs)
    frames = multimodal.frame_sample(corpus, n_frames=4)
    rows = frames.collect()
    assert len(rows) == 40
    per_item = frames.groupBy("item_id").count().collect()
    assert all(r["count"] == 4 for r in per_item)


def test_incremental_filter_null_ts_passthrough(spark):
    batch = spark.createDataFrame(
        [("s1", "pm25", "2024-01-02"), ("s1", "pm25", None), (None, "pm10", "2024-01-01")],
        "station_id string, pollutant string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    cursors = spark.createDataFrame(
        [("s1", "pm25", "2024-01-03")],
        "station_id string, pollutant string, last_observed_at string",
    ).withColumn("last_observed_at", F.col("last_observed_at").cast("timestamp"))
    out, updates = incremental_filter(batch, cursors, ts_col="ts")
    rows = out.collect()
    # stale well-formed row dropped; null-ts and null-key rows pass through
    assert len(rows) == 2
    assert updates.count() == 0


def test_greatest_merge_never_moves_backwards(spark):
    old = spark.createDataFrame(
        [("s1", "pm25", "2024-01-05")], "station_id string, pollutant string, last_observed_at string"
    ).withColumn("last_observed_at", F.col("last_observed_at").cast("timestamp"))
    new = spark.createDataFrame(
        [("s1", "pm25", "2024-01-02"), ("s2", "o3", "2024-01-09")],
        "station_id string, pollutant string, last_observed_at string",
    ).withColumn("last_observed_at", F.col("last_observed_at").cast("timestamp"))
    merged = {
        (r.station_id, r.pollutant): str(r.last_observed_at)
        for r in greatest_merge(old, new, keys=("station_id", "pollutant")).collect()
    }
    assert merged[("s1", "pm25")].startswith("2024-01-05")  # kept newer old
    assert merged[("s2", "o3")].startswith("2024-01-09")  # inserted new key


def test_word_shingles_short_docs_empty(spark):
    df = spark.createDataFrame(
        [(1, "one two"), (2, "a b c d"), (3, "")], "id long, text string"
    )
    got = word_shingles(df, "text", "id", n=3).groupBy("id").count().collect()
    counts = {r.id: r["count"] for r in got}
    assert 1 not in counts and 3 not in counts  # < n tokens -> no shingles
    assert counts[2] == 2


def test_cluster_conf_shape():
    from airquality_data_pipeline_spark.session import cluster_conf

    conf = cluster_conf(executors=1000, cores_per_executor=4)
    assert conf["spark.sql.shuffle.partitions"] == "8000"
    assert int(conf["spark.sql.files.maxPartitionBytes"]) == 256 * 1024 * 1024
    assert all(isinstance(v, str) for v in conf.values())


def test_udtf_tokenize(spark, sf_dir):
    from airquality_data_pipeline_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    table(spark, sf_dir, "documents").limit(5).createOrReplaceTempView("docs5")
    got = spark.sql(
        "SELECT doc_id, t.token, t.idx, t.token_len "
        "FROM docs5, LATERAL tokenize(text) t"
    ).collect()
    assert got
    # ordinal + length invariants vs a plain split
    first = [r for r in got if r.doc_id == got[0].doc_id]
    assert [r.idx for r in first] == list(range(len(first)))
    assert all(r.token_len == len(r.token) for r in first)
