"""Structured Streaming tier: incremental rollup and watermarked dedup,
driven batch-style with trigger(availableNow) against temp dirs."""

import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tmframe_spark.data.transcripts import load_transcripts
from tmframe_spark.streaming.stream import (
    read_transcript_stream,
    stream_dedup,
    stream_rollup,
)


@pytest.fixture(scope="module")
def landed(spark):
    """Transcripts written to a landing dir as the streaming source."""
    d = tempfile.mkdtemp(prefix="tmframe_stream_src_")
    t = load_transcripts(spark, SF_DIR)
    t.write.mode("overwrite").parquet(d)
    return d, t.schema, t


def test_stream_rollup_matches_batch(spark, landed):
    src, schema, t = landed
    stream = read_transcript_stream(spark, src, schema)
    agg = stream_rollup(stream, "1h", watermark="10 minutes")
    out = tempfile.mkdtemp(prefix="tmframe_stream_sink_")
    q = (
        agg.writeStream.format("memory")
        .queryName("rollup_1h_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql(
        "select conv_id, bucket, turns, token_volume, tool_calls from rollup_1h_stream"
    ).toPandas()
    want = (
        t.groupBy("conv_id", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("turns"),
            F.sum(F.length("text")).alias("token_volume"),
            F.count("tool").alias("tool_calls"),
        )
        .toPandas()
    )
    key = ["conv_id", "bucket"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w)
    for c in ["turns", "token_volume", "tool_calls"]:
        assert (g[c].to_numpy() == w[c].to_numpy()).all(), c


def test_stream_dedup_drops_duplicates(spark, landed):
    src, schema, t = landed
    # duplicate the source entirely: stream must emit each content key once
    dup_dir = tempfile.mkdtemp(prefix="tmframe_stream_dup_")
    t.write.mode("overwrite").parquet(dup_dir)
    t.write.mode("append").parquet(dup_dir)
    stream = read_transcript_stream(spark, dup_dir, schema)
    deduped = stream_dedup(stream, watermark="10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    n = spark.sql("select count(*) c from dedup_stream").collect()[0]["c"]
    distinct_keys = (
        t.select(
            F.xxhash64("conv_id", "role", "text", F.coalesce("tool", F.lit(""))).alias("k")
        )
        .distinct()
        .count()
    )
    assert n == distinct_keys


def test_continuous_rollup_materializes_finalized_windows(spark, landed):
    """Continuous aggregate: after draining the stream, the materialized
    table equals the batch rollup of every window the watermark closed.
    A later 'flush' file advances the watermark past all real data."""
    import os
    import tempfile
    import time

    from tmframe_spark.streaming.materialize import (
        materialize_continuous_rollup,
        read_materialized,
    )

    src_dir, schema, t = landed
    d = tempfile.mkdtemp(prefix="tmframe_cagg_src_")
    t.write.mode("overwrite").parquet(d)
    time.sleep(1.1)  # file-source orders batches by mtime: flush comes last
    mx = t.agg(F.max("ts")).collect()[0][0]
    flush = spark.createDataFrame(
        [("__flush__", 0, "system", "flush", None, mx)], schema
    ).withColumn("ts", (F.col("ts").cast("timestamp") + F.expr("interval 2 days")).cast(schema["ts"].dataType))
    flush.write.mode("append").parquet(d)

    root = tempfile.mkdtemp(prefix="tmframe_cagg_tbl_")
    q = materialize_continuous_rollup(
        spark, d, schema, root, tier="1h", watermark="10 minutes", max_files=4
    )
    q.awaitTermination(300)

    got = (
        read_materialized(spark, root, "rollup_1h_stream")
        .where(F.col("conv_id") != "__flush__")
        .select("conv_id", "bucket", "turns", "token_volume", "tool_calls")
        .toPandas()
    )
    want = (
        t.groupBy("conv_id", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("turns"),
            F.sum(F.length("text")).alias("token_volume"),
            F.count("tool").alias("tool_calls"),
        )
        .toPandas()
    )
    key = ["conv_id", "bucket"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w), (len(g), len(w))
    for c in ["turns", "token_volume", "tool_calls"]:
        assert (g[c].to_numpy() == w[c].to_numpy()).all(), c
    # per-batch manifests committed (the exactly-once evidence)
    mans = os.listdir(os.path.join(root, "_rollup_1h_stream_batches"))
    assert any(m.startswith("batch-") for m in mans)
