"""Structured Streaming tier: incremental rollup + watermarked dedup.

The reference's streaming story is fsnotify file-tailing (tfcat -f,
cmd/tfcat/tfcat.go:119-162) and a NATS-fed archiver (archiver/filemgr.go);
out-of-order data is fixed offline by tfsort, not by watermarks. The Spark
analog is the file/parquet streaming source with event-time watermarks:

- stream_rollup: readStream -> window(ts, tier) aggregate with a watermark
  (late turns beyond the watermark are dropped, matching a bounded-lateness
  contract the reference never had).
- stream_dedup: dropDuplicatesWithinWatermark on the frame content hash —
  the streaming analog of the count-window dedup (state is bounded by the
  watermark horizon instead of a frame count).

Batch tests drive these with trigger(availableNow=True) against a temp
directory — the same code would run against a live landing zone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TIER_WINDOW = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}


def read_transcript_stream(
    spark: SparkSession, path: str, schema, max_files: int = 64
) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def stream_rollup(
    stream: DataFrame, tier: str = "1m", watermark: str = "10 minutes"
) -> DataFrame:
    """Incremental per-conversation rollup with event-time watermark."""
    # watermarks require (ltz) TIMESTAMP event time; session TZ is UTC so
    # the cast from the storage-side TIMESTAMP_NTZ is exact
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.col("conv_id"), F.window("ts", TIER_WINDOW[tier]).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("turns"),
            F.sum(F.length("text")).alias("token_volume"),
            F.count("tool").alias("tool_calls"),
        )
        .select(
            "conv_id", F.col("w.start").alias("bucket"), "turns", "token_volume", "tool_calls"
        )
    )


def stream_dedup(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked streaming dedup keyed by content (conv_id, role, text,
    tool) — state bounded by the watermark horizon."""
    keyed = stream.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
        "content_key",
        F.xxhash64("conv_id", "role", "text", F.coalesce("tool", F.lit(""))),
    )
    return keyed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["content_key"]
    )


def stream_count_window_dedup(
    stream: DataFrame,
    window_size: int = 1000,
    hash_cols: tuple = ("role", "text", "tool"),
) -> DataFrame:
    """The reference's count-window ring dedup (dedup.go:40-111) as a
    *custom stateful streaming operator*: applyInPandasWithState keyed by
    conv_id, state = (next index, ring of content keys, refcount map as
    parallel arrays), carried across micro-batches.

    Semantics per conversation match ops.dedup.count_window_dedup exactly
    within the arrival order the stream delivers (event-time reordering
    across micro-batches is the watermark's contract, as in the batch
    engine's stable-sort requirement).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    keyed = stream.withColumn(
        "content_key",
        F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in hash_cols]),
    )
    out_schema = StructType([f for f in keyed.schema.fields])
    state_schema = StructType(
        [
            StructField("i", LongType()),
            StructField("ring", ArrayType(LongType())),
            StructField("keys", ArrayType(LongType())),
            StructField("counts", ArrayType(IntegerType())),
        ]
    )

    def fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            i, ring, keys, counts = state.get
            ring = list(ring) + [None] * (window_size - len(ring))
            present = dict(zip(keys, counts))
        else:
            i, ring, present = 0, [None] * window_size, {}
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
            keep = []
            for h in pdf["content_key"]:
                h = int(h)
                if present.get(h, 0) > 0:
                    present[h] += 1
                    keep.append(False)
                else:
                    present[h] = 1
                    keep.append(True)
                if i >= window_size:
                    old = ring[i % window_size]
                    present[old] -= 1
                    if present[old] == 0:
                        del present[old]
                ring[i % window_size] = h
                i += 1
            out = pdf[pd.Series(keep, index=pdf.index)]
            if len(out):
                yield out
        state.update((i, ring[: min(i, window_size)], list(present.keys()), list(present.values())))

    return keyed.groupBy("conv_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def run_available_now(stream_df: DataFrame, checkpoint: str, out_path: str) -> None:
    """Drain everything currently available (batch-style streaming run)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("checkpointLocation", checkpoint)
        .option("path", out_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
