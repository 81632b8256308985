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


def tier_window(tier: str) -> str:
    """Tumbling-window duration for named AND custom fixed-step tiers.
    Spark's tumbling windows align to the epoch, which for day-dividing
    steps equals the batch side's epoch-µs floor (ops/rollup.tier_bucket)
    — streamed buckets match batch buckets exactly."""
    if tier in TIER_WINDOW:
        return TIER_WINDOW[tier]
    from tmframe_spark.ops.rollup import _custom_tier

    return f"{_custom_tier(tier)[2]} seconds"


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
        .groupBy(F.col("conv_id"), F.window("ts", tier_window(tier)).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("turns"),
            F.sum(F.length("text")).alias("token_volume"),
            F.count("tool").alias("tool_calls"),
        )
        .select(
            "conv_id", F.col("w.start").alias("bucket"), "turns", "token_volume", "tool_calls"
        )
    )


def _content_keys(cols) -> tuple:
    """Two independent 64-bit content hashes (different seed column mixed
    in) = a 128-bit effective key. A single xxhash64 would silently drop a
    distinct row on a 64-bit collision (~50% at 5B rows by birthday bound);
    at 128 bits the collision odds are negligible at any realistic corpus
    size, while state stays 16 bytes/row instead of the full text (the batch
    engine compares exact strings; the reference uses 512-bit BLAKE2b)."""
    base = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
    return (
        F.xxhash64(*base),
        F.xxhash64(F.lit("tmframe-k2"), *base),
    )


def stream_dedup(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked streaming dedup keyed by content (conv_id, role, text,
    tool) — state bounded by the watermark horizon, 128-bit content key."""
    k1, k2 = _content_keys(("conv_id", "role", "text", "tool"))
    keyed = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("content_key", k1)
        .withColumn("content_key2", k2)
    )
    return keyed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["content_key", "content_key2"]
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
    engine's stable-sort requirement). Content identity is the 128-bit
    two-hash key (see _content_keys) — the 64-bit single hash of r1 could
    silently drop a colliding distinct row.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    k1, k2 = _content_keys(hash_cols)
    keyed = stream.withColumn("content_key", k1).withColumn("content_key2", k2)
    out_schema = StructType([f for f in keyed.schema.fields])
    state_schema = StructType(
        [
            StructField("i", LongType()),
            StructField("ring1", ArrayType(LongType())),
            StructField("ring2", ArrayType(LongType())),
            StructField("keys1", ArrayType(LongType())),
            StructField("keys2", ArrayType(LongType())),
            StructField("counts", ArrayType(IntegerType())),
        ]
    )

    def fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            i, ring1, ring2, keys1, keys2, counts = state.get
            ring = [
                (a, b) for a, b in zip(ring1, ring2)
            ] + [None] * (window_size - len(ring1))
            present = dict(zip(zip(keys1, keys2), counts))
        else:
            i, ring, present = 0, [None] * window_size, {}
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
            keep = []
            for h1, h2 in zip(pdf["content_key"], pdf["content_key2"]):
                h = (int(h1), int(h2))
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
        filled = ring[: min(i, window_size)]
        state.update(
            (
                i,
                [a for a, _ in filled],
                [b for _, b in filled],
                [a for a, _ in present.keys()],
                [b for _, b in present.keys()],
                list(present.values()),
            )
        )

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


def stream_topk_counts(
    stream: DataFrame,
    tier: str = "1h",
    key_col: str = "conv_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked per-(bucket, key) counts — the streaming feed of the
    Misra-Gries heavy-hitters tier (ops/rollup.rollup_topk_sketch). In
    append mode a window's counts emit exactly once, complete, after the
    watermark passes — so the downstream sink sees each bucket's full
    exact count table and can compress it deterministically."""
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.where(F.col(key_col).isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", tier_window(tier)).alias("w"),
            F.col(key_col).cast("string").alias("key"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(F.col("w.start").alias("bucket"), "key", "cnt")
    )


def stream_ewma(
    stream: DataFrame,
    k: int = 3,
    value_col: str = None,
) -> DataFrame:
    """Streaming exponential smoothing per conversation — the stateful
    form of ops/stats.ewma's EXACT integer recurrence
    (S += (v<<k - S) >> k, arithmetic-shift floor), state = ONE int64 per
    conversation carried across micro-batches by applyInPandasWithState.

    ``value_col`` defaults to per-turn text length. Rows are smoothed in
    event order WITHIN the stream's delivery (ts, turn_idx sorted per
    micro-batch — the same arrival-order contract as
    stream_count_window_dedup); calendar gap-fill semantics belong to the
    batch op over materialized tiers, not here: a stream never observes
    an empty bucket. The emitted ``ewma_q`` values are bit-identical to
    the batch recurrence applied to the same value sequence (pinned in
    tests/test_streaming_stateful.py).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    if k < 1 or k > 30:
        raise ValueError(f"stream_ewma k must be in [1, 30], got {k}")
    src = stream.withColumn(
        "value",
        (F.length("text") if value_col is None else F.col(value_col)).cast("long"),
    )
    out_schema = StructType([f for f in src.schema.fields]).add("ewma_q", LongType())
    state_schema = StructType([StructField("s", LongType())])

    def fn(key, pdfs, state):
        import pandas as pd

        s = state.get[0] if state.exists else None
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
            out = []
            for v in pdf["value"]:
                vq = int(v) << k
                s = vq if s is None else s + ((vq - s) >> k)
                out.append(s)
            pdf = pdf.copy()
            pdf["ewma_q"] = pd.Series(out, index=pdf.index, dtype="int64")
            yield pdf
        if s is not None:
            state.update((s,))

    return src.groupBy("conv_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
