"""Custom stateful streaming operator: count-window ring dedup via
applyInPandasWithState, state carried across micro-batches — must match the
batch operator on the same arrival order."""

import os
import tempfile

import pandas as pd

from tests.test_merge_golden import python_ring_dedup
from tmframe_spark.streaming.stream import stream_count_window_dedup


def test_stateful_dedup_across_microbatches(spark):
    # one conversation, duplicate-heavy values, split into two files that
    # arrive as separate micro-batches (maxFilesPerTrigger=1)
    values = [1, 2, 1, 3, 1, 4, 2, 2, 5, 1, 6, 3, 3, 7, 1, 8]
    rows = pd.DataFrame(
        {
            "conv_id": "c0",
            "turn_idx": range(len(values)),
            "role": "user",
            "text": [str(v) for v in values],
            "tool": None,
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(range(len(values)), "s"),
        }
    )
    rows["tool"] = rows["tool"].astype("string")
    rows["ts"] = rows["ts"].astype("datetime64[us]")  # Spark can't read ns parquet
    src = tempfile.mkdtemp(prefix="tmframe_stateful_")
    half = len(values) // 2
    rows.iloc[:half].to_parquet(os.path.join(src, "a.parquet"))
    rows.iloc[half:].to_parquet(os.path.join(src, "b.parquet"))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    dd = stream_count_window_dedup(stream, window_size=3, hash_cols=("text",))
    q = (
        dd.writeStream.format("memory")
        .queryName("stateful_dedup")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = [
        int(r["text"])
        for r in spark.sql("select * from stateful_dedup order by turn_idx").collect()
    ]
    want = python_ring_dedup(values, 3)
    assert got == want, f"stream {got} vs reference ring {want}"
    # cross-batch state: values[7]==2 (second micro-batch) is dropped
    # because 2's refcount carried over from the first batch's ring, while
    # values[9]==1 reappears because its entries expired — both depend on
    # ring+refcount state surviving the batch boundary
    assert got == [1, 2, 3, 4, 2, 5, 1, 6, 3, 7, 1, 8]


def test_stateful_dedup_live_incremental_trigger(spark):
    # REAL incremental trigger (verdict r2 #8): the second file lands only
    # AFTER the first micro-batch has committed — unlike availableNow's
    # backlog drain, the query is live when new data arrives, so the ring
    # + refcount state must survive an actual trigger boundary
    values = [1, 2, 1, 3, 1, 4, 2, 2, 5, 1, 6, 3, 3, 7, 1, 8]
    rows = pd.DataFrame(
        {
            "conv_id": "c0",
            "turn_idx": range(len(values)),
            "role": "user",
            "text": [str(v) for v in values],
            "tool": None,
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(range(len(values)), "s"),
        }
    )
    rows["tool"] = rows["tool"].astype("string")
    rows["ts"] = rows["ts"].astype("datetime64[us]")
    src = tempfile.mkdtemp(prefix="tmframe_stateful_live_")
    half = len(values) // 2
    rows.iloc[:half].to_parquet(os.path.join(src, "a.parquet"))

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    dd = stream_count_window_dedup(stream, window_size=3, hash_cols=("text",))
    q = (
        dd.writeStream.format("memory")
        .queryName("stateful_dedup_live")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()  # micro-batch 1: first half only
        got1 = [
            int(r["text"])
            for r in spark.sql(
                "select * from stateful_dedup_live order by turn_idx"
            ).collect()
        ]
        assert got1 == python_ring_dedup(values[:half], 3)

        rows.iloc[half:].to_parquet(os.path.join(src, "b.parquet"))
        q.processAllAvailable()  # micro-batch 2: state carried over
    finally:
        q.stop()
    got = [
        int(r["text"])
        for r in spark.sql(
            "select * from stateful_dedup_live order by turn_idx"
        ).collect()
    ]
    assert got == python_ring_dedup(values, 3) == [1, 2, 3, 4, 2, 5, 1, 6, 3, 7, 1, 8]


def test_stream_ewma_state_across_microbatches(spark):
    """stream_ewma: the Q3 state survives the micro-batch boundary, and
    every emitted value equals the batch recurrence applied to the same
    arrival-ordered sequence."""
    from tmframe_spark.streaming.stream import stream_ewma

    texts = ["a" * n for n in [100, 0, 0, 50, 7, 7, 9000, 0, 3, 12, 12, 1]]
    rows = pd.DataFrame(
        {
            "conv_id": "c0",
            "turn_idx": range(len(texts)),
            "role": "user",
            "text": texts,
            "tool": None,
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(range(len(texts)), "s"),
        }
    )
    rows["tool"] = rows["tool"].astype("string")
    rows["ts"] = rows["ts"].astype("datetime64[us]")
    src = tempfile.mkdtemp(prefix="tmframe_sewma_")
    half = len(texts) // 2
    rows.iloc[:half].to_parquet(os.path.join(src, "a.parquet"))
    rows.iloc[half:].to_parquet(os.path.join(src, "b.parquet"))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream_ewma(stream, k=3)
        .writeStream.format("memory")
        .queryName("sewma")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = [
        r["ewma_q"]
        for r in spark.sql("select * from sewma order by turn_idx").collect()
    ]
    # batch-identical recurrence over the same sequence
    ref, s = [], None
    for v in [len(t) for t in texts]:
        vq = v << 3
        s = vq if s is None else s + ((vq - s) >> 3)
        ref.append(s)
    assert got == ref
    # the first second-batch value (index half) depends on state from the
    # first batch — equality above proves the carry, but make it explicit:
    assert got[half] != (len(texts[half]) << 3)


def _tier_files(values, prefix, split_at):
    """One conversation's (conv_id, bucket, turns) tier rows as two parquet
    files (two micro-batches with maxFilesPerTrigger=1)."""
    rows = pd.DataFrame(
        {
            "conv_id": "c0",
            "bucket": pd.to_datetime("2024-01-01")
            + pd.to_timedelta([60 * i for i in range(len(values))], "s"),
            "turns": pd.Series(values, dtype="int64"),
        }
    )
    rows["bucket"] = rows["bucket"].astype("datetime64[us]")
    src = tempfile.mkdtemp(prefix=prefix)
    rows.iloc[:split_at].to_parquet(os.path.join(src, "a.parquet"))
    rows.iloc[split_at:].to_parquet(os.path.join(src, "b.parquet"))
    return src


def test_stream_anomalies_bit_equal_to_batch(spark):
    """stream_anomalies: drained output == ops/anomaly.robust_anomalies on
    the same ordered tier rows, including a spike whose baseline ring spans
    the micro-batch boundary."""
    from tmframe_spark.ops.anomaly import robust_anomalies
    from tmframe_spark.streaming.stream import stream_anomalies

    # baseline 10/11/12 cycle; spikes at 30 (first batch) and 45 (second
    # batch, baseline window 25..44 crosses the file split at 40)
    values = [10 + (i % 3) for i in range(80)]
    values[30] = 200
    values[45] = 180
    src = _tier_files(values, "tmframe_sanom_", split_at=40)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream_anomalies(stream, "turns", window=20, min_n=12, k=3)
        .writeStream.format("memory")
        .queryName("sanom")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["bucket"], r["value"], r["n"], r["num"], r["den"])
        for r in spark.sql("select * from sanom").collect()
    }
    want = {
        (r["bucket"], r["value"], r["n"], r["num"], r["den"])
        for r in robust_anomalies(
            spark.read.parquet(src), "turns", window=20, min_n=12, k=3
        ).collect()
    }
    assert got == want and len(got) >= 2
    assert {v for _, v, *_ in got} >= {200, 180}  # both planted spikes flagged


def test_stream_level_shifts_bit_equal_to_batch_decided_prefix(spark):
    """stream_level_shifts: drained output == the batch operator restricted
    to rows with a FULL next window (the streaming form's documented
    trailing contract); the shift boundary's pending candidates cross the
    micro-batch split."""
    from tmframe_spark.ops.anomaly import level_shifts
    from tmframe_spark.streaming.stream import stream_level_shifts

    # regime 10 -> 40 at i=50 (file split at 55 so candidates opened around
    # the boundary are still pending when the second micro-batch arrives)
    # and a second shift 40 -> 80 at i=85, inside the last window of the
    # stream — the rows batch flags with a PARTIAL next frame live there
    values = [10] * 50 + [40] * 35 + [80] * 15
    src = _tier_files(values, "tmframe_slvl_", split_at=55)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream_level_shifts(stream, "turns", window=15, min_n=12, delta=2)
        .writeStream.format("memory")
        .queryName("slvl")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    cols = ("bucket", "value", "n_prev", "s_prev", "n_next", "s_next", "diff")
    got = {tuple(r[c] for c in cols) for r in spark.sql("select * from slvl").collect()}
    batch = level_shifts(
        spark.read.parquet(src), "turns", window=15, min_n=12, delta=2
    )
    want = {
        tuple(r[c] for c in cols)
        for r in batch.where("n_next = 15").collect()
    }
    assert got == want and len(got) >= 5
    # the last window-1 rows can never decide in the stream; batch flags
    # some of them (n_next < window) — the documented trailing difference
    assert batch.where("n_next < 15").count() > 0
