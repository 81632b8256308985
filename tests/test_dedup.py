"""Dedup semantics tests — incl. the reference's masked-duplicate scenario
(dedup.go:75-88) and the amplified-stream golden test (dedup_test.go:10-65,
but seeded/deterministic where the reference used crypto randomness)."""

import numpy as np


from tmframe_spark.ops.dedup import count_window_dedup, dup_counts, hash_dedup


def _df(spark, values, conv="c0"):
    rows = [(conv, i, "user", str(v), None, i * 1000) for i, v in enumerate(values)]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts long"
    )


def run_window_dedup(spark, values, window):
    out = count_window_dedup(
        _df(spark, values), window_size=window, by=["conv_id"],
        order_cols=["ts", "turn_idx"], hash_cols=["text"],
    )
    return [int(r["text"]) for r in out.orderBy("turn_idx").collect()]


def test_masked_duplicate_scenario(spark):
    # dedup.go:79-88: values [1 2 1 3 1], window 3. Without refcounting the
    # dup at index 4 would be missed when index 0 rolls out. All three 1s
    # collapse to one.
    assert run_window_dedup(spark, [1, 2, 1, 3, 1], 3) == [1, 2, 3]


def test_window_expiry_allows_reappearance(spark):
    # window 2: the second 1 at index 3 is OUTSIDE the window of the first
    # (entries rolled off), so it is kept again
    assert run_window_dedup(spark, [1, 2, 3, 1], 2) == [1, 2, 3, 1]


def test_adjacent_dups_drop(spark):
    assert run_window_dedup(spark, [7, 7, 7, 8, 8, 9], 10) == [7, 8, 9]


def test_amplified_stream_recovers_original(spark):
    # dedup_test.go analog: amplify a stream 4x with duplicates; dedup with a
    # full-size window recovers the original exactly (golden diff)
    rng = np.random.default_rng(42)
    orig = list(rng.integers(0, 10**9, 200))
    amplified = []
    for v in orig:
        amplified.extend([v] * int(rng.integers(1, 5)))
    assert run_window_dedup(spark, amplified, len(amplified)) == orig


def test_single_conversation_spans_many_arrow_batches(spark):
    # bounded-memory contract: ONE conversation much larger than
    # maxRecordsPerBatch must stream through the mapInPandas carry state
    # (ring + refcount) with identical semantics to the single-batch path.
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        rng = np.random.default_rng(7)
        vals = list(rng.integers(0, 50, 5000))  # heavy duplication, window 40
        got = run_window_dedup(spark, vals, 40)
        # single-node oracle: the reference ring+refcount algorithm in python
        ring, refcount, keep = [None] * 40, {}, []
        for i, v in enumerate(vals):
            if refcount.get(v, 0) > 0:
                refcount[v] += 1
            else:
                refcount[v] = 1
                keep.append(int(v))
            if i >= 40:
                old_v = ring[i % 40]
                refcount[old_v] -= 1
                if refcount[old_v] == 0:
                    del refcount[old_v]
            ring[i % 40] = v
        assert got == keep
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_multiple_groups_within_and_across_batches(spark):
    # group boundaries mid-batch AND across batch boundaries both reset state
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "8")
    try:
        rows = []
        for ci in range(6):
            for i in range(30):
                rows.append((f"c{ci}", i, "user", str(i % 3), None, i * 1000))
        df = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, tool string, ts long",
        )  # hash-partitioning co-locates several groups per task carry state
        out = count_window_dedup(
            df, window_size=100, by=["conv_id"],
            order_cols=["ts", "turn_idx"], hash_cols=["text"],
        )
        got = sorted((r["conv_id"], r["turn_idx"]) for r in out.collect())
        want = sorted((f"c{ci}", i) for ci in range(6) for i in range(3))
        assert got == want
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def _ring_oracle(vals, window):
    """The reference algorithm (dedup.go:40-111), straight-line python."""
    ring, refcount, keep = [None] * window, {}, []
    for i, v in enumerate(vals):
        if refcount.get(v, 0) > 0:
            refcount[v] += 1
            keep.append(False)
        else:
            refcount[v] = 1
            keep.append(True)
        if i >= window:
            old = ring[i % window]
            refcount[old] -= 1
            if refcount[old] == 0:
                del refcount[old]
        ring[i % window] = v
    return [v for v, k in zip(vals, keep) if k]


def test_count_window_dedup_property(spark):
    # randomized cross-check of the distributed implementation against the
    # sequential reference, across window sizes and duplication rates
    rng = np.random.default_rng(3)
    for trial in range(6):
        n = int(rng.integers(50, 400))
        card = int(rng.integers(2, 30))
        window = int(rng.integers(1, 60))
        vals = [int(x) for x in rng.integers(0, card, n)]
        assert run_window_dedup(spark, vals, window) == _ring_oracle(vals, window), (
            n, card, window,
        )


def test_global_stream_mode_matches_sequential_reference(spark):
    """by=[] is the FAITHFUL mode: the reference dedups the whole merged
    stream, not per series (dedup.go:31-122) — interleaved conversations
    must share one window, so a duplicate ACROSS conversations drops. The
    result must equal the sequential ring oracle over the global order."""
    rng = np.random.default_rng(9)
    rows = []
    for i in range(300):
        # interleave 4 conversations; texts collide across conversations
        rows.append((f"c{i % 4}", i, "user", str(int(rng.integers(0, 12))), None, i * 1000))
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts long",
    )
    out = count_window_dedup(
        df, window_size=20, by=[], order_cols=["ts", "turn_idx"], hash_cols=["text"]
    )
    got = [r["text"] for r in out.orderBy("ts", "turn_idx").collect()]
    want = _ring_oracle([r[3] for r in rows], 20)
    assert got == want
    assert "_g" not in out.columns  # the constant group tag never leaks
    # per-series mode on the same data keeps MORE rows (windows don't share)
    per_series = count_window_dedup(
        df, window_size=20, by=["conv_id"], order_cols=["ts", "turn_idx"],
        hash_cols=["text"],
    )
    assert per_series.count() >= len(got)


def test_dups_side_output_complements_kept(spark):
    vals = [1, 2, 1, 3, 1, 2, 2, 4]
    df = _df(spark, vals)
    kw = dict(window_size=3, by=["conv_id"], order_cols=["ts", "turn_idx"],
              hash_cols=["text"])
    kept = {r["turn_idx"] for r in count_window_dedup(df, emit="kept", **kw).collect()}
    dups = {r["turn_idx"] for r in count_window_dedup(df, emit="dups", **kw).collect()}
    assert kept | dups == set(range(len(vals))) and not (kept & dups)
    # dups are exactly the reference's dupsW side channel
    oracle_kept = _ring_oracle(vals, 3)
    assert len(kept) == len(oracle_kept)


def test_hash_dedup_and_counts(spark):
    df = _df(spark, [5, 6, 5, 7, 6, 5])
    kept = hash_dedup(df, ["text"], ["ts", "turn_idx"])
    assert sorted(int(r["text"]) for r in kept.collect()) == [5, 6, 7]
    # first occurrence wins
    assert sorted(r["turn_idx"] for r in kept.collect()) == [0, 1, 3]
    dc = {r["text"]: r["occurrences"] for r in dup_counts(df, ["text"]).collect()}
    assert dc == {"5": 3, "6": 2}


def test_has_window_dups_detect_only(spark):
    """tfdedup detectOnly (dedup.go:26-31): boolean sweep for any in-window
    duplicate, nothing written."""
    from tmframe_spark.ops.dedup import has_window_dups

    kw = dict(window_size=3, by=["conv_id"], order_cols=["ts", "turn_idx"],
              hash_cols=["text"])
    assert has_window_dups(_df(spark, [1, 2, 1, 3]), **kw) is True
    assert has_window_dups(_df(spark, [1, 2, 3, 4]), **kw) is False
    # a dup farther apart than the window is NOT an in-window duplicate
    assert has_window_dups(_df(spark, [1, 2, 3, 4, 1]), **kw) is False
