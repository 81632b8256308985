"""Golden merge test (merge_test.go:11-69 analog): deal a time-sorted frame
stream into k piles, merge the piles, and recover exactly the original
order — seeded where the reference used crypto randomness. Plus a
count-window dedup property test against a straight sequential Python port
of the reference ring algorithm (dedup.go:40-111)."""

import numpy as np

from tmframe_spark.codec.frames import evtnum_name
from tmframe_spark.ops.dedup import count_window_dedup
from tmframe_spark.ops.merge import merge_streams, with_stable_pos


def test_deal_and_merge_recovers_original(spark):
    rng = np.random.default_rng(42)
    n = 500
    ts = np.cumsum(rng.integers(0, 3, n)).tolist()  # ties included
    rows = [(int(t), i) for i, t in enumerate(ts)]  # seq = original order
    piles = [[] for _ in range(5)]
    for r in rows:
        piles[int(rng.integers(0, 5))].append(r)
    dfs = [spark.createDataFrame(p, "ts long, seq long") for p in piles if p]
    merged = merge_streams(dfs, ["ts", "seq"])
    out = with_stable_pos(merged, ["ts", "seq"]).orderBy("pos").collect()
    # golden diff: merged order == original order (ts asc, seq tiebreak)
    assert [r["seq"] for r in out] == [r[1] for r in sorted(rows, key=lambda x: (x[0], x[1]))]
    assert [r["pos"] for r in out] == list(range(len(rows)))


def python_ring_dedup(values, window):
    """Sequential transliteration of the reference algorithm."""
    present, ring, keep = {}, [None] * window, []
    for i, v in enumerate(values):
        if present.get(v, 0) > 0:
            present[v] += 1
            keep.append(False)
        else:
            present[v] = 1
            keep.append(True)
        if i >= window:
            old = ring[i % window]
            present[old] -= 1
            if present[old] == 0:
                del present[old]
        ring[i % window] = v
    return [v for v, k in zip(values, keep) if k]


def test_count_window_dedup_property_vs_python_port(spark):
    rng = np.random.default_rng(7)
    for trial in range(5):
        n = int(rng.integers(20, 300))
        window = int(rng.integers(1, 30))
        values = rng.integers(0, 12, n).tolist()
        rows = [("c", i, "u", str(v), None, i) for i, v in enumerate(values)]
        df = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, tool string, ts long",
        )
        got = [
            int(r["text"])
            for r in count_window_dedup(
                df, window, ["conv_id"], ["ts", "turn_idx"], ["text"]
            ).orderBy("turn_idx").collect()
        ]
        assert got == python_ring_dedup(values, window), (trial, n, window)


def test_evtnum_names():
    assert evtnum_name(-1) == "EvErr"
    assert evtnum_name(3) == "EvTwo64"
    # reference Evtnum.String() has no case for 16 → "Ev.16" (frame.go:448-486)
    assert evtnum_name(16) == "Ev.16"
    assert evtnum_name(-1000) == "Ev.-1000"


def test_window_one_is_adjacent_dup_removal(spark):
    # the count_window_dedup_w1 oracle's claim: at window=1 every row enters
    # the 1-slot ring, so only the immediately preceding row can mask —
    # [A,A,A] keeps one A (masked dup still drops), [A,B,A] keeps all three
    values = ["A", "A", "A", "B", "A", "A", "C", "C", "A"]
    rows = [("c", i, "u", v, None, i) for i, v in enumerate(values)]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts long",
    )
    got = [
        r["text"]
        for r in count_window_dedup(df, 1, ["conv_id"], ["ts", "turn_idx"], ["text"])
        .orderBy("turn_idx")
        .collect()
    ]
    want = [v for i, v in enumerate(values) if i == 0 or v != values[i - 1]]
    assert got == want == ["A", "B", "A", "C", "A"]
    assert got == python_ring_dedup(values, 1)
