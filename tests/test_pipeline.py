"""Flagship pipeline bit-exactness: the FramesEqual analog at engine scale.

Verifies that the DISTRIBUTED path (Spark rollup -> gap-fill -> pack_blocks
applyInPandas) produces byte-for-byte identical block frames to a fully
single-node pandas+numpy reference computed straight from the parquet file —
including after arbitrary repartitioning (block bytes must be a function of
the data, never the partitioning; SURVEY §7 'hard parts').

Also: per-turn text equality under stable (conv_id, turn_idx) ordering
(BASELINE.json input_hint invariant) and the per-turn frame encode/decode
round-trip.
"""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tmframe_spark.codec import blocks as bk
from tmframe_spark.codec import frames as fc
from tmframe_spark.codec.udfs import frame_turns, pack_blocks, unpack_blocks
from tmframe_spark.data.transcripts import load_transcripts
from tmframe_spark.ops.rollup import gap_fill, rollup, with_ts_ns


def pandas_transcripts() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    ev["turn_idx"] = ev.groupby("user_id").cumcount().astype("int32")
    role_map = {"signup": "system", "view": "user", "click": "user", "purchase": "assistant"}
    out = pd.DataFrame(
        {
            "conv_id": "conv-" + ev["user_id"].astype(str),
            "turn_idx": ev["turn_idx"],
            "role": ev["event_type"].map(lambda e: role_map.get(e, "tool")),
            "text": ev["event_type"] + " " + ev["props"],
            "tool": ev["event_type"].where(ev["event_type"].isin(["click", "purchase"])),
            "ts": ev["ts"],
        }
    )
    return out.reset_index(drop=True)


def pandas_block_oracle(t: pd.DataFrame) -> dict:
    """Single-node reference: 1m rollup + gap-fill + block encode per
    (conv_id, day). Returns {(conv_id, day): frame_bytes}."""
    t = t.copy()
    t["bucket"] = t["ts"].dt.floor("min")
    g = (
        t.groupby(["conv_id", "bucket"])
        .agg(turns=("ts", "size"), token_volume=("text", lambda s: s.str.len().sum()))
        .reset_index()
    )
    out = {}
    for conv, sub in g.groupby("conv_id"):
        spine = pd.date_range(sub["bucket"].min(), sub["bucket"].max(), freq="min")
        filled = (
            sub.set_index("bucket").reindex(spine).fillna({"turns": 0, "token_volume": 0})
        )
        filled["ts_ns"] = filled.index.astype("int64")  # ns since epoch
        filled["day"] = filled.index.floor("D")
        for day, db in filled.groupby("day"):
            ts = db["ts_ns"].to_numpy(np.int64)
            v0 = db["token_volume"].to_numpy(np.float64)
            v1 = db["turns"].to_numpy(np.int64)
            block = bk.encode_block(ts, v0, v1)
            fr = fc.make_frames([int(ts[0])], [fc.EV_BLOCK], data=[block])
            out[(conv, day.to_pydatetime().replace(tzinfo=None))] = fc.marshal_frames(fr)
    return out


def test_distributed_blocks_bit_exact_vs_single_node(spark):
    t = with_ts_ns(load_transcripts(spark, SF_DIR))
    m = gap_fill(rollup(t, "1m"), "1m")
    pts = m.select(
        "conv_id",
        F.date_trunc("day", "bucket").alias("day"),
        F.expr("(unix_micros(cast(bucket as timestamp)) * 1000) & -8").alias("ts_ns"),
        F.col("token_volume").cast("double").alias("v0"),
        F.col("turns").cast("long").alias("v1"),
    ).repartition(17)  # deliberately weird partitioning: must not matter
    blocks = {
        (r["conv_id"], r["day"]): bytes(r["frame"])
        for r in pack_blocks(pts, ["conv_id", "day"], v0="v0", v1="v1").collect()
    }
    oracle = pandas_block_oracle(pandas_transcripts())
    assert set(blocks.keys()) == set(oracle.keys())
    mismatches = [k for k in oracle if blocks[k] != oracle[k]]
    assert not mismatches, f"{len(mismatches)} non-bit-exact blocks, e.g. {mismatches[:3]}"


def test_per_turn_text_equality_stable_order(spark):
    s = (
        load_transcripts(spark, SF_DIR)
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .toPandas()
    )
    p = pandas_transcripts().sort_values(["conv_id", "turn_idx"], kind="mergesort")
    assert (s["text"].to_numpy() == p["text"].to_numpy()).all()
    assert (s["conv_id"].to_numpy() == p["conv_id"].to_numpy()).all()


def test_frame_turns_roundtrip(spark):
    t = with_ts_ns(load_transcripts(spark, SF_DIR)).limit(500)
    fr = frame_turns(t)
    rows = fr.select("conv_id", "turn_idx", "role", "tool", "text", "ts_ns", "frame").collect()
    for r in rows:
        dec = fc.unmarshal_frames(bytes(r["frame"]))
        assert int(fc.get_evtnum(dec.prim, dec.ude)[0]) == fc.EV_TURN
        assert int(fc.tm_ns(dec.prim)[0]) == r["ts_ns"] & ~7
        role, tool, text = dec.data[0].decode("utf-8").split("\x1f")
        assert role == r["role"] and text == r["text"]
        assert tool == (r["tool"] or "")


def test_unpack_inverts_pack_after_shuffle(spark):
    t = with_ts_ns(load_transcripts(spark, SF_DIR))
    m = gap_fill(rollup(t, "1m"), "1m")
    pts = m.select(
        "conv_id",
        F.date_trunc("day", "bucket").alias("day"),
        F.expr("(unix_micros(cast(bucket as timestamp)) * 1000) & -8").alias("ts_ns"),
        F.col("token_volume").cast("double").alias("v0"),
        F.col("turns").cast("long").alias("v1"),
    )
    blocks = pack_blocks(pts, ["conv_id", "day"], v0="v0", v1="v1").repartition(7)
    dec = unpack_blocks(blocks, ["conv_id", "day"], v0="v0", v1="v1")
    a = pts.select("conv_id", "ts_ns", "v0", "v1").orderBy("conv_id", "ts_ns").toPandas()
    b = dec.select("conv_id", "ts_ns", "v0", "v1").orderBy("conv_id", "ts_ns").toPandas()
    assert len(a) == len(b)
    assert (a["ts_ns"].values == b["ts_ns"].values).all()
    assert (a["v0"].to_numpy().view(np.uint64) == b["v0"].to_numpy().view(np.uint64)).all()
    assert (a["v1"].values == b["v1"].values).all()


def test_lttb_downsample_properties(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from tmframe_spark.ops.rollup import lttb_downsample

    # a V-shaped series with a sharp spike: LTTB must keep endpoints and
    # the spike (it maximizes triangle area in its bucket)
    n = 1000
    vals = [abs(i - 500) for i in range(n)]
    vals[333] = 5000  # spike
    rows = [("c0", i * 60_000_000_000, int(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "conv_id string, ts_ns long, v long")
    out = lttb_downsample(df, 50).orderBy("ts_ns").collect()
    assert len(out) == 50
    ts = [r["ts_ns"] for r in out]
    assert ts[0] == 0 and ts[-1] == (n - 1) * 60_000_000_000  # endpoints kept
    assert ts == sorted(ts)
    assert any(r["v"] == 5000 for r in out), "spike lost"
    # fewer points than buckets -> identity
    small = lttb_downsample(df.limit(10), 50).count()
    assert small == 10


def test_distinct_sketch_cascade_is_lossless_and_exact(spark):
    """The HLL distinct tier must (a) re-aggregate: cascaded 1m->1h->1d
    estimates equal sketches built directly from raw turns at each tier,
    and (b) be EXACT at transcript key cardinalities (coupon mode), so
    every estimate equals countDistinct. NULL keys are skipped; all-NULL
    buckets report 0."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR
    from tmframe_spark.data.transcripts import load_transcripts
    from tmframe_spark.ops.rollup import cascade_distinct_up, rollup_distinct_sketch

    t = load_transcripts(spark, SF_DIR)
    m = rollup_distinct_sketch(t, "1m", key_col="tool")
    h = cascade_distinct_up(m, "1h")
    d = cascade_distinct_up(h, "1d")

    def est(df):
        return {
            (r["conv_id"], r["bucket"]): r["distinct_est"] for r in df.collect()
        }

    # (a) lossless merge: cascaded == direct at both coarser tiers
    for tier, casc in [("1h", h), ("1d", d)]:
        direct = est(rollup_distinct_sketch(t, tier, key_col="tool"))
        assert est(casc) == direct, f"cascaded {tier} != direct sketch"

    # (b) exact at tool cardinality: estimate == true countDistinct
    truth = {
        (r["conv_id"], r["bucket"]): r["n"]
        for r in t.groupBy(
            "conv_id", F.date_trunc("day", "ts").alias("bucket")
        ).agg(F.count_distinct("tool").alias("n")).collect()
    }
    got = est(d)
    assert got == truth
    assert 0 in got.values() or all(v > 0 for v in truth.values())


def test_histogram_cascade_and_quantile(spark):
    """The log2 histogram tier must (a) re-aggregate: cascaded 1m->1h bins
    equal a histogram built directly from raw turns; (b) partition counts:
    the bins of each row sum to the row's turn count; (c) read quantiles by
    the exact integer rank rule, with NULL on all-zero (gap-filled) rows
    and correct bin edges ([2^(i-1), 2^i), value 0 in bin 0, open tail)."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR
    from tmframe_spark.data.transcripts import load_transcripts
    from tmframe_spark.ops.rollup import (
        cascade_histogram_up,
        hist_cols,
        histogram_quantile,
        rollup,
        rollup_histogram,
    )

    t = load_transcripts(spark, SF_DIR)
    hs = hist_cols()

    def rows(df):
        return {
            (r["conv_id"], r["bucket"]): tuple(r[c] for c in hs)
            for r in df.collect()
        }

    casc = cascade_histogram_up(rollup_histogram(t, "1m"), "1h")
    direct = rows(rollup_histogram(t, "1h"))
    assert rows(casc) == direct and len(direct) > 0

    # bins partition the turn count
    turns = {
        (r["conv_id"], r["bucket"]): r["turns"]
        for r in rollup(t, "1h").collect()
    }
    assert {k: sum(v) for k, v in direct.items()} == turns

    # bin edges on synthetic per-turn text lengths: 0 -> h00, 1 -> h01,
    # 2,3 -> h02, 16384 -> h15 (open tail)
    import datetime

    ts0 = datetime.datetime(2024, 1, 1, 0, 0, 30)
    tiny = spark.createDataFrame(
        [("c", i, "user", "x" * n, None, ts0) for i, n in enumerate([0, 1, 2, 3, 16384])],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    (row,) = rollup_histogram(tiny, "1m").collect()
    got = {c: row[c] for c in hs if row[c]}
    assert got == {"h00": 1, "h01": 1, "h02": 2, "h15": 1}

    # quantile rank rule on a hand-built histogram: counts 2/3/5 in bins
    # 0/1/2 -> p50 rank ceil(5.0)=5 lands at cum(h00..h01)=5 -> bin 1 lo 1;
    # p95 rank ceil(9.5)=10 -> bin 2 lo 2; the zero row reads NULL
    manual = spark.createDataFrame(
        [tuple([2, 3, 5] + [0] * 13), tuple([0] * 16)],
        ", ".join(f"{c} long" for c in hs),
    )
    q = histogram_quantile(histogram_quantile(manual, 50, 100, out="p50"), 95, 100, out="p95")
    got_q = {
        tuple(r[c] for c in ("p50_bin", "p50_lo", "p95_bin", "p95_lo"))
        for r in q.collect()
    }
    assert got_q == {(1, 1, 2, 2), (None, None, None, None)}


def test_custom_tier_cascade_and_validation(spark):
    """Custom fixed-step tiers: 5m buckets cascade EXACTLY into the named
    1h tier (sum re-aggregation is tier-agnostic); malformed or
    non-day-dividing steps fail loudly."""
    import pytest
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR
    from tmframe_spark.data.transcripts import load_transcripts
    from tmframe_spark.ops.rollup import cascade_up, rollup

    t = load_transcripts(spark, SF_DIR)

    def rows(df):
        return {
            (r["conv_id"], r["b"]): tuple(r[c] for c in ("turns", "token_volume"))
            for r in df.select(
                "conv_id",
                F.expr("unix_micros(cast(bucket as timestamp))").alias("b"),
                "turns",
                "token_volume",
            ).collect()
        }

    via_5m = rows(cascade_up(rollup(t, "5m"), "1h"))
    direct = rows(rollup(t, "1h"))
    assert via_5m == direct and len(direct) > 0
    with pytest.raises(ValueError, match="evenly divide"):
        rollup(t, "7m").collect()
    with pytest.raises(KeyError, match="unknown tier"):
        rollup(t, "2w").collect()
