"""Spark-side codec: Arrow-vectorized pandas UDFs around the numpy codec.

The distributed encode path packs each (key..., bucket) group of rolled-up
points into ONE compressed TMFRAME block framed as an EvUDE record with the
user evtnum EV_BLOCK, stored as a BinaryType cell — the columnar analog of
the reference's frame stream files (/root/reference/writer.go,
archiver/filemgr.go:94-104 date-partitioned layout).

Bit-exactness across partitioning: block contents are sorted by
(ts_ns, seq) *inside* the UDF, so the encoded bytes are a deterministic
function of the group's row set, never of Spark partitioning or arrival
order. Verified in tests by encoding after arbitrary repartition() and
comparing against the single-node numpy oracle byte-for-byte.

All UDFs are Arrow-batched (applyInPandas / mapInPandas); no per-row Python.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

from tmframe_spark.codec.blocks import (
    decode_block,
    encode_block,
    encode_block_gapfilled,
    encode_blocks_gapfilled_batch,
)
from tmframe_spark.codec.frames import (
    EV_BLOCK,
    frame_num_bytes,
    get_evtnum,
    make_frames,
    marshal_frames,
    unmarshal_frames,
)


def _key_fields(df: DataFrame, keys: list[str]) -> list[StructField]:
    by_name = {f.name: f for f in df.schema.fields}
    return [by_name[k] for k in keys]


def bucket_ts_ns(col: str = "bucket"):
    """The engine's ONE bucket->wire-timestamp projection: epoch ns of the
    bucket boundary, 8ns-truncated (the Tm contract, frame.go:88-114).
    Every path that packs or compares rollup buckets as block timestamps
    must use this expression — streamed blocks stay byte-identical to
    batch packs only while all writers agree on it bit-for-bit."""
    return F.expr(f"(unix_micros(cast({col} as timestamp)) * 1000) & -8")


def pack_blocks(
    df: DataFrame,
    keys: list[str],
    ts_ns: str = "ts_ns",
    v0: str | None = None,
    v1: str | None = None,
    seq: str | None = None,
) -> DataFrame:
    """Pack point rows into one framed, compressed block per key group.

    Returns one row per group: keys..., n_points, ts_first, ts_last,
    raw_nbytes (pre-compression TMFRAME wire cost floor), frame (binary:
    the marshalled EV_BLOCK UDE frame whose payload is the compressed
    block).

    Plan shape: repartition(keys) + sortWithinPartitions(keys, ts, seq) +
    a *streaming* mapInPandas group packer (pandas work per Arrow batch,
    not per group; groups spanning batches are buffered). This is ~10x
    faster than groupBy().applyInPandas() for small groups — the per-group
    pandas DataFrame construction dominates there — while keeping identical
    group semantics (hash partition on the full key co-locates groups) and
    identical bytes (rows sorted by (ts, seq) inside each group).
    """
    out_schema = StructType(
        _key_fields(df, keys)
        + [
            StructField("n_points", LongType()),
            StructField("ts_first", LongType()),
            StructField("ts_last", LongType()),
            StructField("raw_nbytes", LongType()),
            StructField("frame", BinaryType()),
        ]
    )
    has_v0, has_v1 = v0 is not None, v1 is not None
    # wire cost floor per point if stored as individual frames:
    # Two64=24B, OneFloat64/OneInt64=16B, Zero=8B (frame.go:185-212)
    per_point_raw = 8 + (8 if has_v0 else 0) + (8 if has_v1 else 0)
    sort_cols = list(keys) + [ts_ns] + ([seq] if seq else [])

    def emit(pdf: pd.DataFrame, starts: np.ndarray, ends: np.ndarray) -> pd.DataFrame:
        ts_all = pdf[ts_ns].to_numpy(np.int64)
        a0_all = pdf[v0].to_numpy(np.float64) if has_v0 else None
        a1_all = pdf[v1].to_numpy(np.int64) if has_v1 else None
        out = {k: pdf[k].to_numpy()[starts] for k in keys}
        n_points, ts_first, ts_last, frames_out = [], [], [], []
        for s, e in zip(starts.tolist(), ends.tolist()):
            ts = ts_all[s:e]
            block = encode_block(
                ts,
                a0_all[s:e] if has_v0 else None,
                a1_all[s:e] if has_v1 else None,
            )
            fr = make_frames([int(ts[0])], [EV_BLOCK], data=[block])
            frames_out.append(marshal_frames(fr))
            n_points.append(e - s)
            ts_first.append(int(ts[0]))
            ts_last.append(int(ts[-1]))
        out.update(
            n_points=n_points,
            ts_first=ts_first,
            ts_last=ts_last,
            raw_nbytes=[per_point_raw * n for n in n_points],
            frame=frames_out,
        )
        return pd.DataFrame(out)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # streaming group packer: rows arrive sorted by (keys..., ts, seq)
        # within the partition; groups spanning Arrow batches are buffered.
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            kdf = pdf[list(keys)]
            # null-safe: NaN != NaN in pandas, so a plain ne() would split a
            # null-keyed group into one block per point
            prev = kdf.shift()
            change = (
                (~((kdf == prev) | (kdf.isna() & prev.isna()))).any(axis=1).to_numpy()
            )
            change[0] = True
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], len(pdf))
            # last group may continue in the next batch — hold it back
            carry = pdf.iloc[starts[-1] :].reset_index(drop=True)
            if len(starts) > 1:
                yield emit(pdf, starts[:-1], ends[:-1])
        if carry is not None and len(carry):
            yield emit(carry, np.array([0]), np.array([len(carry)]))

    # explicit partition count: AQE would coalesce this exchange by BYTE
    # size, but the downstream cost is Python work per GROUP — a handful of
    # coalesced partitions would serialize the pack stage (measured: the 1d
    # tier anti-scaled 9s -> 16s going 4 -> 16 cores before this pin).
    # r7: the pin is scale-adaptive (ops.sizing) — a fixed 64 costs ~15 ms
    # of Python-worker round-trip per task, which dominates small inputs.
    from tmframe_spark.ops.sizing import cpu_stage_partitions

    part = df.repartition(
        cpu_stage_partitions(df), *[F.col(k) for k in keys]
    ).sortWithinPartitions(*sort_cols)
    return part.mapInPandas(fn, out_schema)


#: tier -> bucket step in nanoseconds
TIER_STEP_NS = {"1m": 60_000_000_000, "1h": 3_600_000_000_000, "1d": 86_400_000_000_000}
#: block group unit per tier -> numpy datetime64 trunc code
GROUP_UNIT_CODE = {"day": "D", "month": "M", "year": "Y"}


def tier_step_ns(tier: str) -> int:
    """Bucket step in ns for named AND custom fixed-step tiers ('5m',
    '30s', ... — ops/rollup._custom_tier enforces the divides-one-day rule,
    which is exactly what keeps day/month/year block group boundaries
    step-aligned here)."""
    if tier in TIER_STEP_NS:
        return TIER_STEP_NS[tier]
    from tmframe_spark.ops.rollup import tier_step_seconds

    return tier_step_seconds(tier) * 1_000_000_000


def pack_rollup_blocks(
    rolled: DataFrame,
    tier: str,
    group_unit: str = "day",
    v0: str = "token_volume",
    v1: str = "turns",
    split_dense_rows: int | None = None,
) -> DataFrame:
    """Fused gap-fill + block-pack: the flagship's scale path.

    Takes the *data-sized* rollup (one row per non-empty (conv, bucket)) and
    synthesizes each conversation's zero-filled bucket spine INSIDE the UDF
    (numpy arange + scatter), then encodes one block per (conv, group_unit)
    — including all-zero blocks for empty days within the conv's lifespan.

    Produces byte-identical blocks to gap_fill() -> pack_blocks() (asserted
    in tests), but the shuffle carries only data rows: at a sparse
    10^12-turn table the spine is easily 100x the data, so this is the
    difference between shuffling 100 TB and shuffling 1 TB. The spine only
    ever exists as a numpy array inside one executor task, bounded by the
    conv's retention window.

    Skew note: by default one conversation packs in one task (blocks need
    the conv's global [first, last] span), so the hot conversation is the
    stage's potential straggler — but its cost is CALENDAR-bounded, not
    data-bounded: a fully dense conv-year at 1m is 525k spine points,
    ~0.35 s at the measured dense-encode rate, so even a decade-long
    always-active conversation costs ~3.5 s serial (coarser tiers
    proportionally less).

    ``split_dense_rows`` enables the finer (conv, calendar-chunk) pack for
    deployments where that straggler matters: conversations holding MORE
    than this many rollup rows are re-keyed by (conv, block calendar
    group), so the hot conversation's blocks pack in parallel — one task
    per calendar group — while every other conversation keeps the one-pass
    path. The byte output is UNCHANGED (asserted in tests) because block
    boundaries are already calendar-aligned; a block only needs the conv's
    global span, which a skew-safe pre-aggregation (map-side-combined
    min/max/count per conv) supplies via a broadcast join — dense convs
    are by definition few (straggler conversations), so the span table
    broadcast is small. Empty calendar periods inside a dense conv's span
    still produce their all-zero blocks via a per-conv chunk spine
    anti-joined against the chunks that hold data. Cost: one extra
    aggregation pass over the rollup + a second (dense-rows-only) shuffle
    — pay it when the straggler dominates, not by default.
    """
    # the wire contract is UTC end to end: bucket_ts_ns casts through the
    # SESSION timezone while the block/group arithmetic (numpy datetime64,
    # and the split path's chunk date_trunc) is UTC — a non-UTC session
    # would silently skew epochs against calendar boundaries (and in the
    # split path scatter block-local indices out of range), so fail loudly
    # instead (round-5 review finding #2)
    tz = rolled.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
        raise ValueError(
            f"pack_rollup_blocks requires spark.sql.session.timeZone=UTC "
            f"(the engine's wire contract; session has {tz!r})"
        )
    step = tier_step_ns(tier)
    unit = GROUP_UNIT_CODE[group_unit]
    out_schema = StructType(
        [
            rolled.schema["conv_id"],
            StructField("grp", rolled.schema["bucket"].dataType),
            StructField("n_points", LongType()),
            StructField("ts_first", LongType()),
            StructField("ts_last", LongType()),
            StructField("raw_nbytes", LongType()),
            StructField("frame", BinaryType()),
        ]
    )
    pts = rolled.select(
        "conv_id",
        bucket_ts_ns().alias("_ts"),
        F.col(v0).cast("double").alias("_v0"),
        F.col(v1).cast("long").alias("_v1"),
    )

    DAY_NS = 86_400_000_000_000

    def pack_conv(conv, ts, a0, a1):
        # O(data) pack: block boundaries arithmetically, spine never built.
        t0, t_last = int(ts[0]), int(ts[-1])
        n_total = (t_last - t0) // step + 1
        if unit == "D":
            d0, dl = t0 // DAY_NS, t_last // DAY_NS
            grp_starts = np.arange(d0, dl + 1, dtype=np.int64) * DAY_NS
        else:  # month/year starts via datetime64 on a tiny array
            lo, hi = np.array([t0, t_last], dtype="datetime64[ns]").astype(
                f"datetime64[{unit}]"
            )
            grp_starts = (
                np.arange(lo, hi + 1).astype("datetime64[ns]").astype(np.int64)
            )
        # first spine index of each group (group starts are step-aligned and
        # t0 is bucket-aligned, so the division is exact)
        starts = np.maximum((grp_starts - t0) // step, 0)
        ends = np.append(starts[1:], n_total)
        data_pos = (ts - t0) // step
        nb = len(starts)
        block_t0s_arr = t0 + starts * step
        block_t0s = block_t0s_arr.tolist()
        if len(ts) <= 400 * nb:
            # whole-conv batch encode: per-point block id + block-local
            # slot, then ONE vectorized pass over all of the conv's blocks
            # (byte-equal to the per-block encoder — the 4x soak-scale win
            # is amortizing the per-block numpy ceremony across the conv)
            bids = np.searchsorted(starts, data_pos, side="right") - 1
            local = data_pos - starts[bids]
            blocks = encode_blocks_gapfilled_batch(
                block_t0s_arr, step, ends - starts, bids, local, a0, a1
            )
        else:
            # dense conv (>~400 data rows per block, e.g. the hot salted
            # conversation at fine tiers): per-block whole-array encode
            # beats the keyed-segmented pass (measured crossover ~400)
            bounds = np.append(np.searchsorted(data_pos, starts), len(ts))
            blocks = [
                encode_block_gapfilled(
                    block_t0s[bi],
                    step,
                    int(ends[bi] - starts[bi]),
                    data_pos[bounds[bi] : bounds[bi + 1]] - int(starts[bi]),
                    a0[bounds[bi] : bounds[bi + 1]],
                    a1[bounds[bi] : bounds[bi + 1]],
                )
                for bi in range(nb)
            ]
        # marshal the conv's blocks as ONE frame batch (per-frame numpy
        # ceremony amortized), then slice the stream back into rows
        fr = make_frames(block_t0s, [EV_BLOCK] * nb, data=blocks)
        wire = marshal_frames(fr)
        sizes = frame_num_bytes(fr.prim, fr.ude)
        offs = np.zeros(nb, dtype=np.int64)
        np.cumsum(sizes[:-1], out=offs[1:])
        grp_us = (grp_starts // 1000).astype("datetime64[us]")
        ends_i = ends.astype(np.int64)
        starts_i = starts.astype(np.int64)
        return [
            (
                conv,
                grp_us[bi],
                int(ends_i[bi] - starts_i[bi]),
                block_t0s[bi],
                t0 + (int(ends_i[bi]) - 1) * step,
                24 * int(ends_i[bi] - starts_i[bi]),
                wire[int(offs[bi]) : int(offs[bi] + sizes[bi])],
            )
            for bi in range(nb)
        ]

    cols = ["conv_id", "grp", "n_points", "ts_first", "ts_last", "raw_nbytes", "frame"]

    def pack_many(conv, ts, a0, a1, cstarts, cends) -> pd.DataFrame:
        """ALL closed conversations of one Arrow batch in ONE vectorized
        encode (r7). encode_blocks_gapfilled_batch is per-block independent
        (its only sequential piece, the Gorilla window scan, resets at
        every block boundary), so nothing ties one call to one
        conversation — and at rehearsal scale the per-conv numpy ceremony
        WAS the pack stage (measured: 1,500 convs x ~1.8 ms/conv = 2.4 s
        serial, ~7 _scatter_bits calls per conv instead of per batch).
        Block ids are assigned arithmetically (a data row's block is its
        calendar group index minus the conv's first group — no per-conv
        searchsorted), and the >400-rows-per-block dense route keeps the
        per-conv whole-array encoder, exactly as before. Bytes are
        asserted identical to gap_fill->pack_blocks by tests/test_pack_fused.

        conv: per-row conv ids (only rows < cstarts[-1] used); ts/a0/a1:
        CLOSED rows only; cstarts/cends: row ranges of the closed convs."""
        counts = (cends - cstarts).astype(np.int64)
        firsts = ts[cstarts]
        lasts = ts[cends - 1]
        if unit == "D":
            g_first = firsts // DAY_NS
            g_last = lasts // DAY_NS
        else:
            g_first = (
                firsts.astype("datetime64[ns]")
                .astype(f"datetime64[{unit}]")
                .astype(np.int64)
            )
            g_last = (
                lasts.astype("datetime64[ns]")
                .astype(f"datetime64[{unit}]")
                .astype(np.int64)
            )
        nb_c = g_last - g_first + 1
        conv_vals = conv[cstarts]
        extra_rows: list = []
        dense = counts > 400 * nb_c
        if dense.any():
            for ci in np.flatnonzero(dense).tolist():
                s, e = int(cstarts[ci]), int(cends[ci])
                extra_rows.extend(pack_conv(conv[s], ts[s:e], a0[s:e], a1[s:e]))
            keep = ~dense
            sel = np.flatnonzero(np.repeat(keep, counts))
            ts, a0, a1 = ts[sel], a0[sel], a1[sel]
            conv_vals = conv_vals[keep]
            counts, firsts, lasts = counts[keep], firsts[keep], lasts[keep]
            g_first, nb_c = g_first[keep], nb_c[keep]
        C = len(counts)
        if C == 0:
            out = pd.DataFrame(extra_rows, columns=cols)
            out["grp"] = pd.to_datetime(out["grp"])
            return out
        B = int(nb_c.sum())
        blk_cum = np.cumsum(nb_c)
        blk_first = blk_cum - nb_c
        blk_conv = np.repeat(np.arange(C), nb_c)
        blk_g = g_first[blk_conv] + (np.arange(B) - blk_first[blk_conv])
        if unit == "D":
            grp_starts = blk_g * DAY_NS
        else:
            grp_starts = (
                blk_g.astype(f"datetime64[{unit}]")
                .astype("datetime64[ns]")
                .astype(np.int64)
            )
        t0_b = firsts[blk_conv]
        starts_b = np.maximum((grp_starts - t0_b) // step, 0)
        n_total = (lasts - firsts) // step + 1
        ends_b = np.empty(B, dtype=np.int64)
        ends_b[: B - 1] = starts_b[1:]
        ends_b[blk_cum - 1] = n_total
        ns_b = ends_b - starts_b
        row_cid = np.repeat(np.arange(C), counts)
        data_pos = (ts - firsts[row_cid]) // step
        if unit == "D":
            row_g = ts // DAY_NS
        else:
            row_g = (
                ts.astype("datetime64[ns]")
                .astype(f"datetime64[{unit}]")
                .astype(np.int64)
            )
        row_blk = blk_first[row_cid] + (row_g - g_first[row_cid])
        local = data_pos - starts_b[row_blk]
        block_t0s = t0_b + starts_b * step
        blocks = encode_blocks_gapfilled_batch(
            block_t0s, step, ns_b, row_blk, local, a0, a1
        )
        fr = make_frames(block_t0s.tolist(), [EV_BLOCK] * B, data=blocks)
        wire = marshal_frames(fr)
        sizes = frame_num_bytes(fr.prim, fr.ude)
        offs = np.zeros(B, dtype=np.int64)
        np.cumsum(sizes[:-1], out=offs[1:])
        bs, sz = offs.tolist(), sizes.tolist()
        out = pd.DataFrame(
            {
                "conv_id": np.repeat(conv_vals, nb_c),
                "grp": pd.to_datetime((grp_starts // 1000).astype("datetime64[us]")),
                "n_points": ns_b,
                "ts_first": block_t0s,
                "ts_last": t0_b + (ends_b - 1) * step,
                "raw_nbytes": 24 * ns_b,
                "frame": [wire[bs[b] : bs[b] + sz[b]] for b in range(B)],
            }
        )
        if extra_rows:
            extra = pd.DataFrame(extra_rows, columns=cols)
            extra["grp"] = pd.to_datetime(extra["grp"])
            out = pd.concat([out, extra], ignore_index=True)
        return out

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # carry = the open (possibly batch-spanning) conversation's ROLLUP
        # rows — data-sized and bounded by calendar (a Y-year conversation
        # holds at most Y*525k 1m rows, and proportionally fewer at coarser
        # tiers), never the gap-filled spine, which only exists as numpy
        # arrays inside pack_conv one block at a time. Guarded by the
        # decade-long-conversation test in tests/test_pack_fused.py.
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            conv = pdf["conv_id"].to_numpy()
            change = np.empty(len(conv), dtype=bool)
            change[0] = True
            np.not_equal(conv[1:], conv[:-1], out=change[1:])
            starts = np.flatnonzero(change)
            carry = pdf.iloc[starts[-1] :].reset_index(drop=True)
            if len(starts) == 1:
                continue
            ts = pdf["_ts"].to_numpy(np.int64)
            a0 = pdf["_v0"].to_numpy(np.float64)
            a1 = pdf["_v1"].to_numpy(np.int64)
            ncl = int(starts[-1])  # closed rows: everything before the carry
            yield pack_many(
                conv, ts[:ncl], a0[:ncl], a1[:ncl], starts[:-1], starts[1:]
            )
        if carry is not None and len(carry):
            out = pd.DataFrame(
                pack_conv(
                    carry["conv_id"].iloc[0],
                    carry["_ts"].to_numpy(np.int64),
                    carry["_v0"].to_numpy(np.float64),
                    carry["_v1"].to_numpy(np.int64),
                ),
                columns=cols,
            )
            out["grp"] = pd.to_datetime(out["grp"])
            yield out

    # explicit partition count — see pack_blocks: the pack cost is Python
    # work per conversation, not bytes; AQE byte-based coalescing must not
    # shrink this exchange. r7: scale-adaptive pin (ops.sizing) — measured
    # 1.3 s at a fixed 64 vs 0.5 s at the derived ~7 on the sf0.1 1m tier,
    # pure per-task Python-worker overhead.
    from tmframe_spark.ops.sizing import cpu_stage_partitions

    n_part = int(rolled.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if split_dense_rows is None:
        part = pts.repartition(
            cpu_stage_partitions(pts), F.col("conv_id")
        ).sortWithinPartitions("conv_id", "_ts")
        return part.mapInPandas(fn, out_schema)

    # ---- (conv, calendar-chunk) split path (round-4 verdict #3) ---------
    unit_name = {"D": "day", "M": "month", "Y": "year"}[unit]

    def chunk_trunc_ns(t: int) -> int:
        if unit == "D":
            return (t // DAY_NS) * DAY_NS
        return int(
            np.datetime64(t, "ns")
            .astype(f"datetime64[{unit}]")
            .astype("datetime64[ns]")
            .astype(np.int64)
        )

    def chunk_next_ns(g: int) -> int:
        if unit == "D":
            return g + DAY_NS
        nxt = np.datetime64(g, "ns").astype(f"datetime64[{unit}]") + 1
        return int(nxt.astype("datetime64[ns]").astype(np.int64))

    def pack_one_chunk(conv, g, t0, tl, ts, a0, a1):
        # the block whose calendar group starts at g, with pack_conv's exact
        # arithmetic given the conv's GLOBAL span [t0, tl]: the first block
        # starts at t0 (not its calendar start) and the last ends at tl
        start = max((g - t0) // step, 0)
        end = (
            (tl - t0) // step + 1
            if g == chunk_trunc_ns(tl)
            else (chunk_next_ns(g) - t0) // step
        )
        bt0 = int(t0 + start * step)
        idx = (
            (ts - t0) // step - start
            if ts is not None
            else np.empty(0, dtype=np.int64)
        )
        block = encode_block_gapfilled(
            bt0,
            step,
            int(end - start),
            idx,
            a0 if a0 is not None else np.empty(0, dtype=np.float64),
            a1 if a1 is not None else np.empty(0, dtype=np.int64),
        )
        fr = make_frames([bt0], [EV_BLOCK], data=[block])
        return (
            conv,
            np.datetime64(g // 1000, "us"),
            int(end - start),
            bt0,
            int(t0 + (end - 1) * step),
            24 * int(end - start),
            marshal_frames(fr),
        )

    # the split plan reads pts three times (span agg, sparse anti-join,
    # dense join) — materialize it once (eager localCheckpoint: reuse +
    # auto release, the repo rule) instead of recomputing the rollup
    # lineage per branch (measured 2.2x soak regression without this)
    pts = pts.localCheckpoint(eager=True)
    # skew-safe per-conv span: map-side-combined min/max/count, then the
    # (small — dense convs are by definition the few stragglers) span table
    # broadcasts to route rows without an extra data-sized shuffle
    spans = pts.groupBy("conv_id").agg(
        F.min("_ts").alias("_t0"),
        F.max("_ts").alias("_tl"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    dense = spans.where(F.col("_cnt") > split_dense_rows).drop("_cnt")
    sparse_blocks = (
        pts.join(F.broadcast(dense.select("conv_id")), "conv_id", "left_anti")
        .repartition(n_part, F.col("conv_id"))
        .sortWithinPartitions("conv_id", "_ts")
        .mapInPandas(fn, out_schema)
    )

    chunk_of = F.expr(
        f"unix_micros(date_trunc('{unit_name}', timestamp_micros(_ts div 1000))) * 1000"
    )
    dense_pts = pts.join(F.broadcast(dense), "conv_id").withColumn("_chunk", chunk_of)

    def dense_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # same streaming-carry shape as fn, but the group key is
        # (conv_id, _chunk) and each group emits exactly one block
        carry: pd.DataFrame | None = None

        def emit(pdf, starts, ends):
            conv = pdf["conv_id"].to_numpy()
            chk = pdf["_chunk"].to_numpy(np.int64)
            t0a = pdf["_t0"].to_numpy(np.int64)
            tla = pdf["_tl"].to_numpy(np.int64)
            ts = pdf["_ts"].to_numpy(np.int64)
            a0 = pdf["_v0"].to_numpy(np.float64)
            a1 = pdf["_v1"].to_numpy(np.int64)
            rows = [
                pack_one_chunk(
                    conv[s], int(chk[s]), int(t0a[s]), int(tla[s]),
                    ts[s:e], a0[s:e], a1[s:e],
                )
                for s, e in zip(starts.tolist(), ends.tolist())
            ]
            out = pd.DataFrame(rows, columns=cols)
            out["grp"] = pd.to_datetime(out["grp"])
            return out

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            conv = pdf["conv_id"].to_numpy()
            chk = pdf["_chunk"].to_numpy(np.int64)
            change = np.empty(len(conv), dtype=bool)
            change[0] = True
            np.not_equal(conv[1:], conv[:-1], out=change[1:])
            change[1:] |= chk[1:] != chk[:-1]
            starts = np.flatnonzero(change)
            carry = pdf.iloc[starts[-1] :].reset_index(drop=True)
            if len(starts) == 1:
                continue
            ends = np.append(starts[1:], len(pdf))
            yield emit(pdf, starts[:-1], ends[:-1])
        if carry is not None and len(carry):
            yield emit(carry, np.array([0]), np.array([len(carry)]))

    dense_blocks = (
        dense_pts.repartition(n_part, "conv_id", "_chunk")
        .sortWithinPartitions("conv_id", "_chunk", "_ts")
        .mapInPandas(dense_fn, out_schema)
    )

    # empty calendar periods inside a dense conv's span still owe their
    # all-zero blocks: per-conv chunk spine (calendar-bounded) minus the
    # chunks that hold data
    spine = dense.select(
        "conv_id",
        "_t0",
        "_tl",
        F.explode(
            F.sequence(
                F.expr(f"date_trunc('{unit_name}', timestamp_micros(_t0 div 1000))"),
                F.expr(f"date_trunc('{unit_name}', timestamp_micros(_tl div 1000))"),
                F.expr(f"interval 1 {unit_name}"),
            )
        ).alias("_cts"),
    ).select("conv_id", "_t0", "_tl", F.expr("unix_micros(_cts) * 1000").alias("_chunk"))
    present = dense_pts.select("conv_id", "_chunk").distinct()
    empties = spine.join(present, ["conv_id", "_chunk"], "left_anti")

    def empty_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = [
                pack_one_chunk(c, int(g), int(t0), int(tl), None, None, None)
                for c, g, t0, tl in zip(
                    pdf["conv_id"], pdf["_chunk"], pdf["_t0"], pdf["_tl"]
                )
            ]
            out = pd.DataFrame(rows, columns=cols)
            out["grp"] = pd.to_datetime(out["grp"])
            yield out

    empty_blocks = empties.mapInPandas(empty_fn, out_schema)
    return sparse_blocks.unionByName(dense_blocks).unionByName(empty_blocks)


def unpack_blocks(
    blocks: DataFrame,
    keys: list[str],
    v0: str | None = "v0",
    v1: str | None = "v1",
    frame_col: str = "frame",
) -> DataFrame:
    """Explode framed blocks back into point rows (keys..., ts_ns [, v0][, v1]).

    mapInPandas: decode parallelism = block count, no shuffle. Worker
    memory is BOUNDED: an Arrow input batch can carry up to
    maxRecordsPerBatch block rows, and a naive one-frame-per-batch yield
    would materialize batch-rows x points-per-block rows at once (measured:
    a whole-archive decode at 580k blocks x ~1.4k pts killed workers).
    The fn therefore splits each input batch on the cumulative ``n_points``
    column so every yielded frame holds at most ~2M decoded points, and
    assembles each slice with one ``np.concatenate`` per column instead of
    one pandas DataFrame per block.
    """
    fields = _key_fields(blocks, keys) + [StructField("ts_ns", LongType())]
    from pyspark.sql.types import DoubleType

    if v0:
        fields.append(StructField(v0, DoubleType()))
    if v1:
        fields.append(StructField(v1, LongType()))
    out_schema = StructType(fields)

    PTS_BUDGET = 2_000_000  # max decoded points per yielded frame

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            if "n_points" in pdf.columns:
                csum = pdf["n_points"].to_numpy(np.int64).cumsum()
            else:
                # projected input without the n_points stat: recover the
                # per-block point counts from the frames themselves — each
                # block payload header carries n (decode_block reads it) —
                # via a cheap header peek, so the memory bound NEVER
                # degrades to rows-only (2048 giant blocks would rebuild
                # exactly the blowup this function guards against)
                from tmframe_spark.codec.blocks import peek_block_n_points

                counts = np.fromiter(
                    (peek_block_n_points(bytes(x)) for x in pdf[frame_col]),
                    dtype=np.int64,
                    count=n,
                )
                csum = counts.cumsum()
            start = 0
            while start < n:
                base = int(csum[start - 1]) if start else 0
                end = int(np.searchsorted(csum, base + PTS_BUDGET, side="right"))
                end = min(max(end, start + 1), n)  # an oversize block rides alone
                sl = pdf.iloc[start:end]
                start = end
                # one vectorized unmarshal over the slice's wire frames
                fr = unmarshal_frames(b"".join(bytes(x) for x in sl[frame_col]))
                evs = get_evtnum(fr.prim, fr.ude)
                if (evs != EV_BLOCK).any():
                    bad = int(evs[(evs != EV_BLOCK).argmax()])
                    raise ValueError(f"expected EV_BLOCK frame, got evtnum {bad}")
                key_cols = {k: sl[k].to_numpy() for k in keys}
                ts_l, v0_l, v1_l, reps = [], [], [], []
                for i in range(len(sl)):
                    ts, a0, a1 = decode_block(fr.data[i])
                    ts_l.append(ts)
                    reps.append(len(ts))
                    if v0:
                        v0_l.append(
                            a0 if a0 is not None else np.full(len(ts), np.nan)
                        )
                    if v1:
                        v1_l.append(
                            a1 if a1 is not None else np.zeros(len(ts), np.int64)
                        )
                d = {k: np.repeat(key_cols[k], reps) for k in keys}
                d["ts_ns"] = np.concatenate(ts_l) if ts_l else np.array([], np.int64)
                if v0:
                    d[v0] = np.concatenate(v0_l)
                if v1:
                    d[v1] = np.concatenate(v1_l)
                yield pd.DataFrame(d)

    return blocks.mapInPandas(fn, out_schema)


def frame_mixed_fixture(transcripts: DataFrame) -> DataFrame:
    """Mixed-evtnum wire fixture for the display path: by turn_idx % 3,
    each turn becomes an EV_TURN UDE frame (payload role|US|tool|US|text),
    an EvOneInt64 frame (V1 = text length), or an EvZero frame. Exercises
    every Frame.String() branch (frame.go:490-511) with real wire bytes.
    """
    from tmframe_spark.codec.frames import EV_ONE_INT64, EV_TURN, EV_ZERO

    schema = StructType(
        transcripts.schema.fields + [StructField("frame", BinaryType())]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            ts = pdf["ts_ns"].to_numpy(np.int64)
            kind = pdf["turn_idx"].to_numpy(np.int64) % 3
            evs = np.choose(kind, [EV_TURN, EV_ONE_INT64, EV_ZERO])
            cols = [
                pdf[c].astype(object).where(pd.notna(pdf[c]), "")
                for c in ("role", "tool", "text")
            ]
            text_len = pdf["text"].str.len().fillna(0).to_numpy(np.int64)
            data = [
                "\x1f".join((r, t, x)).encode("utf-8") if k == 0 else b""
                for k, r, t, x in zip(kind, *cols)
            ]
            fr = make_frames(ts, evs, v1=text_len, data=data)
            sizes = frame_num_bytes(fr.prim, fr.ude)
            wire = marshal_frames(fr)
            offs = np.zeros(n, dtype=np.int64)
            np.cumsum(sizes[:-1], out=offs[1:])
            out = pdf.copy()
            out["frame"] = [wire[int(o) : int(o + s)] for o, s in zip(offs, sizes)]
            yield out

    return transcripts.mapInPandas(fn, schema)


def frame_payloads(
    df: DataFrame, evtnum: int, payload_col: str, ts_ns_col: str = "ts_ns"
) -> DataFrame:
    """Encode each row's UTF-8 string payload as a UDE wire frame with the
    given evtnum (e.g. EvJson=14, EvUtf8=13). Adds a binary ``frame``
    column. Inverse-checked via ops.display render + the SQL oracle."""
    schema = StructType(df.schema.fields + [StructField("frame", BinaryType())])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            ts = pdf[ts_ns_col].to_numpy(np.int64)
            payloads = [
                (x if isinstance(x, str) else "").encode("utf-8")
                for x in pdf[payload_col]
            ]
            fr = make_frames(ts, [evtnum] * n, data=payloads)
            sizes = frame_num_bytes(fr.prim, fr.ude)
            wire = marshal_frames(fr)
            offs = np.zeros(n, dtype=np.int64)
            np.cumsum(sizes[:-1], out=offs[1:])
            out = pdf.copy()
            out["frame"] = [wire[int(o) : int(o + s)] for o, s in zip(offs, sizes)]
            yield out

    return df.mapInPandas(fn, schema)


def frame_msgpack_turns(transcripts: DataFrame) -> DataFrame:
    """Encode each turn as an EvMsgpack UDE frame whose payload is the
    msgpack map {"conv_id", "turn_idx", "role", "n_chars"} — the reference's
    LogEntry-in-a-msgpack-family-frame pattern (testdata/logentry.go:9-13,
    util.go:364-404), with this engine's from-scratch msgpack codec.

    Output: one binary ``frame`` column only (the decode side must recover
    everything from the wire).

    Boundary shape (r7): ``n_chars`` (a CODE-POINT count, = Python
    ``len(str)``) is computed JVM-side so the exchange below ships ~40 B of
    metadata per row instead of the raw text (guide idiom: project before
    the exchange), and the exchange itself is an explicit
    repartition(shuffle.partitions) — the upstream window exchange is
    ENSURE_REQUIREMENTS, which AQE's byte-based coalescing collapses to ~1
    partition on heavy-CPU/tiny-byte inputs, serializing the per-row
    msgpack encode AND the decode stage that follows it (measured: 3 final
    partitions on 32 cores before the pin). The pin itself is
    scale-adaptive (ops.sizing.cpu_stage_partitions)."""
    from tmframe_spark.codec.frames import EV_MSGPACK
    from tmframe_spark.codec.payloads import mp_encode
    from tmframe_spark.ops.sizing import cpu_stage_partitions

    schema = StructType([StructField("frame", BinaryType())])
    src = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        F.coalesce(F.length("text"), F.lit(0)).cast("long").alias("_n_chars"),
        "ts_ns",
    )
    src = src.repartition(
        cpu_stage_partitions(src), F.col("conv_id"), F.col("turn_idx")
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            ts = pdf["ts_ns"].to_numpy(np.int64)
            payloads = [
                mp_encode(
                    {
                        "conv_id": c,
                        "turn_idx": int(i),
                        "role": r,
                        "n_chars": int(nc),
                    }
                )
                for c, i, r, nc in zip(
                    pdf["conv_id"], pdf["turn_idx"], pdf["role"], pdf["_n_chars"]
                )
            ]
            fr = make_frames(ts, [EV_MSGPACK] * n, data=payloads)
            sizes = frame_num_bytes(fr.prim, fr.ude)
            wire = marshal_frames(fr)
            offs = np.zeros(n, dtype=np.int64)
            np.cumsum(sizes[:-1], out=offs[1:])
            yield pd.DataFrame(
                {"frame": [wire[int(o) : int(o + s)] for o, s in zip(offs, sizes)]}
            )

    return src.mapInPandas(fn, schema)


def decode_msgpack_frames(frames: DataFrame, frame_col: str = "frame") -> DataFrame:
    """Decode EvMsgpack wire frames back into typed columns via the payload
    codec registry (codec.payloads) — the inverse of frame_msgpack_turns."""
    from pyspark.sql.types import IntegerType, StringType

    from tmframe_spark.codec.frames import EV_MSGPACK
    from tmframe_spark.codec.payloads import mp_decode

    out_schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("turn_idx", IntegerType()),
            StructField("role", StringType()),
            StructField("n_chars", LongType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            fr = unmarshal_frames(b"".join(bytes(x) for x in pdf[frame_col]))
            evs = get_evtnum(fr.prim, fr.ude)
            if (evs != EV_MSGPACK).any():
                bad = int(evs[(evs != EV_MSGPACK).argmax()])
                raise ValueError(f"expected EvMsgpack frame, got evtnum {bad}")
            recs = [mp_decode(d) for d in fr.data]
            yield pd.DataFrame.from_records(recs).astype(
                {"turn_idx": "int32", "n_chars": "int64"}
            )

    return frames.mapInPandas(fn, out_schema)


def frame_turns(
    transcripts: DataFrame,
    role_codes: dict[str, int] | None = None,
) -> DataFrame:
    """Encode each transcript turn as an individual TMFRAME wire frame.

    The reference's per-event framing (one frame per record): each turn
    becomes an EvUDE frame with the user evtnum EV_TURN, payload = UTF-8
    ``role\\x1f tool\\x1f text`` (unit-separator-joined), timestamp =
    8ns-truncated turn ts. Mirrors the LogEntry-in-EvZebraPack pattern
    (/root/reference/testdata/logentry.go, util.go:364-404).

    Adds columns: frame (binary), frame_nbytes (long).
    """
    from tmframe_spark.codec.frames import EV_TURN, frame_num_bytes

    schema = StructType(
        transcripts.schema.fields
        + [StructField("frame", BinaryType()), StructField("frame_nbytes", LongType())]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            ts = pdf["ts_ns"].to_numpy(np.int64)
            cols = [pdf[c].astype(object).where(pd.notna(pdf[c]), "") for c in ("role", "tool", "text")]
            payloads = [
                "\x1f".join((r, t, x)).encode("utf-8")
                for r, t, x in zip(*cols)
            ]
            fr = make_frames(ts, [EV_TURN] * n, data=payloads)
            sizes = frame_num_bytes(fr.prim, fr.ude)
            wire = marshal_frames(fr)
            offs = np.zeros(n, dtype=np.int64)
            np.cumsum(sizes[:-1], out=offs[1:])
            out = pdf.copy()
            out["frame"] = [
                wire[int(o) : int(o + s)] for o, s in zip(offs, sizes)
            ]
            out["frame_nbytes"] = sizes
            yield out

    return transcripts.mapInPandas(fn, schema)
