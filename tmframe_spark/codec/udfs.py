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

from tmframe_spark.codec.blocks import decode_block, encode_block
from tmframe_spark.codec.frames import (
    EV_BLOCK,
    get_evtnum,
    make_frames,
    marshal_frames,
    unmarshal_frames,
)


def _key_fields(df: DataFrame, keys: list[str]) -> list[StructField]:
    by_name = {f.name: f for f in df.schema.fields}
    return [by_name[k] for k in keys]


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
    sort_cols = [ts_ns] + ([seq] if seq else [])
    has_v0, has_v1 = v0 is not None, v1 is not None
    # wire cost floor per point if stored as individual frames:
    # Two64=24B, OneFloat64/OneInt64=16B, Zero=8B (frame.go:185-212)
    per_point_raw = 8 + (8 if has_v0 else 0) + (8 if has_v1 else 0)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        ts = pdf[ts_ns].to_numpy(np.int64)
        a0 = pdf[v0].to_numpy(np.float64) if has_v0 else None
        a1 = pdf[v1].to_numpy(np.int64) if has_v1 else None
        block = encode_block(ts, a0, a1)
        fr = make_frames([int(ts[0])], [EV_BLOCK], data=[block])
        row = {k: pdf[k].iloc[0] for k in keys}
        row.update(
            n_points=len(ts),
            ts_first=int(ts[0]),
            ts_last=int(ts[-1]),
            raw_nbytes=per_point_raw * len(ts),
            frame=marshal_frames(fr),
        )
        return pd.DataFrame([row])

    return df.groupBy(*keys).applyInPandas(fn, out_schema)


def unpack_blocks(
    blocks: DataFrame,
    keys: list[str],
    v0: str | None = "v0",
    v1: str | None = "v1",
    frame_col: str = "frame",
) -> DataFrame:
    """Explode framed blocks back into point rows (keys..., ts_ns [, v0][, v1]).

    mapInPandas: each Arrow batch of block rows yields one DataFrame of
    decoded points — decode parallelism = block count, no shuffle.
    """
    fields = _key_fields(blocks, keys) + [StructField("ts_ns", LongType())]
    from pyspark.sql.types import DoubleType

    if v0:
        fields.append(StructField(v0, DoubleType()))
    if v1:
        fields.append(StructField(v1, LongType()))
    out_schema = StructType(fields)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parts = []
            for _, row in pdf.iterrows():
                fr = unmarshal_frames(bytes(row[frame_col]))
                ev = int(get_evtnum(fr.prim, fr.ude)[0])
                if ev != EV_BLOCK:
                    raise ValueError(f"expected EV_BLOCK frame, got evtnum {ev}")
                ts, a0, a1 = decode_block(fr.data[0])
                d = {k: row[k] for k in keys}
                d["ts_ns"] = ts
                if v0:
                    d[v0] = a0 if a0 is not None else np.nan
                if v1:
                    d[v1] = a1 if a1 is not None else 0
                parts.append(pd.DataFrame(d))
            if parts:
                yield pd.concat(parts, ignore_index=True)

    return blocks.mapInPandas(fn, out_schema)


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
