"""Filters / projections: tffilter, tfgrep, tfsum analogs.

Reference: tffilter regex-filters stringified frames — AND of all regexes by
default, OR with -any, inverted with -x, passing raw frame bytes through on
match (cmd/tffilter/tffilter.go:85-189, cfg.go:145-167). tfgrep extracts a
named JSON field from (escaped-)JSON payloads (cmd/tfgrep/tfgrep.go:32-77).
tfsum replaces each frame's payload with a checksum frame: same tm,
EvOneInt64, V1 = first 8 bytes of the BLAKE2b hash little-endian
(cmd/tfsum/tfsum.go:56-71).

We filter against *typed columns* instead of a rendered string (tffilter
matches the display string, tffilter.go:95) — declarative predicates that
Catalyst pushes into the parquet scan.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd  # noqa: F401 — pandas_udf resolves 'pd.Series' hints via module globals
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def regex_filter(
    df: DataFrame,
    col: str,
    patterns: list[str],
    mode: str = "and",
    invert: bool = False,
) -> DataFrame:
    """tffilter: AND (default) / OR (-any) of regexes, optional -x invert."""
    preds = [F.regexp_like(F.col(col), F.lit(p)) for p in patterns]
    combine = (lambda a, b: a & b) if mode == "and" else (lambda a, b: a | b)
    pred: Column = reduce(combine, preds)
    return df.where(~pred if invert else pred)


def regex_extract(df: DataFrame, col: str, pattern: str, group: int = 1) -> DataFrame:
    """tffilter -sub: keep only the regex submatch (tffilter.go:166-181)."""
    return df.withColumn("submatch", F.regexp_extract(F.col(col), pattern, group))


def json_field(df: DataFrame, col: str, field: str, out: str = "field_value") -> DataFrame:
    """tfgrep: extract a JSON field from the payload column."""
    return df.withColumn(out, F.get_json_object(F.col(col), f"$.{field}"))


def tfsum_frames(df: DataFrame, frame_col: str = "frame", ts_ns: str = "ts_ns") -> DataFrame:
    """Exact tfsum semantics (cmd/tfsum/tfsum.go:56-71): per frame, emit
    (same tm, EvOneInt64, V1 = first 8 bytes of the frame's BLAKE2b hash,
    little-endian). The hash is over the reference's canonical bytes
    (wire words + payload WITHOUT the zero terminator, frame.go:532-564),
    computed by unmarshalling the wire frames batch-wise through the numpy
    codec and hashing with hashlib.blake2b (bit-compatible)."""
    from tmframe_spark.codec.frames import blake2b_frames, unmarshal_frames

    @F.pandas_udf("long")
    def b2b_v1(frames: pd.Series) -> pd.Series:
        if len(frames) == 0:
            return pd.Series([], dtype="int64")
        # frames are individually-marshalled wire records; concatenating
        # them yields a valid stream for the vectorized unmarshal
        stream = b"".join(bytes(x) for x in frames)
        fr = unmarshal_frames(stream)
        digests = blake2b_frames(fr)
        return pd.Series(
            np.frombuffer(b"".join(d[:8] for d in digests), dtype="<i8").copy()
        )

    return df.select(
        F.col(ts_ns).alias("ts_ns"),
        F.lit(1).alias("evtnum"),
        b2b_v1(F.col(frame_col)).alias("v1"),
    )
