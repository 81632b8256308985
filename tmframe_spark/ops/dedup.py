"""Dedup operators.

The reference's Dedup (dedup.go:31-122) is a *count-based sliding window*
dedup over a frame stream keyed by BLAKE2b hash, with a ref-counted hashmap +
ring so that duplicates masked by an even-earlier pre-window duplicate still
drop (the dedup.go:75-88 comment's [1 2 1 3 1] example). That semantics is
inherently sequential per stream → ``count_window_dedup`` runs it as ordered
per-series state inside applyInPandas (one pass per conversation, Arrow
batched, parallel across conversations).

``hash_dedup`` / ``dup_counts`` are the scalable global variants (window
size = ∞): pure shuffle dedup with deterministic first-occurrence-wins under
the stable order, and the dup-count side channel (dedup.go:92-99).

Streaming analog: dropDuplicatesWithinWatermark (tmframe_spark.streaming).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from pyspark.sql.window import Window


def frame_hash_col(cols: list[str]):
    """BLAKE2b-64bit content hash of the given columns (vectorized).

    Bit-compatible canonicalization with checksum_projection; for hot paths
    where bit-compat with the reference hash is not asserted, prefer
    F.xxhash64 (JVM-side, no Python roundtrip)."""

    @F.pandas_udf("binary")
    def b2b(*series: pd.Series) -> pd.Series:
        joined = series[0].fillna("").astype(str)
        for c in series[1:]:
            joined = joined + "\x1f" + c.fillna("").astype(str)
        return pd.Series(
            [hashlib.blake2b(s.encode("utf-8"), digest_size=64).digest() for s in joined]
        )

    return b2b(*[F.col(c) for c in cols])


def hash_dedup(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """Keep the first occurrence (under the stable order) of each key.

    Equivalent to the reference dedup with an unbounded window. One shuffle
    on the key; skewed hot keys are exactly what AQE skew handling absorbs.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def dup_counts(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Duplicate side-channel: per-key occurrence counts > 1 (dedup.go:92-99)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .where(F.col("occurrences") > 1)
    )


def count_window_dedup(
    df: DataFrame,
    window_size: int,
    by: list[str],
    order_cols: list[str],
    hash_cols: list[str],
    emit: str = "kept",
) -> DataFrame:
    """Exact reference semantics: sliding count-window dedup per series.

    Reimplements the ring + ref-counted-hashmap algorithm (dedup.go:40-111):
    a row is a duplicate iff its hash is present among the last
    ``window_size`` *kept-or-refcounted* entries — masked duplicates within
    the window still drop because duplicates increment the refcount instead
    of re-entering the ring independently.

    Default window in the reference CLI: 1000 frames (cfg.go:93).
    ``emit``: 'kept' (dedupped stream) or 'dups' (the recognized duplicates
    — the reference's dupsW side-output, dedup.go:94-98).
    """
    if emit not in ("kept", "dups"):
        raise ValueError("emit must be 'kept' or 'dups'")
    want_kept = emit == "kept"
    out_schema = StructType(df.schema.fields)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order_cols), kind="mergesort").reset_index(drop=True)
        joined = pdf[hash_cols[0]].fillna("").astype(str)
        for c in hash_cols[1:]:
            joined = joined + "\x1f" + pdf[c].fillna("").astype(str)
        # content key per row; factorize to ints for a fast ring loop
        codes, _ = pd.factorize(joined)
        keep = np.ones(len(codes), dtype=bool)
        ring = np.full(window_size, -1, dtype=np.int64)
        refcount: dict[int, int] = {}
        for i, h in enumerate(codes):
            if refcount.get(h, 0) > 0:
                keep[i] = False
                refcount[h] += 1
            else:
                refcount[h] = 1
            if i >= window_size:
                old = int(ring[i % window_size])
                refcount[old] -= 1
                if refcount[old] == 0:
                    del refcount[old]
            ring[i % window_size] = h
        return pdf[keep if want_kept else ~keep]

    return df.groupBy(*by).applyInPandas(fn, out_schema)
