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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from pyspark.sql.window import Window


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

    Scale shape: repartition on ``by`` + sortWithinPartitions + a *streaming*
    mapInPandas pass whose state is exactly the ring (``window_size`` content
    strings) + refcount map, carried across Arrow batches. Memory per task is
    O(window_size + batch), never O(conversation) — a hot conversation with
    10^8 turns streams through in bounded memory, unlike groupBy().
    applyInPandas which would materialize it whole. Content comparison is
    exact strings (never a lossy 64-bit hash), matching the reference's
    collision-free intent.

    ``order_cols`` must be a total order within each ``by`` group (e.g.
    (ts, turn_idx)) — Spark's sort is not stable, so ties would otherwise be
    partition-order dependent.

    FAITHFUL GLOBAL MODE (``by=[]``): the reference's window is over the
    whole merged stream, not per series (dedup.go:31-122 consumes the single
    time-ordered frame stream). Passing ``by=[]`` reproduces that exactly:
    the stream is treated as one group under ``order_cols``. This is
    inherently SERIAL — one task walks the whole stream in order, exactly as
    the reference's single-goroutine ring does — so it is a fidelity mode,
    not a scale mode; at scale use per-series keys (``by=["conv_id"]``),
    which shards the same algorithm across series. The implementation tags a
    constant group key so the partitioner sends every row to one task while
    the streaming mapInPandas state stays O(window + batch).
    """
    if emit not in ("kept", "dups"):
        raise ValueError("emit must be 'kept' or 'dups'")
    want_kept = emit == "kept"
    key_cols = list(by)
    drop_tag = False
    if not key_cols:
        # global mode: constant key -> one group = the whole merged stream
        if "_g" in df.columns:
            raise ValueError(
                "count_window_dedup global mode reserves column name '_g'; "
                "rename the input column"
            )
        df = df.withColumn("_g", F.lit(0))
        key_cols = ["_g"]
        drop_tag = True
    out_schema = StructType(df.schema.fields)
    sort_cols = key_cols + list(order_cols)

    def fn(batches):
        # per-group state, carried across batches (groups are contiguous
        # under the partition sort): open group key, ring of the last
        # window_size content ids, refcount map, running index.
        # Content identity is exact strings, but the ring/refcount loop runs
        # on ints: each batch is factorized (vectorized C hashing, one pass)
        # and the per-batch uniques — few vs rows on duplicate-heavy data —
        # are mapped through a task-lifetime str->int intern table, so the
        # Python loop never rehashes a long text.
        cur_key: tuple | None = None
        ring: list = [None] * window_size
        refcount: dict = {}
        intern: dict = {}
        next_gid = 0  # monotonic; ids are never reused, so pruning is safe
        i = 0
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            joined = pdf[hash_cols[0]].fillna("").astype(str)
            for c in hash_cols[1:]:
                joined = joined + "\x1f" + pdf[c].fillna("").astype(str)
            codes, uniques = pd.factorize(joined)
            gids = np.empty(len(uniques), dtype=np.int64)
            for u, s in enumerate(uniques):
                g = intern.get(s)
                if g is None:
                    intern[s] = g = next_gid
                    next_gid += 1
                gids[u] = g
            contents = gids[codes].tolist()
            kdf = pdf[key_cols]
            prev = kdf.shift()
            # null-safe boundary detection: NaN == NaN must NOT break a group
            change = (
                (~((kdf == prev) | (kdf.isna() & prev.isna()))).any(axis=1).to_numpy()
            )
            first_key = tuple(
                None if pd.isna(v) else v for v in kdf.iloc[0]
            )
            change[0] = first_key != cur_key
            bidx = np.flatnonzero(change)
            btuples = {
                int(r): tuple(None if pd.isna(v) else v for v in kdf.iloc[int(r)])
                for r in bidx
            }
            keep = np.ones(n, dtype=bool)
            for r in range(n):
                if change[r]:
                    cur_key = btuples[r]
                    refcount = {}
                    i = 0
                h = contents[r]
                rc = refcount.get(h, 0)
                if rc > 0:
                    keep[r] = False
                    refcount[h] = rc + 1
                else:
                    refcount[h] = 1
                if i >= window_size:
                    old = ring[i % window_size]
                    c2 = refcount[old] - 1
                    if c2 == 0:
                        del refcount[old]
                    else:
                        refcount[old] = c2
                ring[i % window_size] = h
                i += 1
            out = pdf[keep if want_kept else ~keep]
            # bound the intern table: only ids alive in the current window
            # (refcount keys) must keep their string mapping — a string that
            # re-appears after leaving the window safely gets a fresh id.
            # Keeps task memory O(window), never O(distinct contents seen).
            if len(intern) > max(4 * window_size, 1 << 16):
                live = set(refcount)
                intern = {s: g for s, g in intern.items() if g in live}
            if len(out):
                yield out

    # explicit partition pin (see codec.udfs.pack_blocks): the downstream
    # cost is Python work per row, so AQE byte-based coalescing must not
    # shrink this exchange
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    part = df.repartition(n_part, *[F.col(k) for k in key_cols]).sortWithinPartitions(
        *sort_cols
    )
    out = part.mapInPandas(fn, out_schema)
    return out.drop("_g") if drop_tag else out


def has_window_dups(
    df: DataFrame,
    window_size: int,
    by: list[str],
    order_cols: list[str],
    hash_cols: list[str],
) -> bool:
    """The reference's ``detectOnly`` mode (dedup.go:26-31): scan and stop
    at the first in-window duplicate, writing nothing — tfdedup uses it to
    sweep a filesystem for files that contain duplicates at all.

    Spark-native form: the dups side-channel under ``isEmpty()``, which
    runs an incremental limit-1 job — Spark launches partitions in waves
    and cancels the scan as soon as one duplicate row is produced, the
    distributed analog of returning DupDetectedErr at the first hit.
    """
    return not count_window_dedup(
        df, window_size, by, order_cols, hash_cols, emit="dups"
    ).isEmpty()
