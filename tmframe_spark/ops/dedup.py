"""Dedup operators.

The reference's Dedup (dedup.go:31-122) is a *count-based sliding window*
dedup over a frame stream keyed by BLAKE2b hash, with a ref-counted hashmap +
ring so that duplicates masked by an even-earlier pre-window duplicate still
drop (the dedup.go:75-88 comment's [1 2 1 3 1] example).
``count_window_dedup`` computes the identical decision with a closed-form
pair of window functions (see its docstring for the equivalence proof) —
all JVM, no Python boundary.

``hash_dedup`` / ``dup_counts`` are the scalable global variants (window
size = ∞): pure shuffle dedup with deterministic first-occurrence-wins under
the stable order, and the dup-count side channel (dedup.go:92-99).

Streaming analog: dropDuplicatesWithinWatermark (tmframe_spark.streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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

    ``order_cols`` must be a total order within each ``by`` group (e.g.
    (ts, turn_idx)) — Spark's sort is not stable, so ties would otherwise be
    partition-order dependent.

    FAITHFUL GLOBAL MODE (``by=[]``): the reference's window is over the
    whole merged stream, not per series (dedup.go:31-122 consumes the single
    time-ordered frame stream). Passing ``by=[]`` reproduces that exactly:
    the stream is treated as one group under ``order_cols``; at scale use
    per-series keys (``by=["conv_id"]``), which shards the same semantics
    across series.

    IMPLEMENTATION (r7, pure JVM — no Python boundary): the ring+refcount
    state machine admits a closed form. Every arrival (kept OR duplicate)
    enters the ring and bumps its refcount; eviction of arrival ``j - W``
    happens while processing arrival ``j``; so at the moment arrival ``i``
    is checked, ``refcount[h] > 0`` iff content ``h`` occurred among
    arrivals ``[i-W, i-1]`` of the group. Hence a row is a duplicate IFF
    the same content occurred within the previous ``window_size`` arrivals
    — masked duplicates included, because duplicates themselves count as
    arrivals (the dedup.go:75-88 [1 2 1 3 1] example: the dup at index 2
    renews 1's presence, so index 4 still drops). Two window functions
    compute exactly that: arrival index = row_number over (group, order),
    then lag(arrival) over (group, content) — duplicate iff
    ``arrival - lag(arrival) <= window_size``. The (group, content) window
    needs no second exchange (hash partitioning on the group keys already
    satisfies the clustered distribution), so the whole operator is one
    exchange + two Tungsten sorts, spill-graceful at any group size, and
    the per-row Python ring walk plus the double Arrow transfer of every
    column are gone (the former mapInPandas ring is pinned as this plan's
    oracle in tests/test_dedup.py::_ring_oracle and the property tests).
    Content identity is exact strings (never a lossy hash): null-safe
    \\x1f-joined casts of ``hash_cols``, matching the reference's
    collision-free intent.
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
    for reserved in ("_cwd_arr", "_cwd_ct", "_cwd_dup"):
        if reserved in df.columns:
            raise ValueError(
                f"count_window_dedup reserves column name {reserved!r}; "
                "rename the input column"
            )
    content = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in hash_cols]
    )
    w_arr = Window.partitionBy(*key_cols).orderBy(*order_cols)
    tagged = df.withColumn("_cwd_arr", F.row_number().over(w_arr)).withColumn(
        "_cwd_ct", content
    )
    w_prev = Window.partitionBy(*key_cols, "_cwd_ct").orderBy("_cwd_arr")
    prev = F.lag("_cwd_arr").over(w_prev)
    is_dup = prev.isNotNull() & ((F.col("_cwd_arr") - prev) <= F.lit(window_size))
    flagged = tagged.withColumn("_cwd_dup", is_dup)
    out = flagged.where(
        ~F.col("_cwd_dup") if want_kept else F.col("_cwd_dup")
    ).drop("_cwd_arr", "_cwd_ct", "_cwd_dup")
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
