"""Continuous-aggregate rollup cascade with gap-fill and skew salting.

Semantics modeled on the reference's tfgroup (count per tumbling minute with
zero-count rows emitted for empty minutes — /root/reference/cmd/tfgroup/
tfgroup.go:55-78) generalized to the transcript domain: per-conversation
turn-rate, token-volume, role-mix and tool-call aggregates at 1m/1h/1d
retention tiers, the 1h tier re-aggregating the 1m tier and 1d the 1h
(partial/final two-phase, exactly Spark's own hash-agg model).

Scale notes (100 TB posture):
- the groupBy keys are (conv_id, bucket) — high cardinality, well spread;
  map-side partial aggregation makes the shuffle carry one row per
  (conv, bucket) not per turn.
- hot conversations (one conv_id with millions of turns in a bucket) are
  handled by explicit two-phase salting (``salt`` parameter) on top of AQE
  skew handling — the salted partial agg spreads one hot key over N reducers.
- gap-fill generates each conversation's spine only over its own
  [min_bucket, max_bucket] range and only at the 1m tier; 1h/1d derive from
  re-aggregation so they stay gap-consistent without their own spines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TIER_TRUNC = {"1m": "minute", "1h": "hour", "1d": "day"}
TIER_INTERVAL = {"1m": "interval 1 minute", "1h": "interval 1 hour", "1d": "interval 1 day"}

#: aggregate columns produced per (conv_id, bucket); all integer-typed so
#: value hashes are exact across engines.
AGG_COLS = ("turns", "token_volume", "tool_calls", "user_turns", "assistant_turns")


def with_ts_ns(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Add the engine's source-of-truth int64 nanosecond timestamp.

    Spark TimestampType is microsecond resolution; the codec's timestamp
    domain is 8ns-truncated int64 nanos (/root/reference/frame.go:88-114).
    Parquet/driver timestamps are whole microseconds so *1000 is lossless,
    and the &-8 truncation is a no-op on them (1000 % 8 == 0) — asserted in
    tests, preserved here for inputs that arrive at full ns resolution.
    """
    if "ts_ns" in df.columns:
        return df
    # parquet timestamps arrive as TIMESTAMP_NTZ; the session TZ is pinned to
    # UTC so the cast to (ltz) TIMESTAMP for unix_micros is exact.
    return df.withColumn(
        "ts_ns", F.expr(f"(unix_micros(cast({ts_col} as timestamp)) * 1000) & -8")
    )


def _agg_exprs():
    return [
        F.count(F.lit(1)).alias("turns"),
        F.sum(F.length("text")).alias("token_volume"),
        F.count("tool").alias("tool_calls"),  # count() skips NULL tools
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias("user_turns"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).alias(
            "assistant_turns"
        ),
    ]


def rollup(transcripts: DataFrame, tier: str = "1m", salt: int | None = None) -> DataFrame:
    """Aggregate raw turns into one row per (conv_id, bucket).

    ``salt``: explicit skew handling — phase 1 groups by
    (conv_id, bucket, pmod(xxhash64(turn_idx), salt)) so a hot conversation's
    bucket spreads over ``salt`` reducers; phase 2 removes the salt and sums
    the partials (all our aggregates are sums/counts, so re-aggregation is
    exact).
    """
    bucket = F.date_trunc(TIER_TRUNC[tier], F.col("ts")).alias("bucket")
    if not salt:
        return transcripts.groupBy(F.col("conv_id"), bucket).agg(*_agg_exprs())
    salted = transcripts.withColumn(
        "_salt", F.pmod(F.xxhash64("turn_idx"), F.lit(salt))
    )
    partial = salted.groupBy(F.col("conv_id"), bucket, F.col("_salt")).agg(*_agg_exprs())
    finals = [F.sum(c).alias(c) for c in AGG_COLS]
    return partial.groupBy("conv_id", "bucket").agg(*finals)


def gap_fill(rolled: DataFrame, tier: str = "1m") -> DataFrame:
    """Emit zero rows for empty buckets inside each conversation's lifespan
    (tfgroup's catch-up loop, generalized per conv and tier)."""
    bounds = rolled.groupBy("conv_id").agg(
        F.min("bucket").alias("_mn"), F.max("bucket").alias("_mx")
    )
    spine = bounds.select(
        "conv_id",
        F.explode(
            F.sequence(F.col("_mn"), F.col("_mx"), F.expr(TIER_INTERVAL[tier]))
        ).alias("bucket"),
    )
    joined = spine.join(rolled, ["conv_id", "bucket"], "left")
    zeroed = [
        F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c) for c in AGG_COLS
    ]
    return joined.select("conv_id", "bucket", *zeroed)


def cascade_up(lower: DataFrame, tier: str) -> DataFrame:
    """Re-aggregate a finer tier into a coarser one (1m->1h, 1h->1d).

    Two-phase partial/final: the lower tier is already one row per
    (conv, fine-bucket) so this shuffle is tiny relative to raw turns.
    """
    bucket = F.date_trunc(TIER_TRUNC[tier], F.col("bucket")).alias("bucket")
    sums = [F.sum(c).cast("long").alias(c) for c in AGG_COLS]
    return lower.groupBy(F.col("conv_id"), bucket).agg(*sums)


def rollup_tiers(transcripts: DataFrame, salt: int | None = None):
    """The full cascade: returns {'1m': df, '1h': df, '1d': df}.

    1m is gap-filled; 1h/1d re-aggregate the gap-filled 1m tier, so a
    conversation's zero-minutes roll up into (possibly zero) hour/day rows —
    the retention tiers agree with each other by construction.
    """
    m1 = gap_fill(rollup(transcripts, "1m", salt=salt), "1m")
    h1 = cascade_up(m1, "1h")
    d1 = cascade_up(h1, "1d")
    return {"1m": m1, "1h": h1, "1d": d1}


def role_mix(transcripts: DataFrame, tier: str = "1h") -> DataFrame:
    """Role-mix continuous aggregate: per (conv, bucket, role) counts."""
    bucket = F.date_trunc(TIER_TRUNC[tier], F.col("ts")).alias("bucket")
    return transcripts.groupBy(F.col("conv_id"), bucket, F.col("role")).agg(
        F.count(F.lit(1)).alias("turns"),
        F.sum(F.length("text")).alias("token_volume"),
    )


def tool_rates(transcripts: DataFrame, tier: str = "1d") -> DataFrame:
    """Per-tool call rates per bucket (NULL tools excluded)."""
    bucket = F.date_trunc(TIER_TRUNC[tier], F.col("ts")).alias("bucket")
    return (
        transcripts.where(F.col("tool").isNotNull())
        .groupBy(F.col("tool"), bucket)
        .agg(
            F.count(F.lit(1)).alias("calls"),
            F.count_distinct("conv_id").alias("convs"),
        )
    )
