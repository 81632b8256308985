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

import re

_CUSTOM_TIER = re.compile(r"^(\d+)(s|m|h)$")
_UNIT_SECONDS = {"s": 1, "m": 60, "h": 3600}
_UNIT_NAME = {"s": "second", "m": "minute", "h": "hour"}


def _custom_tier(tier: str):
    """(n, unit, step_seconds) for fixed-step CUSTOM tiers ('5m', '30s',
    '6h' — TimescaleDB-style arbitrary buckets); None for the named
    1m/1h/1d tiers (which keep their date_trunc plans unchanged). Custom
    steps must evenly divide one day so block calendar groups, the named
    cascade, and retention day-boundaries all stay aligned."""
    if tier in TIER_TRUNC:
        return None
    m = _CUSTOM_TIER.match(tier)
    if not m:
        raise KeyError(
            f"unknown tier {tier!r} (named: 1m/1h/1d; custom: <N>s|<N>m|<N>h)"
        )
    n, u = int(m.group(1)), m.group(2)
    step = n * _UNIT_SECONDS[u]
    if step <= 0 or 86400 % step != 0:
        raise ValueError(f"custom tier {tier!r} must evenly divide one day")
    return n, u, step


def tier_bucket(tier: str, col: str = "ts"):
    """The engine's ONE tier -> bucket projection. Named tiers keep the
    original date_trunc form (bucket values, types and plans unchanged);
    custom fixed-step tiers floor epoch MICROSECONDS — exact integer
    arithmetic, identical cross-engine (DuckDB twin:
    ``make_timestamp((epoch_us(ts) // S_us) * S_us)``)."""
    c = _custom_tier(tier)
    if c is None:
        return F.date_trunc(TIER_TRUNC[tier], F.col(col)).alias("bucket")
    step_us = c[2] * 1_000_000
    return F.expr(
        f"timestamp_micros((unix_micros(cast({col} as timestamp)) div {step_us})"
        f" * {step_us})"
    ).alias("bucket")


def tier_interval(tier: str) -> str:
    c = _custom_tier(tier)
    return TIER_INTERVAL[tier] if c is None else f"interval {c[0]} {_UNIT_NAME[c[1]]}"


def tier_step_seconds(tier: str) -> int:
    c = _custom_tier(tier)
    return {"1m": 60, "1h": 3600, "1d": 86400}[tier] if c is None else c[2]

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
    bucket = tier_bucket(tier, "ts")
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
    (tfgroup's catch-up loop, cmd/tfgroup/tfgroup.go:65-71, generalized per
    conv and tier).

    Join-free plan: one window (lead) over the *data-sized* rolled relation
    finds each gap, then sequence+explode generates the zero rows inline.
    The shuffle never carries spine-sized data — at a sparse 10^12-turn
    table the spine can be 100x the data, so spine-size shuffles (the naive
    spine LEFT JOIN data plan) are the difference between minutes and hours.

    Single-subtree form (r7): the old base UNION gaps plan made Catalyst
    instantiate the whole upstream rollup aggregate TWICE (one copy per
    union branch — two scans, two aggregation exchanges, verified in the
    executed range-serving plan). Now each data row explodes into
    [its own bucket] ++ [its trailing gap buckets] in one pass, and the
    aggregate columns are zeroed on the gap rows with a bucket-equality
    CASE — same output rows, one scan, one aggregation, no Union. The
    per-row gap array is timestamps only (exactly what the old gaps
    branch built), so the extreme-gap memory shape is unchanged.
    """
    from pyspark.sql.window import Window

    iv = tier_interval(tier)
    w = Window.partitionBy("conv_id").orderBy("bucket")
    with_next = rolled.withColumn("_next", F.lead("bucket").over(w))
    gap_buckets = F.when(
        F.col("_next").isNotNull() & (F.col("_next") > F.expr(f"bucket + {iv}")),
        F.expr(f"sequence(bucket + {iv}, _next - {iv}, {iv})"),
    ).otherwise(F.expr("array()"))
    exploded = with_next.select(
        "conv_id",
        F.col("bucket").alias("_data_bucket"),
        *[F.col(c).cast("long").alias(c) for c in AGG_COLS],
        F.explode(
            F.concat(F.array(F.col("bucket")), gap_buckets)
        ).alias("_b"),
    )
    is_data = F.col("_b") == F.col("_data_bucket")
    return exploded.select(
        "conv_id",
        F.col("_b").alias("bucket"),
        *[
            F.when(is_data, F.col(c)).otherwise(F.lit(0)).cast("long").alias(c)
            for c in AGG_COLS
        ],
    )


def cascade_up(lower: DataFrame, tier: str) -> DataFrame:
    """Re-aggregate a finer tier into a coarser one (1m->1h, 1h->1d).

    Two-phase partial/final: the lower tier is already one row per
    (conv, fine-bucket) so this shuffle is tiny relative to raw turns.
    """
    bucket = tier_bucket(tier, "bucket")
    sums = [F.sum(c).cast("long").alias(c) for c in AGG_COLS]
    return lower.groupBy(F.col("conv_id"), bucket).agg(*sums)


def rollup_distinct_sketch(
    transcripts: DataFrame, tier: str = "1m", key_col: str = "tool", lgk: int = 12
) -> DataFrame:
    """Re-aggregatable DISTINCT-count tier: one Apache DataSketches HLL
    sketch of ``key_col`` per (conv_id, bucket) (Spark built-in
    ``hll_sketch_agg`` — JVM-side, map-side combinable like every other
    tier aggregate) plus the integer estimate.

    COUNT DISTINCT does not re-aggregate (a coarse tier cannot be built
    from fine-tier distinct COUNTS) — exactly what breaks naive continuous
    aggregates; sketches merge losslessly (register-wise max), so the
    1h/1d tiers derive from the 1m SKETCHES (``cascade_distinct_up``)
    without touching raw turns — the same partial/final shape as the sum
    cascade. NULL keys are ignored (SQL count-distinct semantics); an
    all-NULL bucket reports 0.

    At transcript key cardinalities (tools, roles) the DataSketches HLL
    stays in its exact coupon mode, so estimates equal true distinct
    counts — asserted cross-engine by the ``distinct_tools_1d`` oracle; at
    genuinely high cardinality the estimate degrades gracefully to the
    standard HLL error (~1.6% at lgk=12) instead of an O(distinct) exact
    state per group.
    """
    bucket = tier_bucket(tier, "ts")
    return (
        transcripts.groupBy(F.col("conv_id"), bucket)
        .agg(F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("sketch"))
        .withColumn(
            "distinct_est",
            F.coalesce(F.hll_sketch_estimate("sketch"), F.lit(0)).cast("long"),
        )
    )


def cascade_distinct_up(lower: DataFrame, tier: str) -> DataFrame:
    """Re-aggregate a finer distinct-sketch tier into a coarser one by
    merging the sketches (``hll_union_agg``) — lossless, so the coarse
    estimate equals a sketch built directly from raw turns (asserted in
    tests). The shuffle carries one small sketch per (conv, fine-bucket),
    never raw keys."""
    bucket = tier_bucket(tier, "bucket")
    return (
        lower.groupBy(F.col("conv_id"), bucket)
        .agg(F.hll_union_agg("sketch").alias("sketch"))
        .withColumn(
            "distinct_est",
            F.coalesce(F.hll_sketch_estimate("sketch"), F.lit(0)).cast("long"),
        )
    )


#: default bin count for the value-distribution histogram tiers; bin 0
#: holds value 0, bin i (1 <= i < B-1) holds [2^(i-1), 2^i), and the last
#: bin is the open tail [2^(B-2), inf) — log2 bins cover per-turn text
#: lengths from one char to 16 KiB+ at B=16.
HIST_BINS = 16


def hist_cols(bins: int = HIST_BINS) -> list[str]:
    return [f"h{i:02d}" for i in range(bins)]


def _hist_sum_cases(value_sql: str, bins: int) -> list[str]:
    """One aggregate SQL text per bin — identical in Spark and DuckDB
    (pure integer comparisons; the outer CAST collapses DuckDB's
    HUGEINT sum to BIGINT, a no-op for Spark's long sum)."""
    cases = []
    for i in range(bins):
        if i == 0:
            cond = f"({value_sql}) < 1"
        elif i < bins - 1:
            cond = f"({value_sql}) >= {1 << (i - 1)} AND ({value_sql}) < {1 << i}"
        else:
            cond = f"({value_sql}) >= {1 << (i - 1)}"
        cases.append(f"CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)")
    return cases


def rollup_histogram(
    transcripts: DataFrame,
    tier: str = "1m",
    value_sql: str = "length(text)",
    bins: int = HIST_BINS,
) -> DataFrame:
    """Re-aggregatable VALUE-DISTRIBUTION tier: a fixed log2 histogram of a
    per-turn value per (conv_id, bucket) — the percentile companion to the
    sum cascade, same role distribution sketches play in a continuous
    aggregate (quantiles, like COUNT DISTINCT, do not re-aggregate from
    per-bucket quantiles; fixed-bin counts merge exactly by element-wise
    sum).

    Each bin is one integer sum column (``h00``..``h15``) — plain map-side
    combinable JVM aggregates, so the shuffle carries B longs per
    (conv, bucket) and the cascade (``cascade_histogram_up``) is exact at
    any tier depth, unlike approx_percentile whose state neither merges
    losslessly nor hashes identically cross-engine. B=16 log2 bins bound
    the relative width of any quantile read to 2x — the honest contract
    (the reported value is the bin's lower bound, not an interpolation).
    """
    bucket = tier_bucket(tier, "ts")
    exprs = [
        F.expr(c).alias(h)
        for c, h in zip(_hist_sum_cases(value_sql, bins), hist_cols(bins))
    ]
    return transcripts.groupBy(F.col("conv_id"), bucket).agg(*exprs)


def cascade_histogram_up(lower: DataFrame, tier: str, bins: int = HIST_BINS) -> DataFrame:
    """Re-aggregate a finer histogram tier into a coarser one — element-wise
    integer bin sums, provably equal to building the coarse histogram from
    raw turns (asserted cross-engine by the ``hist_quantile_1h`` oracle)."""
    bucket = tier_bucket(tier, "bucket")
    sums = [F.sum(c).cast("long").alias(c) for c in hist_cols(bins)]
    return lower.groupBy(F.col("conv_id"), bucket).agg(*sums)


def histogram_quantile(
    df: DataFrame,
    q_num: int,
    q_den: int = 100,
    bins: int = HIST_BINS,
    out: str = "q",
) -> DataFrame:
    """Read a quantile off a histogram tier: ``{out}_bin`` = the smallest
    bin whose cumulative count reaches rank ceil(total * q/q_den) (NULL for
    an all-zero row, e.g. a gap-filled bucket), ``{out}_lo`` = that bin's
    lower bound. Pure integer arithmetic (ceil via (n*q + d - 1) div d),
    so results are exact and engine/partitioning-independent; the DuckDB
    twin is the same text with ``//`` for ``div``
    (see queries.hist_quantile_sql)."""
    hs = hist_cols(bins)
    total = "+".join(hs)
    rank = f"((({total}) * {q_num} + {q_den - 1}) div {q_den})"
    whens = " ".join(
        f"WHEN ({'+'.join(hs[: i + 1])}) >= _rank THEN {i}" for i in range(bins)
    )
    lo_whens = " ".join(
        f"WHEN {out}_bin = {i} THEN {0 if i == 0 else 1 << (i - 1)}"
        for i in range(bins)
    )
    return (
        df.withColumn("_rank", F.expr(rank))
        .withColumn(
            f"{out}_bin",
            F.expr(f"CAST(CASE WHEN ({total}) = 0 THEN NULL {whens} END AS INT)"),
        )
        .withColumn(f"{out}_lo", F.expr(f"CAST(CASE {lo_whens} END AS BIGINT)"))
        .drop("_rank")
    )


def _mg_compress(counts: DataFrame, k: int) -> DataFrame:
    """Misra-Gries compression of per-bucket counters to at most ``k``
    survivors: subtract the (k+1)-th largest count from every counter and
    keep the strictly-positive ones. The threshold is a VALUE, so the
    surviving set is independent of tie order — at most k keys can exceed
    it. Input/output schema: (bucket, key, cnt, n_total); ``n_total`` (the
    bucket's exact item total, summable across buckets) rides along
    untouched — the error bound is DERIVED, never stored:

        err(bucket) = n_total - sum(stored cnt)

    is exactly the decrement mass and telescopes through any number of
    merge+compress rounds, so it stays sound at every tier. If compression
    would drop every key (all counts tied), the top-1 row survives with
    cnt clamped to 0 purely to keep carrying (bucket, n_total) — without
    it a child bucket would vanish from a cascade and the parent's bound
    would silently shrink."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("bucket").orderBy(F.col("cnt").desc(), F.col("key"))
    wb = Window.partitionBy("bucket")
    ranked = counts.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_thr",
        F.coalesce(F.max(F.when(F.col("_rn") == k + 1, F.col("cnt"))).over(wb), F.lit(0)),
    )
    return (
        ranked.where((F.col("cnt") > F.col("_thr")) | (F.col("_rn") == 1))
        .select(
            "bucket",
            "key",
            F.greatest(F.col("cnt") - F.col("_thr"), F.lit(0)).cast("long").alias("cnt"),
            F.col("n_total").cast("long").alias("n_total"),
        )
    )


def _with_mg_err(sk: DataFrame) -> DataFrame:
    from pyspark.sql.window import Window

    wb = Window.partitionBy("bucket")
    return sk.withColumn(
        "err", (F.col("n_total") - F.sum("cnt").over(wb)).cast("long")
    )


def rollup_topk_sketch(
    transcripts: DataFrame, tier: str = "1h", key_col: str = "conv_id", k: int = 16
) -> DataFrame:
    """Re-aggregatable TOP-K (heavy hitters) tier via mergeable Misra-Gries
    summaries — the third member of the sketch-tier family (HLL distinct
    counts, fixed-bin histograms): a top-k list does not re-aggregate from
    child top-k lists, but MG summaries merge with a provable bound
    (Agarwal et al. 2013, "Mergeable Summaries").

    One row per (bucket, surviving key): ``bucket, key, cnt, n_total,
    err`` — ``cnt`` is the MG lower bound, ``n_total`` the bucket's exact
    item count, ``err = n_total - sum(cnt)`` the bucket-wide decrement
    mass: every true count lies in [cnt, cnt + err], every key with true
    count > err is guaranteed present, and at most ``k`` keys survive per
    bucket. With <= k distinct keys per bucket nothing is decremented, so
    the sketch IS the exact count table with err 0 — the oracle-able
    exactness limit (`heavy_hitters_exactk` in the pytest mirror).

    Scale shape: the exact (bucket, key) count is one map-side-combined
    shuffle (data-sized, same key family as the tier aggregates); the
    compression is a per-bucket window over those counts; the stored tier
    is <= k rows per bucket. NULL keys are dropped (count(col) semantics).
    """
    bucket = tier_bucket(tier, "ts")
    from pyspark.sql.window import Window

    counts = (
        transcripts.where(F.col(key_col).isNotNull())
        .groupBy(bucket, F.col(key_col).cast("string").alias("key"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .withColumn("n_total", F.sum("cnt").over(Window.partitionBy("bucket")))
    )
    return _with_mg_err(_mg_compress(counts, k))


def cascade_topk_up(lower: DataFrame, tier: str, k: int = 16) -> DataFrame:
    """Merge a finer MG top-k tier into a coarser one: sum the surviving
    counters per (coarse bucket, key), sum the child buckets' exact
    ``n_total`` (each child contributes exactly once — the compression
    guarantees every nonempty child keeps >= 1 row), then MG-compress
    again. The derived bound n_total - sum(cnt) telescopes: it equals the
    total decrement mass across ALL rounds, so the coarse tier's err is
    sound without any stored error state. The shuffle carries at most k
    rows per child bucket, never raw keys."""
    bucket = tier_bucket(tier, "bucket")
    merged = lower.groupBy(bucket, "key").agg(F.sum("cnt").cast("long").alias("cnt"))
    n = (
        lower.groupBy(F.col("bucket").alias("_fb"))
        .agg(F.max("n_total").alias("_n"))
        .groupBy(tier_bucket(tier, "_fb"))
        .agg(F.sum("_n").cast("long").alias("n_total"))
    )
    return _with_mg_err(_mg_compress(merged.join(n, "bucket"), k))


def rollup_tiers(transcripts: DataFrame, salt: int | None = None):
    """The full cascade: returns {'1m': df, '1h': df, '1d': df}, each
    gap-filled over its conversation lifespan.

    The cascade re-aggregates the *data-sized* tiers (no spine rows ever
    enter a groupBy) and gap-fills each tier independently — provably equal
    to cascading the gap-filled 1m tier (zero rows add nothing to sums, and
    trunc(min/max) bucket ranges coincide), but the shuffles stay data-sized.
    """
    m_data = rollup(transcripts, "1m", salt=salt)
    h_data = cascade_up(m_data, "1h")
    d_data = cascade_up(h_data, "1d")
    return {
        "1m": gap_fill(m_data, "1m"),
        "1h": gap_fill(h_data, "1h"),
        "1d": gap_fill(d_data, "1d"),
    }


def ohlc(
    transcripts: DataFrame, tier: str = "1h", value_col=None
) -> DataFrame:
    """OHLC (open/high/low/close) continuous aggregate per (conv, bucket) —
    the classic timeseries candlestick rollup, here over per-turn token
    volume. Open/close are first/last under the stable (ts, turn_idx) order
    via min/max of a (ts, turn_idx, value) struct — one shuffle, no window.
    All outputs integers, so the cross-engine value hash is exact."""
    v = (value_col if value_col is not None else F.length("text")).cast("long")
    bucket = tier_bucket(tier, "ts")
    key = F.struct(
        F.col("ts"), F.col("turn_idx"), v.alias("_v")
    )
    return transcripts.groupBy(F.col("conv_id"), bucket).agg(
        F.min(key).getField("_v").alias("open"),
        F.max(v).alias("high"),
        F.min(v).alias("low"),
        F.max(key).getField("_v").alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


def gap_fill_interpolate(
    rolled: DataFrame, tier: str = "1m", col: str = "token_volume"
) -> DataFrame:
    """Gap-fill with LINEAR INTERPOLATION instead of zeros (the
    TimescaleDB ``interpolate()`` companion to the zero-fill ``gap_fill``):
    a missing bucket k steps into an n-step gap gets
    ``prev + ((next - prev) * k) / n``.

    Determinism: (next-prev)*k is exact integer arithmetic; the single
    division and single addition are each one IEEE rounding on exact inputs,
    so the value is identical across engines and partitionings (the
    module-top float rules). Join-free spine generation as in gap_fill.
    """
    from pyspark.sql.window import Window

    iv = tier_interval(tier)
    w = Window.partitionBy("conv_id").orderBy("bucket")
    with_next = (
        rolled.withColumn("_nb", F.lead("bucket").over(w))
        .withColumn("_nv", F.lead(col).over(w))
    )
    step_s = tier_step_seconds(tier)
    n_steps = (
        F.unix_timestamp(F.col("_nb")) - F.unix_timestamp(F.col("bucket"))
    ) / F.lit(step_s)
    gaps = (
        with_next.where(
            F.col("_nb").isNotNull() & (F.col("_nb") > F.expr(f"bucket + {iv}"))
        )
        .withColumn("_n", n_steps.cast("long"))
        .select(
            "conv_id",
            F.col(col).alias("_v"),
            "_nv",
            "_n",
            F.posexplode(
                F.expr(f"sequence(bucket + {iv}, _nb - {iv}, {iv})")
            ).alias("_k0", "bucket"),
        )
        .select(
            "conv_id",
            "bucket",
            (
                F.col("_v").cast("double")
                + ((F.col("_nv") - F.col("_v")) * (F.col("_k0") + 1)) / F.col("_n")
            ).alias(col),
            F.lit(True).alias("interpolated"),
        )
    )
    base = with_next.select(
        "conv_id",
        "bucket",
        F.col(col).cast("double").alias(col),
        F.lit(False).alias("interpolated"),
    )
    return base.unionByName(gaps)


def lttb_downsample(
    points: DataFrame,
    n_out: int,
    by: str = "conv_id",
    ts_col: str = "ts_ns",
    v_col: str = "v",
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013), the
    standard viz-grade series thinning, in its PARALLEL fixed-anchor form:
    triangle anchors are the neighboring buckets' centroids rather than the
    previously *selected* point (classic LTTB is sequentially dependent;
    the centroid variant is the accepted parallelization and differs only
    marginally in practice). Per series: rank points, assign ``n_out``
    equal-count buckets, keep the point per bucket maximizing the triangle
    area against the neighbor centroids; first/last buckets keep their
    first/last point as LTTB prescribes.

    Fully shuffle-bounded: one window rank, one bucket aggregate, one
    argmax — no per-row Python, no sequential pass.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(by).orderBy("_t")
    cnt = Window.partitionBy(by)
    pts = (
        points.select(by, F.col(ts_col).alias("_t"), F.col(v_col).alias("_v"))
        .withColumn("_r", F.row_number().over(w) - 1)
        .withColumn("_cnt", F.count(F.lit(1)).over(cnt))
        # equal-count buckets over the rank; guarded so n_out >= count
        # degenerates to the identity
        # explicit floor (not cast) so the SQL oracle can restate it exactly;
        # the rank is widened to 64-bit BEFORE the multiply (row_number is
        # 32-bit — _r * n_out would wrap past ~2^31/n_out points)
        .withColumn(
            "_b",
            F.least(
                F.floor(F.col("_r").cast("long") * n_out / F.col("_cnt")),
                F.lit(n_out - 1),
            ),
        )
    )
    # centroids from EXACT arithmetic, kept SMALL so every float step is
    # exact or correctly rounded in BOTH engines: a plain decimal/hugeint
    # sum of epoch-ns values exceeds 2^53 and its double cast is not
    # correctly rounded in every engine (a 1-ulp centroid shift could flip
    # an area argmax). Instead: mean = min + (sum - cnt*min)/cnt, where the
    # relative sum is exact integer arithmetic of bucket-span magnitude
    # (< 2^53 -> exact double), int64 min -> double is correctly rounded
    # everywhere, and the division/addition are one rounding each.
    def _cmean_exprs(c, mn, sm, cnt_):
        rel = (F.col(sm).cast("decimal(38,0)") - F.col(cnt_).cast("decimal(38,0)") * F.col(mn)).cast(
            "double"
        )
        return F.col(mn).cast("double") + rel / F.col(cnt_)

    cent = (
        pts.groupBy(by, "_b")
        .agg(
            F.min("_t").alias("_mt"),
            F.sum(F.col("_t").cast("decimal(38,0)")).alias("_st"),
            F.min("_v").alias("_mv"),
            F.sum(F.col("_v").cast("decimal(38,0)")).alias("_sv"),
            F.count(F.lit(1)).alias("_c"),
        )
        .select(
            by,
            "_b",
            _cmean_exprs("_t", "_mt", "_st", "_c").alias("_ct"),
            _cmean_exprs("_v", "_mv", "_sv", "_c").alias("_cv"),
        )
    )
    wb = Window.partitionBy(by).orderBy("_b")
    cent = (
        cent.withColumn("_pt", F.lag("_ct").over(wb))
        .withColumn("_pv", F.lag("_cv").over(wb))
        .withColumn("_nt", F.lead("_ct").over(wb))
        .withColumn("_nv", F.lead("_cv").over(wb))
    )
    j = pts.join(cent, [by, "_b"])
    # triangle area (x2) against the neighbor centroids
    area = F.abs(
        (F.col("_pt") - F.col("_nt")) * (F.col("_v") - F.col("_pv"))
        - (F.col("_pt") - F.col("_t")) * (F.col("_nv") - F.col("_pv"))
    )
    first_last = F.col("_pt").isNull() | F.col("_nt").isNull()
    # first bucket keeps its FIRST point, last bucket its LAST (LTTB ends)
    edge_rank = F.when(F.col("_pt").isNull(), F.col("_r")).otherwise(-F.col("_r"))
    ww = Window.partitionBy(by, "_b").orderBy(
        F.when(first_last, edge_rank).otherwise(-area), F.col("_t")
    )
    return (
        j.withColumn("_rn", F.row_number().over(ww))
        .where(F.col("_rn") == 1)
        .select(by, F.col("_t").alias(ts_col), F.col("_v").alias(v_col))
    )


def role_mix(transcripts: DataFrame, tier: str = "1h") -> DataFrame:
    """Role-mix continuous aggregate: per (conv, bucket, role) counts."""
    bucket = tier_bucket(tier, "ts")
    return transcripts.groupBy(F.col("conv_id"), bucket, F.col("role")).agg(
        F.count(F.lit(1)).alias("turns"),
        F.sum(F.length("text")).alias("token_volume"),
    )


def tool_rates(transcripts: DataFrame, tier: str = "1d") -> DataFrame:
    """Per-tool call rates per bucket (NULL tools excluded)."""
    bucket = tier_bucket(tier, "ts")
    return (
        transcripts.where(F.col("tool").isNotNull())
        .groupBy(F.col("tool"), bucket)
        .agg(
            F.count(F.lit(1)).alias("calls"),
            F.count_distinct("conv_id").alias("convs"),
        )
    )
