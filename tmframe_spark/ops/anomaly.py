"""Time-series anomaly / change detection over rolled tiers.

Engine additions in the spirit of the reference's tier materialization
(tfgroup, cmd/tfgroup/tfgroup.go) — once a (conv, bucket) tier exists, the
natural next consumer questions are "which points are outliers?" and
"where did the level shift?".  Both operators are pure window arithmetic
over the rolled series:

- one shuffle, keyed by conv_id (the window partition key) — at 100 TB the
  state per task is one conversation's tier rows, already data-sized;
- every computed quantity is an EXACT int64 (sums / counts / products of
  window sums), so the results are bit-identical across engines and
  partitionings and both operators carry full DuckDB oracles;
- the classic float forms (z-score, mean delta) are recovered by the
  caller with one IEEE division if desired — the engine never divides, it
  compares cross-multiplied integers, which keeps the decision exact.

Overflow bounds (int64): with window W and per-bucket values <= V, the
largest product is W * (W*V)^2 = W^3 * V^2.  For W=60 that holds to
V ~ 2.0e6 (turns- or tool-count tiers are far below; a token_volume tier
at extreme scale should pre-scale V or use a shorter window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


#: seasonal baseline groupings: the window compares a bucket only against
#: prior buckets in the SAME season slot (e.g. 14:00 vs earlier 14:00s) —
#: the classic guard against flagging a daily rush hour as an anomaly.
SEASONS = {
    "hour_of_day": lambda: F.hour("bucket"),
    "day_of_week": lambda: F.dayofweek("bucket"),
}


def robust_anomalies(
    rolled: DataFrame,
    value_col: str = "turns",
    window: int = 60,
    min_n: int = 12,
    k: int = 3,
    season: str | None = None,
) -> DataFrame:
    """Rolling z-score outliers, decided in exact integer arithmetic.

    For each (conv, bucket) tier row, look at the ``window`` PRECEDING
    observed buckets of the same conversation (ROWS frame, current row
    excluded — the candidate never contaminates its own baseline).  With
    n = count, S = sum(v), SS = sum(v^2) over that frame, the point is
    anomalous when

        n >= min_n   AND   n * (n*v - S)^2  >  k^2 * (n*SS - S^2)

    which is exactly |z| > k (z with the population variance of the
    frame), cross-multiplied so both sides are int64.  A constant
    baseline (variance 0) flags ANY departing value — the right answer
    for e.g. a heartbeat series going quiet.

    Returns only the flagged rows: conv_id, bucket, value, plus the
    exact decision integers (n, num, den) so callers (and the DuckDB
    oracle) can re-derive z = sqrt(num/den)/... themselves.

    ``season``: optional seasonal baseline ('hour_of_day'/'day_of_week') —
    the frame then holds the preceding ``window`` observed buckets of the
    SAME season slot (14:00 compares against earlier 14:00s), so periodic
    peaks stop reading as outliers. Same shuffle key family (conv + a
    derived slot), same exact arithmetic.
    """
    parts = [F.col("conv_id")]
    if season is not None:
        parts.append(SEASONS[season]())  # KeyError on unknown season, loud
    v = F.col(value_col).cast("long")
    w = Window.partitionBy(*parts).orderBy("bucket").rowsBetween(-window, -1)
    n = F.count(F.lit(1)).over(w)
    s = F.sum(v).over(w)
    ss = F.sum(v * v).over(w)
    scored = rolled.select(
        "conv_id",
        "bucket",
        v.alias("value"),
        n.cast("long").alias("n"),
        (n * (n * v - s) * (n * v - s)).cast("long").alias("num"),
        (n * ss - s * s).cast("long").alias("den"),
    )
    return scored.where(
        (F.col("n") >= F.lit(min_n))
        & (F.col("num") > F.lit(k * k) * F.col("den"))
    )


def level_shifts(
    rolled: DataFrame,
    value_col: str = "turns",
    window: int = 30,
    min_n: int = 12,
    delta: int = 2,
) -> DataFrame:
    """Level-shift (changepoint) candidates via a two-sided mean contrast.

    For each tier row, compare the mean of the ``window`` PRECEDING
    observed buckets against the mean of the window STARTING AT the row
    (the row opens the "after" regime).  With (S_p, n_p) / (S_n, n_n) the
    two frame sums/counts, the row is a shift candidate when

        n_p >= min_n AND n_n >= min_n
        AND |S_n * n_p - S_p * n_n| > delta * n_p * n_n

    i.e. |mean_after - mean_before| > delta, cross-multiplied to exact
    int64.  Consecutive rows around a true shift all qualify; the
    strongest candidate is the max |diff| row — left to the caller (or a
    top-k per conv) so the primitive stays a pure per-row predicate.

    Returns flagged rows: conv_id, bucket, value, n_prev, s_prev, n_next,
    s_next, diff (= S_n*n_p - S_p*n_n, signed exact int).
    """
    v = F.col(value_col).cast("long")
    base = Window.partitionBy("conv_id").orderBy("bucket")
    wp = base.rowsBetween(-window, -1)
    wn = base.rowsBetween(0, window - 1)
    n_p = F.count(F.lit(1)).over(wp)
    s_p = F.sum(v).over(wp)
    n_n = F.count(F.lit(1)).over(wn)
    s_n = F.sum(v).over(wn)
    scored = rolled.select(
        "conv_id",
        "bucket",
        v.alias("value"),
        n_p.cast("long").alias("n_prev"),
        s_p.cast("long").alias("s_prev"),
        n_n.cast("long").alias("n_next"),
        s_n.cast("long").alias("s_next"),
        (s_n * n_p - s_p * n_n).cast("long").alias("diff"),
    )
    return scored.where(
        (F.col("n_prev") >= F.lit(min_n))
        & (F.col("n_next") >= F.lit(min_n))
        & (F.abs(F.col("diff")) > F.lit(delta) * F.col("n_prev") * F.col("n_next"))
    )
