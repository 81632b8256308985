"""Retention tiers: keep 1m for D days, 1h for W weeks, 1d forever.

The reference's retention story is the day-partitioned archive
(archiver/filemgr.go:94-104) — old days age out by partition. Here retention
is expressed as partition-level predicates over the tier tables so the
delete/compact is a metadata operation on a date-partitioned layout
(Iceberg `days(ts)` transform; parquet `partitionBy(date)` fallback) —
never a row scan.
"""

from __future__ import annotations

from datetime import date, timedelta

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default policy: minutes for 7 days, hours for 90 days, days forever
DEFAULT_POLICY = {"1m": 7, "1h": 90, "1d": None}


def retained(tier_df: DataFrame, tier: str, as_of, policy=None) -> DataFrame:
    """Rows of ``tier_df`` that the policy keeps as of ``as_of``.

    ``as_of``: a Column/literal timestamp (normally max(ts) of the dataset
    or now()). The predicate compares whole days so it aligns with the
    day-partitioned physical layout (partition pruning, no row scan).
    """
    days = (policy or DEFAULT_POLICY)[tier]
    if days is None:
        return tier_df
    cutoff = F.date_sub(F.to_date(as_of), days)
    return tier_df.where(F.to_date(F.col("bucket")) >= cutoff)


def retained_asof_df(
    tier_df: DataFrame, tier: str, as_of_df: DataFrame, policy=None
) -> DataFrame:
    """Like ``retained`` but the as-of instant comes from a 1-row DataFrame
    (column ``_as_of``) instead of a driver-side scalar.

    Keeps the whole pipeline lazy (no mid-plan collect): the 1-row aggregate
    is broadcast and cross-joined, so Catalyst folds it into the filter as a
    BroadcastNestedLoopJoin over one row — one job instead of two.
    """
    days = (policy or DEFAULT_POLICY)[tier]
    if days is None:
        return tier_df
    cutoff = F.date_sub(F.to_date(F.col("_as_of")), days)
    return (
        tier_df.crossJoin(F.broadcast(as_of_df))
        .where(F.to_date(F.col("bucket")) >= cutoff)
        .drop("_as_of")
    )


def expired(tier_df: DataFrame, tier: str, as_of, policy=None) -> DataFrame:
    """Complement of ``retained`` — the partitions a vacuum job would drop."""
    days = (policy or DEFAULT_POLICY)[tier]
    if days is None:
        return tier_df.limit(0)
    cutoff = F.date_sub(F.to_date(as_of), days)
    return tier_df.where(F.to_date(F.col("bucket")) < cutoff)


def read_tiered(
    tiers: dict[str, DataFrame], as_of, policy=None, day_col: str = "day"
) -> DataFrame:
    """Answer a read from the finest tier the policy still retains at each
    epoch: 1m rows inside the 1m retention window, 1h rows between the 1h
    and 1m cutoffs, 1d rows older still — the serving twin of the retention
    policy (the TimescaleDB-style tiered continuous-aggregate read).

    The windows partition time exactly, with the same whole-day boundary
    arithmetic as ``retained``, so every bucket is answered by exactly one
    tier; a ``tier`` column tags the source. Tier frames must share a
    schema (the rollup / cascade_up shape).

    Pruning: when a tier frame carries ``day_col`` (the Catalog layout
    contract, where day == to_date(bucket)), the window predicate targets
    that column and reaches the source as a PARTITION filter — a
    metadata-only selection that never opens out-of-window files. Without
    it the predicate falls back to ``to_date(bucket)``, which Catalyst
    still pushes as a bucket min/max data filter (row-group skipping —
    file-stat pruning, one level weaker).
    """
    pol = policy or DEFAULT_POLICY
    order = [t for t in ("1m", "1h", "1d") if t in tiers]
    if not order:
        raise ValueError("tiers must contain at least one of '1m'/'1h'/'1d'")
    missing = [t for t in order if t not in pol]
    if missing:
        raise ValueError(
            f"policy has no retention entry for tiers {missing} "
            f"(every tier passed in `tiers` needs one; None = keep forever)"
        )
    out = None
    finer_cutoff = None  # exclusive upper bound inherited from the finer tier
    finer_keep = None  # that tier's retention days (for monotonicity check)
    covered_all = False  # an unbounded finer tier already answered everything
    for t in order:
        df = tiers[t]
        keep = pol[t]
        # the exactly-one-tier invariant requires retention to grow (or stay)
        # fine -> coarse: a coarser tier retaining LESS than a finer one
        # gets an unsatisfiable window (a silent coverage hole for the
        # epochs past its own cutoff), and if a later unbounded tier then
        # inherits the SMALLER cutoff it re-serves epochs the finer tier
        # already answered — double-counted sums downstream
        if (
            not covered_all
            and finer_keep is not None
            and keep is not None
            and keep < finer_keep
        ):
            raise ValueError(
                f"retention must be non-decreasing fine->coarse: tier {t!r} "
                f"keeps {keep} days, less than the finer tier's {finer_keep} "
                f"(this tier's window would be empty and coverage would hole "
                f"or double-serve)"
            )
        d = (
            F.to_date(F.col(day_col))
            if day_col and day_col in df.columns
            else F.to_date(F.col("bucket"))
        )
        if covered_all:
            cond = F.lit(False)
        else:
            cond = F.lit(True)
            if keep is not None:
                cond = d >= F.date_sub(F.to_date(as_of), keep)
            if finer_cutoff is not None:
                cond = cond & (d < finer_cutoff)
        part = df.where(cond).withColumn("tier", F.lit(t))
        out = part if out is None else out.unionByName(part)
        if keep is None:
            covered_all = True
        else:
            finer_cutoff = F.date_sub(F.to_date(as_of), keep)
            finer_keep = keep
    return out


def vacuum_expired_days(cat, name: str, tier: str, as_of_day: str, policy=None) -> list[str]:
    """Execute the retention policy against a Catalog tier table: drop every
    whole day partition older than the tier's cutoff. Returns the dropped
    days (ISO strings), oldest first.

    The executable form of ``expired``: one metadata listing decides the
    set and ``Catalog.drop_days_before`` expires it (a single ranged
    partition-aligned DELETE on Iceberg; directory removes in the parquet
    fallback) — no row is ever scanned, at any archive size. Cutoff
    semantics match ``retained`` exactly: day >= as_of - days is kept, so
    day < cutoff is dropped. Idempotent: a crashed vacuum re-run re-lists
    and re-drops only what remains.
    """
    keep_days = (policy or DEFAULT_POLICY)[tier]
    if keep_days is None:
        return []
    cutoff = (date.fromisoformat(as_of_day) - timedelta(days=keep_days)).isoformat()
    return cat.drop_days_before(name, cutoff)
