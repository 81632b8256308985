"""Retention policy API: retained/expired partition-predicate pair (the
scalar-as-of twins of retained_asof_df, which the retention_1m oracle
covers). The reference analog is day-partition aging of the archive tree
(archiver/filemgr.go:94-104)."""

from datetime import date

import pytest
from pyspark.sql import functions as F

from tmframe_spark.ops.retention import DEFAULT_POLICY, expired, retained


def _tier(spark):
    # 30 daily buckets ending 2024-03-01
    return spark.sql(
        "SELECT explode(sequence(timestamp'2024-02-01', timestamp'2024-03-01',"
        " interval 1 day)) AS bucket"
    ).withColumn("turns", F.lit(1))


def test_retained_expired_complement(spark):
    t = _tier(spark)
    as_of = F.lit("2024-03-01")
    kept = retained(t, "1m", as_of, policy={"1m": 7})
    dropped = expired(t, "1m", as_of, policy={"1m": 7})
    n_all, n_kept, n_drop = t.count(), kept.count(), dropped.count()
    assert n_kept + n_drop == n_all  # exact complement
    # 7-day policy keeps the cutoff day itself: 2024-02-23 .. 2024-03-01
    assert n_kept == 8
    assert min(r["bucket"].date() for r in kept.collect()) == date(2024, 2, 23)
    assert max(r["bucket"].date() for r in dropped.collect()) == date(2024, 2, 22)


def test_unbounded_tier_keeps_everything(spark):
    t = _tier(spark)
    as_of = F.lit("2030-01-01")
    assert DEFAULT_POLICY["1d"] is None
    assert retained(t, "1d", as_of).count() == t.count()
    assert expired(t, "1d", as_of).count() == 0


def test_vacuum_expired_days_matches_retained(spark, tmp_path):
    """vacuum_expired_days drops exactly the partitions expired() selects:
    after the vacuum, the catalog holds precisely retained()'s rows — and
    nothing was row-scanned to get there (day listing + partition drops)."""
    from tmframe_spark.data.catalog import Catalog
    from tmframe_spark.ops.retention import vacuum_expired_days

    t = _tier(spark).withColumn("day", F.to_date("bucket"))
    cat = Catalog(spark, str(tmp_path))
    cat.ensure_table("tier1m", t)
    for d in [r["day"].isoformat() for r in t.select("day").distinct().collect()]:
        cat.overwrite_day("tier1m", t.where(F.col("day") == F.lit(d)), d)
    assert len(cat.days("tier1m")) == 30

    dropped = vacuum_expired_days(
        cat, "tier1m", "1m", "2024-03-01", policy={"1m": 7}
    )
    assert dropped == sorted(dropped) and len(dropped) == 22
    assert cat.days("tier1m") == [
        f"2024-02-{dd}" for dd in range(23, 30)
    ] + ["2024-03-01"]

    want = retained(t, "1m", F.lit("2024-03-01"), policy={"1m": 7})
    got = cat.read("tier1m")
    assert got.count() == want.count() == 8
    assert sorted(r["day"] for r in got.select("day").collect()) == sorted(
        r["day"] for r in want.select(F.to_date("bucket").alias("day")).collect()
    )

    # idempotent: nothing left to drop at the same as-of
    assert vacuum_expired_days(cat, "tier1m", "1m", "2024-03-01", policy={"1m": 7}) == []
    # unbounded tier never drops; missing-day drop reports False
    assert vacuum_expired_days(cat, "tier1m", "1d", "2030-01-01") == []
    assert cat.drop_day("tier1m", "1999-01-01") is False


def test_read_tiered_rejects_bad_policies(spark):
    from tmframe_spark.ops.retention import read_tiered

    t = _tier(spark)
    # coarser tier retaining LESS than a finer one would double-serve
    with pytest.raises(ValueError, match="non-decreasing"):
        read_tiered(
            {"1m": t, "1h": t, "1d": t},
            F.lit("2024-03-01"),
            policy={"1m": 30, "1h": 7, "1d": None},
        ).count()
    # a policy that omits a passed tier fails with a clear message
    with pytest.raises(ValueError, match="no retention entry"):
        read_tiered({"1m": t, "1h": t}, F.lit("2024-03-01"), policy={"1m": 7})
    # equal keeps are fine (the coarser window is empty, not double-served);
    # an unbounded finer tier makes later keeps irrelevant (never served)
    assert read_tiered(
        {"1m": t, "1h": t}, F.lit("2024-03-01"), policy={"1m": 7, "1h": 7}
    ).where("tier = '1h'").count() == 0
    assert read_tiered(
        {"1m": t, "1h": t}, F.lit("2024-03-01"), policy={"1m": None, "1h": 3}
    ).where("tier = '1h'").count() == 0


def test_read_tiered_over_catalog_prunes_each_tier(spark, tmp_path):
    """read_tiered against day-partitioned Catalog tier tables: every
    bucket is answered by exactly one tier, and each tier branch's day
    predicate reaches the parquet source as a PartitionFilter — a tiered
    read of a 10^5-day archive opens only each tier's own window."""
    from tmframe_spark.data.catalog import Catalog
    from tmframe_spark.ops.retention import read_tiered

    base = _tier(spark).withColumn("day", F.to_date("bucket"))
    cat = Catalog(spark, str(tmp_path))
    for name in ("t1m", "t1h", "t1d"):
        cat.ensure_table(name, base)
        for d in [r["day"].isoformat() for r in base.select("day").distinct().collect()]:
            cat.overwrite_day(name, base.where(F.col("day") == F.lit(d)), d)

    tiers = {"1m": cat.read("t1m"), "1h": cat.read("t1h"), "1d": cat.read("t1d")}
    policy = {"1m": 7, "1h": 21, "1d": None}
    out = read_tiered(tiers, F.lit("2024-03-01"), policy=policy)

    rows = out.select("bucket", "tier").collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r["tier"])
    # exact partition of time: each bucket from exactly one tier
    assert all(len(v) == 1 for v in by_bucket.values())
    assert len(by_bucket) == 30
    tiers_of = {b.date().isoformat(): v[0] for b, v in by_bucket.items()}
    assert tiers_of["2024-03-01"] == "1m" and tiers_of["2024-02-23"] == "1m"
    assert tiers_of["2024-02-22"] == "1h" and tiers_of["2024-02-09"] == "1h"
    assert tiers_of["2024-02-08"] == "1d" and tiers_of["2024-02-01"] == "1d"

    plan = out._jdf.queryExecution().executedPlan().toString()
    # all three scans carry a day PartitionFilter (1d's is day < cutoff_1h)
    segs = plan.split("PartitionFilters")[1:]
    with_day = [s for s in segs if "day" in s[:300]]
    assert len(with_day) >= 3, plan


def test_vacuum_then_tiered_read_loses_nothing(spark, tmp_path):
    """The retention lifecycle is closed: after vacuuming every tier to the
    SAME policy the tiered read uses, read_tiered returns exactly what it
    returned before the vacuum — each tier is only ever read inside its
    retained window, so dropping expired partitions never leaves a hole."""
    from tmframe_spark.data.catalog import Catalog
    from tmframe_spark.ops.retention import read_tiered, vacuum_expired_days

    base = _tier(spark).withColumn("day", F.to_date("bucket"))
    cat = Catalog(spark, str(tmp_path))
    for name in ("t1m", "t1h", "t1d"):
        cat.ensure_table(name, base)
        for d in [r["day"].isoformat() for r in base.select("day").distinct().collect()]:
            cat.overwrite_day(name, base.where(F.col("day") == F.lit(d)), d)

    policy = {"1m": 7, "1h": 21, "1d": None}
    as_of = "2024-03-01"

    def tiers():
        return {"1m": cat.read("t1m"), "1h": cat.read("t1h"), "1d": cat.read("t1d")}

    before = sorted(
        (r["tier"], r["bucket"].isoformat())
        for r in read_tiered(tiers(), F.lit(as_of), policy=policy)
        .select("tier", "bucket").collect()
    )
    dropped_1m = vacuum_expired_days(cat, "t1m", "1m", as_of, policy=policy)
    dropped_1h = vacuum_expired_days(cat, "t1h", "1h", as_of, policy=policy)
    dropped_1d = vacuum_expired_days(cat, "t1d", "1d", as_of, policy=policy)
    assert len(dropped_1m) == 22 and len(dropped_1h) == 8 and dropped_1d == []

    after = sorted(
        (r["tier"], r["bucket"].isoformat())
        for r in read_tiered(tiers(), F.lit(as_of), policy=policy)
        .select("tier", "bucket").collect()
    )
    assert after == before and len(after) == 30
