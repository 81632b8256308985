"""Retention policy API: retained/expired partition-predicate pair (the
scalar-as-of twins of retained_asof_df, which the retention_1m oracle
covers). The reference analog is day-partition aging of the archive tree
(archiver/filemgr.go:94-104)."""

from datetime import date

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
