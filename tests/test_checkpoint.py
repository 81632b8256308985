"""Checkpoint/resume: manifests commit atomically; a resumed run processes
only the missing day partitions (the archiver-ack analog)."""

import os
import tempfile

import pytest

from tests.conftest import SF_DIR
from tmframe_spark.data.transcripts import load_transcripts
from tmframe_spark.ops.checkpoint import (
    checkpointed_rollup_run,
    done_partitions,
    pending_days,
)
from tmframe_spark.ops.rollup import with_ts_ns


def test_resume_skips_done_partitions(spark):
    t = with_ts_ns(load_transcripts(spark, SF_DIR)).where("conv_id in ('conv-0','conv-1')")
    out = tempfile.mkdtemp(prefix="tmframe_ckpt_out_")
    man = tempfile.mkdtemp(prefix="tmframe_ckpt_man_")

    all_days = pending_days(t, man)
    assert len(all_days) > 5

    # first run: only the first 3 days exist upstream (simulated partial run)
    t_head = t.where(f"to_date(ts) <= '{all_days[2]}'")
    m1 = checkpointed_rollup_run(t_head, out, man)
    assert [m.partition for m in m1] == [f"day={d}" for d in all_days[:3]]
    assert done_partitions(man) == {f"day={d}" for d in all_days[:3]}
    assert all(m.output_rows > 0 and m.output_bytes > 0 for m in m1)
    assert all(m.rows_per_sec > 0 for m in m1)

    # resume over the full input: must process ONLY the remaining days
    m2 = checkpointed_rollup_run(t, out, man)
    assert [m.partition for m in m2] == [f"day={d}" for d in all_days[3:]]

    # idempotent third run: nothing pending
    assert checkpointed_rollup_run(t, out, man) == []

    # outputs landed per partition through the catalog layer
    from tmframe_spark.data.catalog import Catalog

    cat = Catalog(spark, out)
    cat.kind["rollup_1m_blocks"] = "parquet"  # this runtime has no Iceberg
    assert cat.days("rollup_1m_blocks") == all_days
    for d in all_days:
        assert os.path.isdir(os.path.join(out, "rollup_1m_blocks", f"day={d}"))
    # read-back: full table and a pruned single day
    full = cat.read("rollup_1m_blocks")
    assert full.count() > 0 and "day" in full.columns
    one = cat.read_day("rollup_1m_blocks", all_days[0])
    assert 0 < one.count() <= full.count()
    # (the day= path component is type-inferred as DATE on read)
    assert str(one.select("day").distinct().collect()[0]["day"]) == all_days[0]


def test_catalog_falls_back_without_iceberg(spark, tmp_path):
    from tmframe_spark.data.catalog import Catalog

    df = spark.range(3).selectExpr(
        "cast(id as string) AS conv_id", "'2024-01-01' AS day", "id AS v"
    )
    cat = Catalog(spark, str(tmp_path))
    kind = cat.ensure_table("t1", df, partition_by=("day", "bucket(16, conv_id)"))
    assert kind == "parquet"  # no Iceberg jar in this container
    cat.overwrite_day("t1", df, "2024-01-01")
    cat.overwrite_day("t1", df, "2024-01-01")  # idempotent re-run
    assert cat.days("t1") == ["2024-01-01"]
    assert cat.read("t1").count() == 3
    with pytest.raises(ValueError):
        cat.ensure_table("bad name; drop", df)


def test_catalog_empty_table_reads_empty(spark, tmp_path):
    # ADVICE r2: a table that exists (ensure_table ran) but has no committed
    # day yet must read as an empty DataFrame, symmetric with Iceberg —
    # not raise PATH_NOT_FOUND from the day=* glob
    from tmframe_spark.data.catalog import Catalog

    df = spark.range(3).selectExpr(
        "cast(id as string) AS conv_id", "'2024-01-01' AS day", "id AS v"
    )
    cat = Catalog(spark, str(tmp_path))
    cat.ensure_table("t_empty", df, partition_by=("day", "bucket(16, conv_id)"))
    empty = cat.read("t_empty")
    assert empty.count() == 0
    assert set(df.columns).issubset(set(empty.columns))
    # a Catalog instance that never saw ensure_table has no schema to offer
    cat2 = Catalog(spark, str(tmp_path))
    with pytest.raises(FileNotFoundError):
        cat2.read("t_never_created")
    # after the first committed day the normal read path takes over
    cat.overwrite_day("t_empty", df, "2024-01-01")
    assert cat.read("t_empty").count() == 3


def test_catalog_read_day_is_partition_pruned(spark, tmp_path):
    # the archive->serve loop (q_archive_asof_serving) reads through
    # Catalog.read_day; the day predicate must land on the partition
    # directory (metadata-only selection), never a row scan
    from tmframe_spark.data.catalog import Catalog

    df = spark.range(4).selectExpr(
        "cast(id as string) AS conv_id", "id AS v"
    )
    cat = Catalog(spark, str(tmp_path))
    cat.ensure_table("t_pruned", df.selectExpr("*", "'x' AS day"),
                     partition_by=("day", "bucket(16, conv_id)"))
    for d in ("2024-01-01", "2024-01-02", "2024-01-03"):
        cat.overwrite_day("t_pruned", df, d)
    one = cat.read_day("t_pruned", "2024-01-02")
    assert one.count() == 4
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    seg = plan.split("PartitionFilters", 1)[1][:300]
    assert "day" in seg, seg


def test_catalog_iceberg_branch_gated(spark, tmp_path):
    # the Iceberg DDL branch can only execute where the runtime ships the
    # jar; this gate-test runs it there and SKIPS (never silently passes)
    # here, so a CI with Iceberg exercises the branch automatically
    from tmframe_spark.data.catalog import Catalog

    df = spark.range(3).selectExpr(
        "cast(id as string) AS conv_id", "'2024-01-01' AS day", "id AS v"
    )
    cat = Catalog(spark, str(tmp_path))
    kind = cat.ensure_table("t_iceberg_gate", df,
                            partition_by=("day", "bucket(16, conv_id)"))
    if kind != "iceberg":
        pytest.skip("no Iceberg runtime in this container (parquet fallback "
                    "contract covered by test_catalog_falls_back_without_iceberg)")
    cat.overwrite_day("t_iceberg_gate", df, "2024-01-01")
    assert cat.days("t_iceberg_gate") == ["2024-01-01"]
    assert cat.read_day("t_iceberg_gate", "2024-01-01").count() == 3


def test_job_blocks_equal_compositional_form(spark):
    """The job's fused per-day pack (rollup -> pack_rollup_blocks) must
    write byte-identical blocks to the spine-materializing composition it
    replaced (gap_fill -> pack_blocks) — the round-4 scale fix removed an
    ~80x shuffle blowup, not a byte of output."""
    import tempfile

    from pyspark.sql import functions as F

    from tmframe_spark.codec.udfs import bucket_ts_ns, pack_blocks
    from tmframe_spark.data.catalog import Catalog
    from tmframe_spark.ops.rollup import gap_fill, rollup

    t = with_ts_ns(load_transcripts(spark, SF_DIR)).where(
        "conv_id in ('conv-0','conv-1','conv-2')"
    )
    out = tempfile.mkdtemp(prefix="tmframe_ckpt_eq_out_")
    man = tempfile.mkdtemp(prefix="tmframe_ckpt_eq_man_")
    day = pending_days(t, man)[0]
    t_day = t.where(f"to_date(ts) = '{day}'")
    checkpointed_rollup_run(t_day, out, man)

    cat = Catalog(spark, out)
    cat.kind["rollup_1m_blocks"] = "parquet"
    got = {
        (r["conv_id"], str(r["day"])): (bytes(r["frame"]), r["n_points"])
        for r in cat.read("rollup_1m_blocks").collect()
    }

    m1 = gap_fill(rollup(t_day, "1m"), "1m")
    pts = m1.select(
        "conv_id",
        F.lit(day).alias("day"),
        bucket_ts_ns().alias("ts_ns"),
        F.col("token_volume").cast("double").alias("v0"),
        F.col("turns").cast("long").alias("v1"),
    )
    want = {
        (r["conv_id"], r["day"]): (bytes(r["frame"]), r["n_points"])
        for r in pack_blocks(pts, ["conv_id", "day"], v0="v0", v1="v1").collect()
    }
    assert set(got) == set(want)
    assert all(got[k] == want[k] for k in want)


def test_backfill_rerolls_only_stale_days_byte_identical(spark):
    """Late rows landing in an ALREADY-COMMITTED day: stale_days flags
    exactly that day, backfill_run rewrites it to the same bytes a
    from-scratch run over the complete input produces, and untouched
    days' blocks are not rewritten."""
    from pyspark.sql import functions as F

    from tmframe_spark.data.catalog import Catalog
    from tmframe_spark.ops.checkpoint import backfill_run, stale_days

    t = with_ts_ns(load_transcripts(spark, SF_DIR)).where(
        "conv_id in ('conv-0','conv-1')"
    )
    days = sorted(
        r["d"] for r in t.select(
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("d")
        ).distinct().collect()
    )[:3]
    t3 = t.where(F.date_format(F.to_date("ts"), "yyyy-MM-dd").isin(days))
    late_day = days[1]
    # hold back half of the middle day's rows (odd turn_idx = "late")
    late_mask = (
        F.date_format(F.to_date("ts"), "yyyy-MM-dd") == late_day
    ) & (F.col("turn_idx") % 2 == 1)
    early = t3.where(~late_mask)

    out_a = tempfile.mkdtemp(prefix="tmframe_bf_a_")
    man_a = tempfile.mkdtemp(prefix="tmframe_bf_ma_")
    checkpointed_rollup_run(early, out_a, man_a)
    assert stale_days(early, man_a) == []  # nothing late yet
    assert backfill_run(early, out_a, man_a) == []

    # the late rows arrive: exactly the middle day is stale
    assert stale_days(t3, man_a) == [late_day]
    cat_a = Catalog(spark, out_a)
    cat_a.kind["rollup_1m_blocks"] = "parquet"
    pre = {
        d: sorted(
            (r["conv_id"], bytes(r["frame"]))
            for r in cat_a.read_day("rollup_1m_blocks", d).collect()
        )
        for d in days
    }
    bf = backfill_run(t3, out_a, man_a)
    assert [m.partition for m in bf] == [f"day={late_day}"]
    assert stale_days(t3, man_a) == []  # manifest updated
    assert checkpointed_rollup_run(t3, out_a, man_a) == []  # nothing pending

    # from-scratch truth over the complete input
    out_b = tempfile.mkdtemp(prefix="tmframe_bf_b_")
    man_b = tempfile.mkdtemp(prefix="tmframe_bf_mb_")
    checkpointed_rollup_run(t3, out_b, man_b)
    cat_b = Catalog(spark, out_b)
    cat_b.kind["rollup_1m_blocks"] = "parquet"
    for d in days:
        got = sorted(
            (r["conv_id"], bytes(r["frame"]))
            for r in cat_a.read_day("rollup_1m_blocks", d).collect()
        )
        want = sorted(
            (r["conv_id"], bytes(r["frame"]))
            for r in cat_b.read_day("rollup_1m_blocks", d).collect()
        )
        assert got == want, f"day {d} diverges from the from-scratch run"
        if d != late_day:
            assert got == pre[d], f"untouched day {d} was rewritten"
    # non-vacuity: the pre-backfill middle day (built from half the rows)
    # genuinely differed from the backfilled truth
    assert pre[late_day] != sorted(
        (r["conv_id"], bytes(r["frame"]))
        for r in cat_b.read_day("rollup_1m_blocks", late_day).collect()
    )
