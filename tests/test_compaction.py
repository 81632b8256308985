"""Day-partition compaction: fewer files, identical rows, other days
untouched — the archiver's one-file-per-day invariant recovered after
many-task commits (/root/reference/archiver/filemgr.go:94-104)."""

import pytest

from tmframe_spark.data.catalog import Catalog


def _fixture_table(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    df = spark.range(0, 400).selectExpr(
        "cast(id as string) AS conv_id",
        "cast(id % 7 as long) AS v",
        "date'2024-03-01' + cast(id % 2 AS int) AS day",
    )
    cat.ensure_table("blk", df)
    for day in ("2024-03-01", "2024-03-02"):
        # deliberately fragmented commit: 8 files in the day
        cat.overwrite_day(
            "blk", df.where(f"day = date'{day}'").repartition(8), day
        )
    return cat


def test_compact_day_merges_files_preserving_rows(spark, tmp_path):
    cat = _fixture_table(spark, tmp_path)
    before = (
        cat.read_day("blk", "2024-03-01")
        .orderBy("conv_id")
        .collect()
    )
    other_before = cat.read_day("blk", "2024-03-02").orderBy("conv_id").collect()

    stats = cat.compact_day("blk", "2024-03-01", target_files=1)
    assert stats["files_before"] == 8
    assert stats["files_after"] == 1
    assert stats["rows"] == len(before) == 200

    after = cat.read_day("blk", "2024-03-01").orderBy("conv_id").collect()
    assert after == before
    # the sibling day is untouched — compaction is day-scoped like the writes
    assert cat.day_file_count("blk", "2024-03-02") == 8
    assert cat.read_day("blk", "2024-03-02").orderBy("conv_id").collect() == other_before
    assert cat.days("blk") == ["2024-03-01", "2024-03-02"]


def test_compact_day_validates_target(spark, tmp_path):
    cat = _fixture_table(spark, tmp_path)
    with pytest.raises(ValueError, match="target_files"):
        cat.compact_day("blk", "2024-03-01", target_files=0)


def test_day_strings_validated_before_sql_or_paths(spark, tmp_path):
    """Day strings reach Iceberg SQL interpolation and day= directory paths;
    a malformed one (stray quote, path fragment) must raise before either
    (round-3 advice: only table names were regex-validated)."""
    cat = _fixture_table(spark, tmp_path)
    for bad in ("2024-03-01'; DROP", "../escape", "20240301", ""):
        for call in (
            lambda d: cat.drop_day("blk", d),
            lambda d: cat.drop_days_before("blk", d),
            lambda d: cat.day_file_count("blk", d),
            lambda d: cat.read_day("blk", d),
            lambda d: cat.overwrite_day("blk", cat.read("blk").limit(1), d),
        ):
            with pytest.raises(ValueError, match="bad day string"):
                call(bad)
    # the well-formed path is unaffected
    assert cat.day_file_count("blk", "2024-03-01") == 8


def test_maintenance_job_vacuum_then_compact(spark, tmp_path, capsys):
    """The spark-submit maintenance entry point end-to-end (in-process:
    main() picks up the session via getOrCreate): vacuum drops the expired
    day, compaction merges the older surviving day, and the newest
    (frontier) day is left untouched for ingest."""
    import json
    import sys

    sys.path.insert(0, "jobs")
    try:
        from maintenance_job import main
    finally:
        sys.path.pop(0)

    cat = Catalog(spark, str(tmp_path))
    df = spark.range(0, 600).selectExpr(
        "cast(id as string) AS conv_id",
        "cast(id % 7 as long) AS v",
        "date'2024-02-20' + cast(id % 3 AS int) * 5 AS day",  # 02-20, 02-25, 03-01
    )
    cat.ensure_table("blk", df)
    for day in ("2024-02-20", "2024-02-25", "2024-03-01"):
        cat.overwrite_day("blk", df.where(f"day = date'{day}'").repartition(4), day)

    rc = main([
        "--root", str(tmp_path), "--table", "blk",
        "--vacuum-as-of", "2024-03-01", "--tier", "1m", "--keep-days", "7",
        "--compact", "--target-files", "1", "--behind-days", "1",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    summary = lines[-1]
    # 02-20 is older than 7 days before 03-01 -> vacuumed; 02-25 kept+compacted
    assert summary == {
        "table": "blk", "days_vacuumed": 1, "days_compacted": 1,
        "days_remaining": 2,
    }
    assert {"action": "vacuum", "table": "blk", "day": "2024-02-20"} in lines
    assert cat.days("blk") == ["2024-02-25", "2024-03-01"]
    assert cat.day_file_count("blk", "2024-02-25") == 1   # compacted
    assert cat.day_file_count("blk", "2024-03-01") == 4   # frontier untouched
    assert cat.read("blk").count() == 400  # rows of the two surviving days

    # steady-state re-run: nothing to vacuum, already-compact days skipped
    # (no rewrite), frontier still untouched
    rc = main([
        "--root", str(tmp_path), "--table", "blk",
        "--vacuum-as-of", "2024-03-01", "--tier", "1m", "--keep-days", "7",
        "--compact", "--target-files", "1", "--behind-days", "1",
    ])
    assert rc == 0
    rerun = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rerun == [{
        "table": "blk", "days_vacuumed": 0, "days_compacted": 0,
        "days_remaining": 2,
    }]
    # behind_days larger than the archive protects everything (no negative
    # slice wrap): a compact-everything-protected run rewrites nothing
    rc = main([
        "--root", str(tmp_path), "--table", "blk",
        "--compact", "--target-files", "1", "--behind-days", "99",
    ])
    assert rc == 0
    wide = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert wide[-1]["days_compacted"] == 0
    assert cat.day_file_count("blk", "2024-03-01") == 4


def test_compact_day_missing_day_raises(spark, tmp_path):
    cat = _fixture_table(spark, tmp_path)
    with pytest.raises(ValueError, match="phantom"):
        cat.compact_day("blk", "2099-01-01")


def test_compact_day_cluster_by_sorts_and_zorders(spark, tmp_path):
    """cluster_by turns compaction into the layout fix: 'sort' leaves each
    file ordered by the compound key; 'zorder' clusters on the Morton
    value — both preserve rows exactly and stay day-scoped."""
    import glob
    import os

    cat = _fixture_table(spark, tmp_path)
    before = sorted(
        (r["conv_id"], r["v"]) for r in cat.read_day("blk", "2024-03-01").collect()
    )

    stats = cat.compact_day("blk", "2024-03-01", target_files=1, cluster_by=["v"])
    assert stats["files_after"] == 1 and stats["rows"] == len(before)
    day_dir = os.path.join(str(tmp_path), "blk", "day=2024-03-01")
    f = glob.glob(os.path.join(day_dir, "*.parquet"))[0]
    vs = [r["v"] for r in spark.read.parquet(f).collect()]
    assert vs == sorted(vs), "file not sorted by the cluster key"
    after = sorted(
        (r["conv_id"], r["v"]) for r in cat.read_day("blk", "2024-03-01").collect()
    )
    assert after == before

    # zorder layout: same rows, valid layout arg gate
    stats2 = cat.compact_day(
        "blk", "2024-03-02", target_files=1, cluster_by=["v", "conv_id"],
        layout="zorder",
    )
    assert stats2["rows"] == 200
    after2 = cat.read_day("blk", "2024-03-02").count()
    assert after2 == 200
    with pytest.raises(ValueError, match="layout"):
        cat.compact_day("blk", "2024-03-01", cluster_by=["v"], layout="hilbert")


def test_maintenance_job_cluster_by_flag(spark, tmp_path, capsys):
    import json

    import jobs.maintenance_job as job

    _fixture_table(spark, tmp_path)
    rc = job.main([
        "--root", str(tmp_path), "--table", "blk", "--compact",
        "--behind-days", "0", "--target-files", "1",
        "--cluster-by", "v", "--cluster-layout", "sort",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    compacts = [l for l in lines if l.get("action") == "compact"]
    assert compacts and all(c["files_after"] == 1 for c in compacts)
    # the rewritten day is sorted by the cluster key
    import glob
    import os

    f = glob.glob(os.path.join(str(tmp_path), "blk", "day=2024-03-01", "*.parquet"))[0]
    vs = [r["v"] for r in spark.read.parquet(f).collect()]
    assert vs == sorted(vs)
