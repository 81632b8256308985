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
    assert cat._day_file_count("blk", "2024-03-02") == 8
    assert cat.read_day("blk", "2024-03-02").orderBy("conv_id").collect() == other_before
    assert cat.days("blk") == ["2024-03-01", "2024-03-02"]


def test_compact_day_validates_target(spark, tmp_path):
    cat = _fixture_table(spark, tmp_path)
    with pytest.raises(ValueError, match="target_files"):
        cat.compact_day("blk", "2024-03-01", target_files=0)
