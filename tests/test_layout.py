"""Z-order layout (data/layout.py): Morton interleave correctness, and the
actual data-skipping property — row-group min/max statistics prune a
conv-range probe far better than a time-only sort, same rows either way."""

import tempfile

import pytest
from pyspark.sql import functions as F

from tmframe_spark.data.layout import (
    rowgroup_candidates,
    write_zordered,
    zorder_value,
)


def test_zorder_value_interleaves_bits(spark):
    # codes (0b10, 0b01), 2 bits: rounds (bit1: 1,0), (bit0: 0,1) -> 0b1001
    df = spark.range(1).select(
        zorder_value([F.lit(2).cast("long"), F.lit(1).cast("long")], 2).alias("z")
    )
    assert df.collect()[0]["z"] == 0b1001


def test_zorder_validation(spark):
    df = spark.range(4).select(F.col("id").alias("a"))
    with pytest.raises(ValueError, match="zorder"):
        write_zordered(df, "/tmp/never", [], bits=8)
    with pytest.raises(ValueError, match="zorder"):
        write_zordered(df, "/tmp/never", ["a", "a", "a"], bits=21)


def test_zorder_skips_rowgroups_on_secondary_key(spark):
    # 64 convs x 64 time slots x 32 rows: a time-sorted layout answers a
    # conv-range probe by touching (nearly) every row group; the z-ordered
    # layout prunes most of them from the same parquet statistics
    rows = (
        spark.range(64 * 64 * 32)
        .select(
            (F.col("id") % 64).alias("conv_num"),
            ((F.col("id") / 64).cast("long") % 64).alias("t"),
            F.concat(F.lit("x" * 96), F.col("id")).alias("payload"),
        )
    )
    naive = tempfile.mkdtemp(prefix="layout_naive_") + "/tbl"
    zed = tempfile.mkdtemp(prefix="layout_z_") + "/tbl"
    (
        rows.repartitionByRange(4, "t")
        .sortWithinPartitions("t")
        .write.mode("overwrite")
        .option("parquet.block.size", 65536)
        .parquet(naive)
    )
    write_zordered(rows, zed, ["conv_num", "t"], bits=6, num_files=4,
                   writer_options={"parquet.block.size": 65536})

    # identical content either way
    a = spark.read.parquet(naive).agg(
        F.count("*"), F.sum("conv_num"), F.sum("t")
    ).collect()[0]
    b = spark.read.parquet(zed).agg(
        F.count("*"), F.sum("conv_num"), F.sum("t")
    ).collect()[0]
    assert tuple(a) == tuple(b)

    nc, nt = rowgroup_candidates(naive, "conv_num", 10, 12)
    zc, zt = rowgroup_candidates(zed, "conv_num", 10, 12)
    assert nt > 8 and zt > 8, (nt, zt)  # the small block size took effect
    naive_frac, z_frac = nc / nt, zc / zt
    # time-sorted: conv 10..12 appears in (almost) every group
    assert naive_frac > 0.9, (nc, nt)
    # z-ordered: most groups are conv-coherent enough to be skipped
    assert z_frac < 0.5 * naive_frac, (zc, zt, nc, nt)
    # and the time dimension still prunes too (both layouts)
    ztc, ztt = rowgroup_candidates(zed, "t", 0, 7)
    assert ztc / ztt < 0.9, (ztc, ztt)
