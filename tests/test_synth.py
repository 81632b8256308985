"""Synthetic transcript generator: determinism across parallelism, skew
shape, and salted-rollup equivalence on genuinely skewed data."""

from pyspark.sql import functions as F

from tmframe_spark.data.transcripts import synth_transcripts
from tmframe_spark.ops.rollup import gap_fill, rollup


def test_deterministic_across_parallelism(spark):
    a = synth_transcripts(spark, 20_000, 50).repartition(3)
    b = synth_transcripts(spark, 20_000, 50).repartition(17)
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "ts_ns"]
    pa = a.select(cols).orderBy("conv_id", "turn_idx").toPandas()
    pb = b.select(cols).orderBy("conv_id", "turn_idx").toPandas()
    for c in cols:
        assert (pa[c].astype(str).values == pb[c].astype(str).values).all(), c


def test_skew_shape(spark):
    t = synth_transcripts(spark, 100_000, 500, hot_conv_pct=10)
    sizes = t.groupBy("conv_id").count()
    hot = sizes.where(F.col("conv_id") == "conv-0").collect()[0]["count"]
    med = sizes.where(F.col("conv_id") != "conv-0").agg(
        F.expr("percentile(count, 0.5)")
    ).collect()[0][0]
    assert hot > 40 * med, f"conv-0 ({hot}) should dwarf the median ({med})"


def test_salted_rollup_equals_unsalted_on_skewed_data(spark):
    t = synth_transcripts(spark, 50_000, 200, hot_conv_pct=20)
    plain = gap_fill(rollup(t, "1m"), "1m")
    salted = gap_fill(rollup(t, "1m", salt=16), "1m")
    cols = ["conv_id", "bucket", "turns", "token_volume", "tool_calls",
            "user_turns", "assistant_turns"]
    a = plain.select(cols).orderBy("conv_id", "bucket").toPandas()
    b = salted.select(cols).orderBy("conv_id", "bucket").toPandas()
    assert len(a) == len(b)
    for c in cols:
        assert (a[c].astype(str).values == b[c].astype(str).values).all(), c


def test_turn_idx_dense_per_conv(spark):
    t = synth_transcripts(spark, 5_000, 20)
    chk = t.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("turn_idx").alias("mn"),
        F.max("turn_idx").alias("mx"),
        F.count_distinct("turn_idx").alias("d"),
    )
    bad = chk.where(
        (F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1) | (F.col("d") != F.col("n"))
    ).count()
    assert bad == 0
