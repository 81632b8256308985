"""pack_rollup_blocks (fused in-UDF gap-fill) must produce byte-identical
blocks to the compositional gap_fill() -> pack_blocks() path, for every tier
and group unit used by the flagship."""

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tmframe_spark.codec.udfs import pack_blocks, pack_rollup_blocks
from tmframe_spark.data.transcripts import load_transcripts
from tmframe_spark.ops.rollup import cascade_up, gap_fill, rollup, with_ts_ns


def blocks_dict(df, grp_col):
    return {
        (r["conv_id"], r[grp_col]): (bytes(r["frame"]), r["n_points"])
        for r in df.collect()
    }


def compositional(tier_df, tier, unit):
    g = gap_fill(tier_df, tier)
    pts = g.select(
        "conv_id",
        F.date_trunc(unit, "bucket").alias("grp"),
        F.expr("(unix_micros(cast(bucket as timestamp)) * 1000) & -8").alias("ts_ns"),
        F.col("token_volume").cast("double").alias("v0"),
        F.col("turns").cast("long").alias("v1"),
    )
    return pack_blocks(pts, ["conv_id", "grp"], v0="v0", v1="v1")


def test_fused_equals_compositional_all_tiers(spark):
    t = with_ts_ns(load_transcripts(spark, SF_DIR))
    m = rollup(t, "1m").persist()
    h = cascade_up(m, "1h")
    d = cascade_up(h, "1d")
    for tier_df, tier, unit in [(m, "1m", "day"), (h, "1h", "month"), (d, "1d", "year")]:
        fused = blocks_dict(pack_rollup_blocks(tier_df, tier, unit), "grp")
        comp = blocks_dict(compositional(tier_df, tier, unit), "grp")
        assert set(fused) == set(comp), f"{tier}: group keys differ"
        bad = [k for k in comp if fused[k] != comp[k]]
        assert not bad, f"{tier}: {len(bad)} blocks differ, e.g. {bad[:3]}"
    m.unpersist()


def test_ten_year_conversation_pack_carry_bound(spark):
    # verdict r2 #5 guard: the mapInPandas carry buffer is O(one
    # conversation's ROLLUP rows) — data-sized, bounded by calendar, never
    # the spine. A decade-long sparse conversation (one 1d rollup row per
    # month, 120 rows) must pack into per-year blocks whose gap-filled
    # spine (3653 days) exists only inside the encoder, and decode back
    # losslessly.
    import pandas as pd

    from tmframe_spark.codec.udfs import unpack_blocks

    months = pd.date_range("2015-01-01", "2024-12-01", freq="MS")  # 120
    rows = [
        ("conv-decade", ts.to_pydatetime(), 3, 1000 + i)
        for i, ts in enumerate(months)
    ]
    rolled = spark.createDataFrame(
        rows, "conv_id string, bucket timestamp, turns long, token_volume long"
    )
    blocks = pack_rollup_blocks(rolled, "1d", "year")
    got = blocks.select("grp", "n_points").orderBy("grp").collect()
    assert len(got) == 10  # one block per calendar year
    # spine = every day from 2015-01-01 to 2024-12-01 inclusive
    assert sum(r["n_points"] for r in got) == (
        pd.Timestamp("2024-12-01") - pd.Timestamp("2015-01-01")
    ).days + 1
    pts = unpack_blocks(blocks, ["conv_id", "grp"], v0="v0", v1="v1").toPandas()
    assert len(pts) == sum(r["n_points"] for r in got)
    nz = pts[pts["v1"] > 0].sort_values("ts_ns").reset_index(drop=True)
    assert len(nz) == 120 and (nz["v1"] == 3).all()
    assert nz["v0"].tolist() == [1000.0 + i for i in range(120)]


def test_dense_conversation_routes_per_block_and_matches(spark):
    """A conversation above the ~400-data-rows-per-block routing threshold
    (pack_conv's dense branch) must produce blocks byte-identical to the
    compositional gap_fill -> pack_blocks path — the two branches share no
    encoder code path (whole-array per-block vs segmented batch), so this
    pins the router itself."""
    import pandas as pd

    # 3 days fully dense at 1m (1440 rows/day > 400 threshold) + 1 sparse
    # day, two convs (one crosses midnight with a gap)
    rows = []
    for conv, days, dense in [("conv-dense", 3, True), ("conv-mixed", 2, False)]:
        for d in range(days):
            minutes = range(1440) if dense or d == 0 else range(0, 1440, 97)
            for m in minutes:
                ts = pd.Timestamp("2024-03-01") + pd.Timedelta(days=d, minutes=m)
                rows.append((conv, ts.to_pydatetime(), 1 + (m % 5), m * 7 + d, 0, 0, 0))
    rolled = spark.createDataFrame(
        rows,
        "conv_id string, bucket timestamp, turns long, token_volume long, "
        "tool_calls long, user_turns long, assistant_turns long",
    )
    fused = blocks_dict(pack_rollup_blocks(rolled, "1m", "day"), "grp")
    comp = blocks_dict(compositional(rolled, "1m", "day"), "grp")
    assert set(fused) == set(comp)
    bad = [k for k in comp if fused[k] != comp[k]]
    assert not bad, f"{len(bad)} blocks differ, e.g. {bad[:3]}"
    # sanity: the dense conv really exceeded the routing threshold
    assert sum(1 for (c, _) in fused if c == "conv-dense") == 3


def _rows_dict(df):
    return {
        (r["conv_id"], r["grp"]): (
            r["n_points"],
            r["ts_first"],
            r["ts_last"],
            r["raw_nbytes"],
            bytes(r["frame"]),
        )
        for r in df.collect()
    }


def test_split_dense_pack_bytes_identical_with_empty_period(spark):
    """Round-4 verdict #3: the (conv, calendar-chunk) split pack must be
    byte-identical to the one-task-per-conv pack — including the
    span-trimmed first/last blocks and the all-zero block of an EMPTY
    calendar period inside the dense conv's span — while actually re-keying
    the dense conversation's rows by calendar chunk (parallel pack)."""
    import pandas as pd

    rows = []
    # hot conv: every other minute over Jan 1 (from 06:00), Jan 2, and
    # Jan 4 (to 18:00) — Jan 3 is an empty interior day that still owes
    # its all-zero block; odd minutes exercise in-block gap-fill
    for day, lo, hi in [
        ("2024-01-01", 6 * 60, 24 * 60),
        ("2024-01-02", 0, 24 * 60),
        ("2024-01-04", 0, 18 * 60),
    ]:
        base = pd.Timestamp(day)
        for m in range(lo, hi, 2):
            rows.append(("hot", (base + pd.Timedelta(minutes=m)).to_pydatetime(), 2, m))
    for m in range(5):
        ts = pd.Timestamp("2024-01-02") + pd.Timedelta(minutes=7 * m)
        rows.append(("cold", ts.to_pydatetime(), 1, m))
    rolled = spark.createDataFrame(
        rows, "conv_id string, bucket timestamp, turns long, token_volume long"
    )
    single = _rows_dict(pack_rollup_blocks(rolled, "1m", "day"))
    split_df = pack_rollup_blocks(rolled, "1m", "day", split_dense_rows=1000)
    plan = split_df._jdf.queryExecution().executedPlan().toString()
    # the dense branch really re-keys by (conv, calendar chunk)
    assert "_chunk" in plan, plan
    split = _rows_dict(split_df)
    assert set(split) == set(single)
    assert split == single
    # the empty Jan 3 interior day exists in both as a full-spine block
    jan3 = [k for k in single if k[0] == "hot" and str(k[1]).startswith("2024-01-03")]
    assert len(jan3) == 1 and single[jan3[0]][0] == 1440


def test_split_dense_pack_matches_at_month_unit(spark):
    # calendar-unit generality: hourly tier grouped by month, with an empty
    # interior month; threshold routes the single conv through the split
    import pandas as pd

    hours = list(pd.date_range("2024-02-01", "2024-02-28 23:00", freq="h")) + list(
        pd.date_range("2024-04-01", "2024-04-30 23:00", freq="h")
    )
    rows = [("hot", ts.to_pydatetime(), 1, i) for i, ts in enumerate(hours)]
    rolled = spark.createDataFrame(
        rows, "conv_id string, bucket timestamp, turns long, token_volume long"
    )
    single = _rows_dict(pack_rollup_blocks(rolled, "1h", "month"))
    split = _rows_dict(
        pack_rollup_blocks(rolled, "1h", "month", split_dense_rows=500)
    )
    assert split == single and len(single) == 3  # Feb, Mar (empty), Apr


def test_fused_equals_compositional_custom_5m_tier(spark):
    # arbitrary-step tier ('5m', epoch-floor time_bucket) must pass the
    # same fused-vs-compositional byte-identity gate as the named tiers
    from tmframe_spark.ops.rollup import rollup

    t = with_ts_ns(load_transcripts(spark, SF_DIR))
    r5 = rollup(t, "5m")
    fused = blocks_dict(pack_rollup_blocks(r5, "5m", "day"), "grp")
    comp = blocks_dict(compositional(r5, "5m", "day"), "grp")
    assert set(fused) == set(comp) and len(fused) > 0
    assert fused == comp


def test_pack_rejects_non_utc_session(spark):
    # review finding: the wire contract is UTC end to end — the pack must
    # fail loudly under a non-UTC session instead of silently skewing
    # epochs against its UTC calendar arithmetic
    import pandas as pd
    import pytest

    rolled = spark.createDataFrame(
        [("c", pd.Timestamp("2024-01-01").to_pydatetime(), 1, 1)],
        "conv_id string, bucket timestamp, turns long, token_volume long",
    )
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with pytest.raises(ValueError, match="timeZone=UTC"):
            pack_rollup_blocks(rolled, "1m", "day")
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
