"""Structured Streaming tier: incremental rollup and watermarked dedup,
driven batch-style with trigger(availableNow) against temp dirs."""

import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tmframe_spark.data.transcripts import load_transcripts
from tmframe_spark.streaming.stream import (
    read_transcript_stream,
    stream_dedup,
    stream_rollup,
)


@pytest.fixture(scope="module")
def landed(spark):
    """Transcripts written to a landing dir as the streaming source."""
    d = tempfile.mkdtemp(prefix="tmframe_stream_src_")
    t = load_transcripts(spark, SF_DIR)
    t.write.mode("overwrite").parquet(d)
    return d, t.schema, t


def test_stream_rollup_matches_batch(spark, landed):
    src, schema, t = landed
    stream = read_transcript_stream(spark, src, schema)
    agg = stream_rollup(stream, "1h", watermark="10 minutes")
    out = tempfile.mkdtemp(prefix="tmframe_stream_sink_")
    q = (
        agg.writeStream.format("memory")
        .queryName("rollup_1h_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql(
        "select conv_id, bucket, turns, token_volume, tool_calls from rollup_1h_stream"
    ).toPandas()
    want = (
        t.groupBy("conv_id", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("turns"),
            F.sum(F.length("text")).alias("token_volume"),
            F.count("tool").alias("tool_calls"),
        )
        .toPandas()
    )
    key = ["conv_id", "bucket"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w)
    for c in ["turns", "token_volume", "tool_calls"]:
        assert (g[c].to_numpy() == w[c].to_numpy()).all(), c


def test_stream_dedup_drops_duplicates(spark, landed):
    src, schema, t = landed
    # duplicate the source entirely: stream must emit each content key once
    dup_dir = tempfile.mkdtemp(prefix="tmframe_stream_dup_")
    t.write.mode("overwrite").parquet(dup_dir)
    t.write.mode("append").parquet(dup_dir)
    stream = read_transcript_stream(spark, dup_dir, schema)
    deduped = stream_dedup(stream, watermark="10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    n = spark.sql("select count(*) c from dedup_stream").collect()[0]["c"]
    distinct_keys = (
        t.select(
            F.xxhash64("conv_id", "role", "text", F.coalesce("tool", F.lit(""))).alias("k")
        )
        .distinct()
        .count()
    )
    assert n == distinct_keys


def test_continuous_rollup_materializes_finalized_windows(spark, landed):
    """Continuous aggregate: after draining the stream, the materialized
    table equals the batch rollup of every window the watermark closed.
    A later 'flush' file advances the watermark past all real data."""
    import os
    import tempfile
    import time

    from tmframe_spark.streaming.materialize import (
        materialize_continuous_rollup,
        read_materialized,
    )

    src_dir, schema, t = landed
    d = tempfile.mkdtemp(prefix="tmframe_cagg_src_")
    t.write.mode("overwrite").parquet(d)
    time.sleep(1.1)  # file-source orders batches by mtime: flush comes last
    mx = t.agg(F.max("ts")).collect()[0][0]
    flush = spark.createDataFrame(
        [("__flush__", 0, "system", "flush", None, mx)], schema
    ).withColumn("ts", (F.col("ts").cast("timestamp") + F.expr("interval 2 days")).cast(schema["ts"].dataType))
    flush.write.mode("append").parquet(d)

    root = tempfile.mkdtemp(prefix="tmframe_cagg_tbl_")
    q = materialize_continuous_rollup(
        spark, d, schema, root, tier="1h", watermark="10 minutes", max_files=4
    )
    q.awaitTermination(300)

    got = (
        read_materialized(spark, root, "rollup_1h_stream")
        .where(F.col("conv_id") != "__flush__")
        .select("conv_id", "bucket", "turns", "token_volume", "tool_calls")
        .toPandas()
    )
    want = (
        t.groupBy("conv_id", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("turns"),
            F.sum(F.length("text")).alias("token_volume"),
            F.count("tool").alias("tool_calls"),
        )
        .toPandas()
    )
    key = ["conv_id", "bucket"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w), (len(g), len(w))
    for c in ["turns", "token_volume", "tool_calls"]:
        assert (g[c].to_numpy() == w[c].to_numpy()).all(), c
    # per-batch manifests committed (the exactly-once evidence)
    mans = os.listdir(os.path.join(root, "_rollup_1h_stream_batches"))
    assert any(m.startswith("batch-") for m in mans)


def test_streaming_archiver_blocks_match_batch_and_serve(spark, landed):
    """The streaming ARCHIVER (materialize_continuous_blocks): after
    draining, decoding the streamed block archive equals the batch rollup
    of every closed window, AND the archive is directly servable — the
    two-level as-of seek answers probes over it, which also proves the
    cross-batch blocks of each conversation kept disjoint, time-ordered
    spans (the invariant serve_asof relies on)."""
    import os
    import tempfile
    import time

    from tmframe_spark.codec.udfs import unpack_blocks
    from tmframe_spark.ops.asof import asof_join
    from tmframe_spark.ops.serve import serve_asof
    from tmframe_spark.streaming.materialize import (
        materialize_continuous_blocks,
        read_materialized,
    )

    src_dir, schema, t = landed
    d = tempfile.mkdtemp(prefix="tmframe_sarch_src_")
    t.write.mode("overwrite").parquet(d)
    time.sleep(1.1)  # file-source orders batches by mtime: flush comes last
    mx = t.agg(F.max("ts")).collect()[0][0]
    flush = spark.createDataFrame(
        [("__flush__", 0, "system", "flush", None, mx)], schema
    ).withColumn(
        "ts",
        (F.col("ts").cast("timestamp") + F.expr("interval 2 days")).cast(
            schema["ts"].dataType
        ),
    )
    flush.write.mode("append").parquet(d)

    root = tempfile.mkdtemp(prefix="tmframe_sarch_tbl_")
    q = materialize_continuous_blocks(
        spark, d, schema, root, tier="1h", watermark="10 minutes", max_files=4
    )
    q.awaitTermination(300)

    blocks = (
        read_materialized(spark, root, "blocks_1h_stream")
        .where(F.col("conv_id") != "__flush__")
        .localCheckpoint()
    )
    got = (
        unpack_blocks(blocks, ["conv_id", "day"], v0="v0", v1="v1")
        .select("conv_id", "ts_ns", "v0", "v1")
        .toPandas()
    )
    want = (
        t.groupBy("conv_id", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("v1"),
            F.sum(F.length("text")).cast("double").alias("v0"),
        )
        .select(
            "conv_id",
            F.expr("(unix_micros(cast(bucket as timestamp)) * 1000) & -8").alias(
                "ts_ns"
            ),
            "v0",
            "v1",
        )
        .toPandas()
    )
    key = ["conv_id", "ts_ns"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w) and len(g) > 0, (len(g), len(w))
    for c in ("ts_ns", "v0", "v1"):
        assert (g[c].to_numpy() == w[c].to_numpy()).all(), c

    # serve the streaming-built archive through the two-level seek and
    # compare against decode-everything asof over the same blocks
    span = blocks.agg(
        F.min("ts_first").alias("lo"), F.max("ts_last").alias("hi")
    ).collect()[0]
    mid = int(span["lo"] + (span["hi"] - span["lo"]) // 2) + 999
    probes = blocks.select("conv_id").distinct().withColumn("ts_ns", F.lit(mid))
    served = (
        serve_asof(blocks, ["conv_id", "day"], ["conv_id"], probes)
        .orderBy("conv_id")
        .toPandas()
    )
    full = (
        asof_join(
            probes,
            unpack_blocks(blocks, ["conv_id", "day"]).withColumn(
                "_pseq", F.col("ts_ns")
            ),
            on="ts_ns", by=["conv_id"], seq="_pseq",
            value_cols=["v0", "v1"], tie="last", strict=False, prefix="m_",
        )
        .drop("m__pseq")
        .orderBy("conv_id")
        .toPandas()
    )
    cols = sorted(served.columns)
    assert (served[cols].to_numpy() == full[cols].to_numpy()).all()

    mans = os.listdir(os.path.join(root, "_blocks_1h_stream_batches"))
    assert any(m.startswith("batch-") for m in mans)


def test_consolidated_stream_archive_bit_equals_batch_pack(spark, landed, tmp_path):
    """Consolidation converges the streamed archive to the batch archive
    EXACTLY: after folding the per-batch partial blocks into canonical
    per-(conv, day) blocks through the Catalog, every frame's wire bytes
    equal a single batch pack of the same points — the encoder's
    partitioning-independence carried through the whole streaming path."""
    import tempfile
    import time

    from tmframe_spark.codec.udfs import pack_blocks
    from tmframe_spark.data.catalog import Catalog
    from tmframe_spark.streaming.materialize import (
        consolidate_stream_blocks,
        materialize_continuous_blocks,
    )

    src_dir, schema, t = landed
    d = tempfile.mkdtemp(prefix="tmframe_cons_src_")
    t.write.mode("overwrite").parquet(d)
    time.sleep(1.1)
    mx = t.agg(F.max("ts")).collect()[0][0]
    spark.createDataFrame(
        [("__flush__", 0, "system", "flush", None, mx)], schema
    ).withColumn(
        "ts",
        (F.col("ts").cast("timestamp") + F.expr("interval 2 days")).cast(
            schema["ts"].dataType
        ),
    ).write.mode("append").parquet(d)

    root = tempfile.mkdtemp(prefix="tmframe_cons_tbl_")
    q = materialize_continuous_blocks(
        spark, d, schema, root, tier="1h", watermark="10 minutes", max_files=4
    )
    q.awaitTermination(300)

    cat = Catalog(spark, str(tmp_path))
    stats = consolidate_stream_blocks(
        spark, root, "blocks_1h_stream", cat, "archive"
    )
    assert stats and sum(stats.values()) > 0

    got = (
        cat.read("archive")
        .where(F.col("conv_id") != "__flush__")
        .select("conv_id", F.col("day").cast("string").alias("day"),
                "n_points", "frame")
        .collect()
    )
    # the batch-built reference archive over the same closed windows
    want_pts = (
        t.groupBy("conv_id", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("v1"),
            F.sum(F.length("text")).cast("double").alias("v0"),
        )
        .select(
            "conv_id",
            F.to_date("bucket").alias("day"),
            F.expr("(unix_micros(cast(bucket as timestamp)) * 1000) & -8").alias(
                "ts_ns"
            ),
            "v0",
            "v1",
        )
    )
    want = {
        (r["conv_id"], str(r["day"])): (r["n_points"], bytes(r["frame"]))
        for r in pack_blocks(want_pts, ["conv_id", "day"], v0="v0", v1="v1")
        .select("conv_id", F.col("day").cast("string").alias("day"),
                "n_points", "frame")
        .collect()
    }
    assert len(got) == len(want) > 0
    for r in got:
        k = (r["conv_id"], r["day"])
        n, frame = want[k]
        assert r["n_points"] == n, k
        assert bytes(r["frame"]) == frame, f"wire bytes differ for {k}"


def test_archiver_job_drain_and_consolidate(spark, landed, tmp_path, capsys):
    """The spark-submit archiver entry point end-to-end (in-process main():
    getOrCreate picks up the session): drain the landing dir into the
    streamed block table, consolidate into the Catalog archive, and report
    JSON action lineage. A second run drains nothing new (the stream
    checkpoint carries offsets) and re-consolidates idempotently."""
    import json
    import sys
    import tempfile
    import time

    sys.path.insert(0, "jobs")
    try:
        from archiver_job import main
    finally:
        sys.path.pop(0)

    src_dir, schema, t = landed
    d = tempfile.mkdtemp(prefix="tmframe_ajob_src_")
    t.write.mode("overwrite").parquet(d)
    time.sleep(1.1)
    mx = t.agg(F.max("ts")).collect()[0][0]
    spark.createDataFrame(
        [("__flush__", 0, "system", "flush", None, mx)], schema
    ).withColumn(
        "ts",
        (F.col("ts").cast("timestamp") + F.expr("interval 2 days")).cast(
            schema["ts"].dataType
        ),
    ).write.mode("append").parquet(d)

    root = str(tmp_path / "stream_root")
    wh = str(tmp_path / "warehouse")
    argv = [
        "--source", d, "--root", root, "--tier", "1h",
        "--consolidate", "--warehouse", wh, "--archive-table", "archive",
    ]
    assert main(argv) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert lines[0] == {
        "action": "drained", "table": "blocks_1h_stream", "late_dropped_rows": 0
    }  # time-ordered landing: the late counter exists AND is zero
    summary = lines[-1]
    assert summary["table"] == "archive" and summary["canonical_blocks"] > 0

    # resume: nothing new to drain, consolidation is idempotent
    assert main(argv) == 0
    again = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert again[-1] == summary

    from tmframe_spark.data.catalog import Catalog

    cat = Catalog(spark, wh)
    assert len(cat.days("archive")) == summary["days_consolidated"]


def test_late_drop_counter_surfaces_misordered_landing(spark, landed, tmp_path):
    """Round-3 verdict #3: arbitrary-order landing silently lost ~72% of
    windows to the watermark. The drop must now be OBSERVABLE: a landing
    shard whose event times are behind the advanced watermark produces a
    nonzero late_dropped_rows in its batch manifest via record_late_drops."""
    import json
    import os
    import time

    from tmframe_spark.streaming.materialize import (
        materialize_continuous_blocks,
        record_late_drops,
    )

    _, schema, t = landed
    d = tempfile.mkdtemp(prefix="tmframe_late_src_")
    # shard A advances the watermark to the stream's end; shard C (the
    # oldest day) must land at micro-batch >= 2 because Spark's late-input
    # filter uses the PREVIOUS batch's watermark (one-batch lag; eviction
    # uses the current one) — shard B absorbs the lag batch
    days = sorted(
        str(r["d"]) for r in t.select(F.to_date("ts").alias("d")).distinct().collect()
    )
    assert len(days) >= 3, days
    newest, mid, oldest = days[-1], days[-2], days[0]
    a = t.where(F.to_date("ts") == newest)
    b = t.where(F.to_date("ts") == mid)
    c = t.where(F.to_date("ts") == oldest)
    # the state-operator counter counts post-partial-agg (conv, window)
    # groups, not raw input rows (see record_late_drops docstring)
    n_late = c.select("conv_id", F.date_trunc("hour", "ts")).distinct().count()
    assert n_late > 0
    a.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "part-a"))
    time.sleep(1.1)  # later mtime => later micro-batch
    b.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "part-b"))
    time.sleep(1.1)
    c.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "part-c"))

    root = str(tmp_path / "late_root")
    q = materialize_continuous_blocks(
        spark, os.path.join(d, "part-*"), schema, root,
        tier="1h", watermark="10 minutes", max_files=1,
    )
    q.awaitTermination(300)
    late = record_late_drops(q, root, "blocks_1h_stream")
    assert sum(late.values()) == n_late, late
    # polling protocol (round-4 advice #3): a poller passes the highest
    # batch id it already merged; only newer batches are touched again
    assert record_late_drops(q, root, "blocks_1h_stream", after_batch=max(late)) == {}
    resumed = record_late_drops(q, root, "blocks_1h_stream", after_batch=min(late))
    assert set(resumed) == {b for b in late if b > min(late)}
    # and the manifests carry it (observable without the query object)
    man_dir = os.path.join(root, "_blocks_1h_stream_batches")
    recorded = 0
    for fn in os.listdir(man_dir):
        if fn.endswith(".json"):
            with open(os.path.join(man_dir, fn)) as f:
                recorded += json.load(f).get("late_dropped_rows", 0)
    assert recorded == n_late


def test_consolidation_manifest_records_and_prune_fences(spark, landed, tmp_path):
    """Round-3 advice #4: consolidation now records consumed days in an
    atomic manifest; prune=True deletes the consumed batch=*/day= source
    dirs AFTER fencing the day, and fenced days are excluded from later
    consolidations (a partial source can never rebuild a canonical day)."""
    import glob
    import os
    import time

    from tmframe_spark.data.catalog import Catalog
    from tmframe_spark.streaming.materialize import (
        consolidate_stream_blocks,
        materialize_continuous_blocks,
        read_consolidation_manifest,
    )

    _, schema, t = landed
    d = tempfile.mkdtemp(prefix="tmframe_prune_src_")
    t.write.mode("overwrite").parquet(d)
    time.sleep(1.1)
    mx = t.agg(F.max("ts")).collect()[0][0]
    spark.createDataFrame(
        [("__flush__", 0, "system", "flush", None, mx)], schema
    ).withColumn(
        "ts",
        (F.col("ts").cast("timestamp") + F.expr("interval 2 days")).cast(
            schema["ts"].dataType
        ),
    ).write.mode("append").parquet(d)

    root = str(tmp_path / "stream_root")
    q = materialize_continuous_blocks(
        spark, d, schema, root, tier="1h", watermark="10 minutes", max_files=4
    )
    q.awaitTermination(300)

    cat = Catalog(spark, str(tmp_path / "wh"))
    stats = consolidate_stream_blocks(
        spark, root, "blocks_1h_stream", cat, "archive", prune=True
    )
    assert stats
    manifest = read_consolidation_manifest(root, "blocks_1h_stream")
    for day, n in stats.items():
        assert manifest[day] == {"blocks": n, "pruned": True}
        # consumed source dirs are gone
        assert not glob.glob(
            os.path.join(root, "blocks_1h_stream", "batch=*", f"day={day}")
        )
    served = {str(r["day"]): 1 for r in cat.read("archive").select("day").distinct().collect()}
    assert set(served) == set(stats)
    archive_rows = cat.read("archive").count()
    # fenced days are skipped by a re-consolidation even though their source
    # is gone — the canonical archive cannot be clobbered by a partial read
    again = consolidate_stream_blocks(
        spark, root, "blocks_1h_stream", cat, "archive",
        days=sorted(stats), prune=True,
    )
    assert again == {}
    assert cat.read("archive").count() == archive_rows


def test_stream_rollup_custom_tier_matches_batch(spark, landed):
    """Custom fixed-step tier through the STREAMING window: epoch-aligned
    tumbling 5m windows must produce exactly the batch tier_bucket('5m')
    buckets and aggregates."""
    from tmframe_spark.ops.rollup import tier_bucket

    src, schema, t = landed
    stream = read_transcript_stream(spark, src, schema)
    agg = stream_rollup(stream, "5m", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("rollup_5m_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql(
        "select conv_id, unix_micros(cast(bucket as timestamp)) as b, turns,"
        " token_volume from rollup_5m_stream"
    ).toPandas()
    want = (
        t.groupBy("conv_id", tier_bucket("5m", "ts"))
        .agg(
            F.count(F.lit(1)).alias("turns"),
            F.sum(F.length("text")).alias("token_volume"),
        )
        .select(
            "conv_id",
            F.expr("unix_micros(cast(bucket as timestamp))").alias("b"),
            "turns",
            "token_volume",
        )
        .toPandas()
    )
    key = ["conv_id", "b"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w) > 0
    for c in ["b", "turns", "token_volume"]:
        assert (g[c].to_numpy() == w[c].to_numpy()).all(), c


def test_streaming_topk_sketch_matches_batch(spark, landed):
    """Streaming MG heavy-hitters materialization: after draining (flush
    sentinel closes every real window), the materialized 1h sketches are
    BIT-IDENTICAL to the batch rollup_topk_sketch on the same data (append
    windows finalize whole, compression is deterministic), and cascading
    the materialized table to 1d goes through the same cascade_topk_up the
    batch path uses."""
    import os
    import tempfile
    import time

    from tmframe_spark.ops.rollup import cascade_topk_up, rollup_topk_sketch
    from tmframe_spark.streaming.materialize import (
        materialize_continuous_topk,
        read_materialized,
    )

    src_dir, schema, t = landed
    d = tempfile.mkdtemp(prefix="tmframe_topk_src_")
    t.write.mode("overwrite").parquet(d)
    time.sleep(1.1)
    mx = t.agg(F.max("ts")).collect()[0][0]
    flush = spark.createDataFrame(
        [("__flush__", 0, "system", "flush", None, mx)], schema
    ).withColumn(
        "ts",
        (F.col("ts").cast("timestamp") + F.expr("interval 2 days")).cast(
            schema["ts"].dataType
        ),
    )
    flush.write.mode("append").parquet(d)

    root = tempfile.mkdtemp(prefix="tmframe_topk_tbl_")
    q = materialize_continuous_topk(
        spark, d, schema, root, tier="1h", key_col="conv_id", k=8,
        watermark="10 minutes", max_files=4,
    )
    q.awaitTermination(300)

    got = (
        read_materialized(spark, root, "topk_1h_stream")
        .where(F.col("key") != "__flush__")
        .select("bucket", "key", "cnt", "n_total", "err")
        .toPandas()
    )
    want = (
        rollup_topk_sketch(t, "1h", "conv_id", k=8)
        .select(F.col("bucket").cast("timestamp").alias("bucket"),
                "key", "cnt", "n_total", "err")
        .toPandas()
    )
    key = ["bucket", "key"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w), (len(g), len(w))
    for c in ["key", "cnt", "n_total", "err"]:
        assert (g[c].to_numpy() == w[c].to_numpy()).all(), c

    # coarse tier from the materialized table, same op as batch
    day_stream = cascade_topk_up(
        read_materialized(spark, root, "topk_1h_stream")
        .where(F.col("key") != "__flush__")
        .select("bucket", "key", "cnt", "n_total"),
        "1d", k=8,
    ).toPandas()
    day_batch = cascade_topk_up(
        rollup_topk_sketch(t, "1h", "conv_id", k=8), "1d", k=8
    ).toPandas()
    dg = day_stream.sort_values(["bucket", "key"]).reset_index(drop=True)
    db = day_batch.sort_values(["bucket", "key"]).reset_index(drop=True)
    assert len(dg) == len(db)
    for c in ["key", "cnt", "n_total", "err"]:
        assert (dg[c].to_numpy() == db[c].to_numpy()).all(), c

    mans = os.listdir(os.path.join(root, "_topk_1h_stream_batches"))
    assert any(m.startswith("batch-") for m in mans)
