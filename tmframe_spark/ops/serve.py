"""Range-serving reads over packed TMFRAME block tables (zone-map pruning).

Every block row carries zone-map columns ``ts_first``/``ts_last`` — the
8ns-truncated nanosecond bounds of every point inside the block, written by
``pack_blocks`` / ``pack_rollup_blocks`` (codec/udfs.py). A time-range read
must never decode a block whose [ts_first, ts_last] window cannot intersect
the probe range: the overlap test is a plain column predicate, so when the
block table is read from parquet/Iceberg it reaches the scan as a pushed
filter (row-group / file skipping on min-max statistics), and only the
surviving blocks cross into the Python decode. At a 100 TB archive holding
years of blocks per conversation this is the difference between decoding
the whole archive and decoding the handful of blocks that overlap the
window.

This is the engine's analog of the reference's tfindex use-case: tfindex
writes minute-boundary byte offsets so readers can seek instead of scanning
(/root/reference/cmd/tfindex/tfindex.go:44-98); here the block min/max
stats turn the seek into a Catalyst filter that storage prunes on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocks_overlapping(
    blocks: DataFrame, lo_ns: int, hi_ns: int
) -> DataFrame:
    """Blocks whose point-span [ts_first, ts_last] intersects [lo_ns, hi_ns].

    Conservative (never drops a block that holds an in-range point) and
    exact on the truncated domain: every stored point timestamp is already
    8ns-truncated, so comparing raw probe bounds against the stored bounds
    needs no further truncation. Plain column predicate — pushes down to
    the scan when ``blocks`` comes straight from storage.
    """
    if hi_ns < lo_ns:
        raise ValueError(f"empty range: lo_ns={lo_ns} > hi_ns={hi_ns}")
    return blocks.where(
        (F.col("ts_last") >= F.lit(int(lo_ns)))
        & (F.col("ts_first") <= F.lit(int(hi_ns)))
    )


def blocks_for_asof(
    blocks: DataFrame,
    by: list[str],
    probes: DataFrame,
    on: str,
    strict: bool = False,
) -> DataFrame:
    """Per probe, the single block that can hold the as-of answer.

    Within a ``by`` series the blocks' point spans are disjoint and
    time-ordered, so the latest point at-or-before (``strict=False``) or
    strictly before (``strict=True``) a probe instant lies in the block
    with the greatest ``ts_first`` at-or-before / before it: every later
    block starts after the probe and holds no eligible point, and every
    eligible point of an earlier block precedes this block's own
    ``ts_first`` (itself an eligible point). The selection is therefore an
    as-of join over the block METADATA — one row per block, not per point —
    reusing the engine's union-merge asof plan: P probes against a B-block
    series shuffle P + B metadata rows, never P x B pairs and never a
    decoded point. Returns the distinct selected blocks (at most
    min(P, B) of them).
    """
    from tmframe_spark.ops.asof import asof_join

    meta = blocks.select(
        *by, F.col("ts_first").alias(on), F.col("ts_first").alias("_blk")
    )
    sel = asof_join(
        probes.select(*by, on).dropDuplicates(),
        meta,
        on=on,
        by=by,
        seq="_blk",
        value_cols=["_blk"],
        tie="last",
        strict=strict,
        prefix="_m_",
    )
    picked = (
        sel.where(F.col("_m__blk").isNotNull())
        .select(*by, F.col("_m__blk").alias("ts_first"))
        .dropDuplicates()
    )
    return blocks.join(picked, [*by, "ts_first"], "left_semi")


def serve_asof(
    blocks: DataFrame,
    keys: list[str],
    by: list[str],
    probes: DataFrame,
    on: str = "ts_ns",
    v0: str | None = "v0",
    v1: str | None = "v1",
    tie: str = "last",
    strict: bool = False,
    frame_col: str = "frame",
) -> DataFrame:
    """Two-level as-of over the packed archive — the tfindex seek, made
    distributed (/root/reference/cmd/tfindex/tfindex.go:44-98 +
    series.go:58-244): level 1 as-of joins the probes against the block
    metadata (``blocks_for_asof``) to select, per probe, the one block that
    can hold the answer; level 2 decodes ONLY those blocks and runs the
    exact reference as-of semantics over their points.

    Equivalent to ``asof_join(probes, unpack_blocks(blocks, ...), ...)``
    (same matched rows AND the same SearchStatus), while decoding at most
    one block per probe instead of the whole archive. Status is computed
    from zone maps — the series max point timestamp is max(ts_last), exact
    because block bounds equal decoded point min/max (property-tested in
    tests/test_serve.py) — so InFuture detection does not depend on the
    pruned subset.

    ``keys``: the block-table group keys (e.g. [conv, day]); ``by``: the
    series keys for the as-of (e.g. [conv]) — a prefix of ``keys``.
    ``probes`` carries ``by`` + ``on`` (same int-ns domain as the packed
    timestamps). Matched columns come back as ``m_<col>``.
    """
    from tmframe_spark.codec.udfs import unpack_blocks
    from tmframe_spark.ops.asof import AVAIL, IN_FUTURE, IN_PAST, asof_join

    pruned = blocks_for_asof(blocks, by, probes, on, strict=strict)
    pts = unpack_blocks(pruned, keys, v0=v0, v1=v1, frame_col=frame_col)
    if on != "ts_ns":
        pts = pts.withColumnRenamed("ts_ns", on)
    value_cols = [c for c in (v0, v1) if c]
    out = asof_join(
        probes,
        # packed rollup points are unique per (series, ts), so the arrival
        # tiebreaker is just a copy of the timestamp (asof_join needs it
        # under a name distinct from `on`)
        pts.withColumn("_pseq", F.col(on)),
        on=on,
        by=by,
        seq="_pseq",
        value_cols=value_cols,
        tie=tie,
        strict=strict,
        prefix="m_",
    ).drop("status", "m__pseq")
    # status from the FULL archive's zone maps, not the pruned subset
    smax = blocks.groupBy(*by).agg(F.max("ts_last").alias("_series_max"))
    return (
        out.join(smax, by, "left")
        .withColumn(
            "status",
            F.when(F.col(f"m_{on}").isNull(), F.lit(IN_PAST))
            .when(F.col(on) > F.col("_series_max"), F.lit(IN_FUTURE))
            .otherwise(F.lit(AVAIL)),
        )
        .drop("_series_max")
    )


def serve_range(
    blocks: DataFrame,
    keys: list[str],
    lo_ns: int,
    hi_ns: int,
    v0: str | None = "v0",
    v1: str | None = "v1",
    frame_col: str = "frame",
) -> DataFrame:
    """Decode only the blocks overlapping [lo_ns, hi_ns] (inclusive), then
    keep exactly the in-range points.

    Equivalent to ``unpack_blocks(blocks, ...)`` filtered to the range, but
    the zone-map filter runs BEFORE the decode UDF — out-of-range blocks
    never leave storage, let alone cross the Arrow boundary.
    """
    from tmframe_spark.codec.udfs import unpack_blocks

    pruned = blocks_overlapping(blocks, lo_ns, hi_ns)
    pts = unpack_blocks(pruned, keys, v0=v0, v1=v1, frame_col=frame_col)
    return pts.where(
        (F.col("ts_ns") >= F.lit(int(lo_ns))) & (F.col("ts_ns") <= F.lit(int(hi_ns)))
    )
