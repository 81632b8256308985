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
