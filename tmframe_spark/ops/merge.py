"""Time-ordered sort / k-way merge / stable global enumeration.

Reference semantics: tfsort does a *stable* sort by Tm() (sort.go:7-18,
cmd/tfsort/tfsort.go:55 uses sort.Stable, preserving arrival order of ties);
tfmerge k-way merges already-sorted streams (merge.go:39-90). Spark sorts are
not stable, so stability is recovered by threading explicit tiebreaker
columns (stream ordinal + per-stream sequence) through the sort — the SURVEY
§2.6 mapping.

``with_stable_pos`` provides the scalable global position (the reference's
byte offsets / frame ordinals): range-partition on the order key, sort
within partitions, then add per-partition start offsets computed from
partition counts (one tiny collect of #partitions rows). No single-partition
global window — this is the enumeration pattern that holds at 10^12 rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_streams(dfs: list[DataFrame], order_cols: list[str]) -> DataFrame:
    """k-way merge of (possibly unsorted) streams into one time-ordered
    stream (tfmerge / FrameWriter.Merge, merge.go:39-90).

    Tie order across streams = input position in ``dfs`` (the reference's
    tie order across streams at equal Tm is unspecified — merge.go:74 uses
    an unstable sort of the k heads; we pin it to stream ordinal).
    Adds ``stream_ord``. The merge itself is Catalyst's range-partitioned
    sort (SMJ-style), which externalizes/spills — the distributed analog of
    tfsort's temp-file external sort (cmd/tfsort/tfsort.go:43-68).
    """
    tagged = [df.withColumn("stream_ord", F.lit(i)) for i, df in enumerate(dfs)]
    u = reduce(lambda a, b: a.unionByName(b), tagged)
    return u.orderBy(*order_cols, "stream_ord")


def with_stable_pos(
    df: DataFrame, order_cols: list[str], pos_col: str = "pos", partitions: int | None = None
) -> DataFrame:
    """Add a 0-based global position under a stable total order.

    Scalable two-pass enumeration over ONE materialization:
    repartitionByRange(order) + sortWithinPartitions + localCheckpoint,
    count rows per partition (small collect: one row per partition), then
    pos = partition_offset + local row index.
    """
    if partitions:
        n = int(partitions)
    else:
        # scale-adaptive (r7): the range sort is pure JVM work, so size
        # partitions by estimated bytes (guide: 64 MB-1 GB per sort
        # partition) instead of pinning shuffle.partitions — 64 near-empty
        # sort tasks + a 64-row count collect cost ~0.3 s on a 3 MB input.
        # Falls back to the conf pin when the estimate is unusable.
        from tmframe_spark.ops.sizing import cpu_stage_partitions

        n = cpu_stage_partitions(df, per_partition_bytes=64 * 1024 * 1024)
    part = (
        df.repartitionByRange(int(n), *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    # localCheckpoint, not persist: (a) truncates lineage, so the range
    # boundaries sampled by repartitionByRange are FROZEN — the count job
    # and the output job are guaranteed to see identical partitioning even
    # if blocks are evicted (persist() would silently recompute and could
    # in principle re-sample); (b) the blocks are released by the
    # ContextCleaner when the DataFrame is GC'd — no manual unpersist, no
    # cache leak across calls. LAZY (eager=False): the count job below is
    # the first action and materializes the checkpoint as it counts — one
    # job instead of an eager-materialize job plus a count job; the frozen-
    # partitioning guarantee is identical because the output job still reads
    # only checkpointed blocks. Cluster note: localCheckpoint is lost with
    # an executor; use checkpoint(reliable dir) for long jobs there.
    part = part.localCheckpoint(eager=False)
    counts = {r["_pid"]: r["count"] for r in part.groupBy("_pid").count().collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if offsets:
        mapping = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )
    else:
        mapping = F.create_map()
    # local row index WITHOUT a window: the checkpointed blocks are already
    # range-partitioned and in-partition sorted, and a scan of an RDD
    # checkpoint exposes no outputPartitioning/ordering to Catalyst — a
    # row_number() window here re-shuffled and RE-SORTED the whole dataset
    # in the output job (measured in the executed plan: Exchange
    # hashpartitioning(_pid) + Sort). monotonically_increasing_id() is
    # (partition_index << 33) + row-counter over exactly the checkpointed
    # iteration order, so local index = mid - (_pid << 33) — zero exchanges,
    # zero sorts in the output job. (Counter width bounds a partition at
    # 2^33 rows — repartitionByRange sizing keeps partitions far below.)
    local = F.monotonically_increasing_id() - F.shiftleft(
        F.col("_pid").cast("long"), 33
    )
    # runtime drift guard: the local-index derivation depends on the
    # documented 31/33-bit monotonically_increasing_id split AND on this
    # projection scanning the checkpointed blocks directly (no interposed
    # exchange). If either ever changes — a Spark upgrade re-encoding the id,
    # a plan change re-partitioning the scan — local indexes leave the
    # [0, counts[pid]) range for some row, and this raise_error fires instead
    # of silently corrupting every position. Cost: one tiny-literal-map
    # lookup + two comparisons per row, codegen-inlined.
    counts_map = (
        F.create_map(*[F.lit(x) for kv in counts.items() for x in kv])
        if counts
        else F.create_map()
    )
    offset = F.element_at(mapping, F.col("_pid"))
    valid = (
        offset.isNotNull()
        & (local >= 0)
        & (local < F.element_at(counts_map, F.col("_pid")))
    )
    out = part.withColumn(
        pos_col,
        F.when(valid, (offset + local).cast("long")).otherwise(
            F.raise_error(
                F.format_string(
                    "with_stable_pos: local row index drifted out of "
                    "[0, count) for partition %s (local=%s) — "
                    "monotonically_increasing_id encoding or checkpoint-scan "
                    "plan shape changed",
                    F.col("_pid"),
                    local,
                )
            ).cast("long")
        ),
    ).drop("_pid")
    return out


def offset_limit(df: DataFrame, order_cols: list[str], skip: int, take: int) -> DataFrame:
    """tfcat -rawskip/-raw: copy N frames after skipping M under stable
    order (cmd/tfcat/tfcat.go:185-231) — Spark offset+limit."""
    return df.orderBy(*order_cols).offset(skip).limit(take)
