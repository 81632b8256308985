"""Z-order (Morton) clustering for multi-dimensional data skipping.

Parquet row-group pruning works off per-column min/max statistics: a table
sorted only by day answers "conv X, days D1..D2" by scanning EVERY row
group inside the day span, because each group's conv min/max covers the
whole conversation space. Interleaving the bits of both keys (the
Databricks OPTIMIZE ZORDER / Hudi layout idea, public since the 1966
Morton curve) makes row groups locally coherent in BOTH dimensions, so
min/max statistics prune on either predicate.

Spark-first shape: each key column is linearly binned to a ``bits``-wide
integer with ``width_bucket`` against its own min/max (two scalar
aggregates — never a global sort; hash-derived columns are uniform by
construction, time columns are calendar-linear), the codes are interleaved
with pure codegen bit arithmetic, and the frame is range-partitioned +
locally sorted on the z-value. One exchange, one write; downstream readers
need no knowledge of the layout — they just see better statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bin_code(col, lo: float, hi: float, bits: int):
    """Linear [lo, hi] -> [0, 2^bits) bucket (clamped; degenerate range -> 0)."""
    if hi <= lo:
        return F.lit(0).cast("long")
    n = 1 << bits
    b = F.width_bucket(col.cast("double"), F.lit(float(lo)), F.lit(float(hi)), F.lit(n)) - 1
    return F.least(F.greatest(b, F.lit(0)), F.lit(n - 1)).cast("long")


def zorder_value(codes: list, bits: int):
    """Interleave ``bits``-wide codes (codes[0] gets the highest bit of
    each round) — pure codegen shifts/ors, no UDF."""
    z = F.lit(0).cast("long")
    for level in range(bits - 1, -1, -1):
        for c in codes:
            bit = F.shiftright(c, level).bitwiseAND(F.lit(1).cast("long"))
            z = F.shiftleft(z, 1).bitwiseOR(bit)
    return z


def zorder_clustered(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
    num_files: int | None = None,
) -> DataFrame:
    """Return ``df`` clustered on the z-order of ``cols`` — range
    partitioned + locally sorted on the Morton value, z column dropped —
    ready for any writer (write_zordered's path write, or the catalog's
    overwrite_day during compaction). Strings rank by xxhash64
    (conversations have no meaningful total order, so a uniform hash rank
    is the right surrogate); numeric/time columns keep their
    calendar-linear binning. ``bits`` bounds interleave work at
    bits x len(cols) codegen ops per row; 12 bits x 2 cols = 24 levels
    resolves ~16M distinct cells — row-group granularity saturates far
    earlier."""
    if not cols or bits * len(cols) > 62:
        raise ValueError(
            f"zorder: need 1+ cols and bits*len(cols) <= 62, got "
            f"{bits} x {len(cols)}"
        )
    proj = []
    for c in cols:
        dt = dict(df.dtypes)[c]
        proj.append(
            F.xxhash64(F.col(c)).cast("double") if dt == "string"
            else F.col(c).cast("double")
        )
    stats = df.agg(
        *[f(p).alias(f"{k}_{i}") for i, p in enumerate(proj)
          for k, f in (("lo", F.min), ("hi", F.max))]
    ).collect()[0]
    codes = [
        _bin_code(p, stats[f"lo_{i}"] or 0.0, stats[f"hi_{i}"] or 0.0, bits)
        for i, p in enumerate(proj)
    ]
    zed = df.withColumn("_z", zorder_value(codes, bits))
    parts = num_files or zed.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return (
        zed.repartitionByRange(int(parts), "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    num_files: int | None = None,
    writer_options: dict | None = None,
) -> None:
    """Write ``df`` clustered on the z-order of ``cols`` (see
    zorder_clustered). One range exchange + local sort + one write."""
    w = zorder_clustered(df, cols, bits, num_files).write.mode("overwrite")
    for k, v in (writer_options or {}).items():
        w = w.option(k, v)
    w.parquet(path)


def rowgroup_candidates(path: str, col: str, lo, hi) -> tuple[int, int]:
    """Count parquet row groups whose [min, max] statistics intersect
    [lo, hi] for ``col`` — the data-skipping measurement a reader's
    pushdown performs. Returns (candidates, total_groups)."""
    import glob
    import os

    import pyarrow.parquet as pq

    cand = total = 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            total += 1
            if st is None or st.min is None:
                cand += 1
            elif not (st.max < lo or st.min > hi):
                cand += 1
    return cand, total
