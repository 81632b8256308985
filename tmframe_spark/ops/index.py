"""tfindex analog: minute-boundary byte-offset index.

Reference: tfindex writes a sidecar of EvOneInt64 frames giving the byte
offset of the first frame at-or-after each minute boundary
(cmd/tfindex/tfindex.go:44-98). Columnar storage + min/max stats make this
unnecessary on Spark, but the semantics are preserved as an operator:
cumulative wire-byte offset under the stable order, then min offset per
minute bucket (SURVEY §2.1 S11 / §2.5 A2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def minute_index(
    df: DataFrame,
    nbytes_col: str,
    order_cols: list[str],
    ts_col: str = "ts",
    by: list[str] | None = None,
) -> DataFrame:
    """Byte offset of the first frame in each minute.

    ``by`` partitions the stream (per file / per conversation); None means
    one global stream — fine for the reference's single-file semantics, but
    pass a key at scale (a global cumulative sum is one partition's window).
    """
    keys = by or []
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = df.withColumn(
        "byte_offset", F.coalesce(F.sum(nbytes_col).over(w), F.lit(0)).cast("long")
    )
    minute = F.date_trunc("minute", F.col(ts_col)).alias("minute")
    return offs.groupBy(*keys, minute).agg(
        F.min("byte_offset").alias("byte_offset"),
        F.count(F.lit(1)).alias("frames"),
        F.sum(nbytes_col).cast("long").alias("nbytes"),
    )
