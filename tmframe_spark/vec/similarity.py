"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force exact top-k — the correctness baseline. The dot
  products are computed in *fixed-point* (floor(x * 2^20) as int64) so the
  reduction is exact integer arithmetic: the score is identical regardless
  of summation order, across engines (Spark vs DuckDB oracle) and across
  partitionings. The final similarity is one double division of exact ints.
- lsh_ann_topk: the scale path — random-hyperplane LSH buckets shrink the
  candidate set; brute-force only within bucket. Signed projections reuse
  deterministic pseudo-random hyperplanes derived from xxhash64 so driver
  and executors agree without shipping matrices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_Q = 1 << 20  # fixed-point scale


def _qdot(a, b):
    """Exact fixed-point dot product of two float arrays as int64."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (
                F.floor(x.cast("double") * _Q).cast("long")
                * F.floor(y.cast("double") * _Q).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _qnorm2(a):
    return _qdot(a, a)


def cosine_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by (quantized) cosine similarity to one stored vector.

    The single query row is broadcast — the scan side streams once with no
    shuffle until the final top-k (orderBy+limit = distributed partial
    top-k, merged on the driver).
    """
    q = embeddings.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qv"), _qnorm2(F.col(vec_col)).alias("_qn")
    )
    scored = (
        embeddings.where(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            (
                _qdot(F.col(vec_col), F.col("_qv"))
                / F.sqrt(F.col("_qn").cast("double") * _qnorm2(F.col(vec_col)).cast("double"))
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def _hyperplane_sign(vec_col, plane: int):
    """Sign of <v, h_plane> where h_plane has deterministic +-1 entries from
    xxhash64(plane, dim-index) — matrix-free random hyperplanes."""
    signed = F.zip_with(
        vec_col,
        F.transform(
            F.sequence(F.lit(0), F.size(vec_col) - 1),
            lambda i: F.when(
                F.pmod(F.xxhash64(F.lit(plane), i), F.lit(2)) == 0, F.lit(1.0)
            ).otherwise(F.lit(-1.0)),
        ),
        lambda x, h: x.cast("double") * h,
    )
    proj = F.aggregate(signed, F.lit(0.0), lambda acc, v: acc + v)
    return F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_buckets(df: DataFrame, vec_col: str = "embedding", n_planes: int = 8):
    """Random-hyperplane (SimHash-for-vectors) bucket id per row."""
    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = bucket * 2 + _hyperplane_sign(F.col(vec_col), p)
    return df.withColumn("bucket", bucket.cast("int"))


def lsh_ann_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    n_planes: int = 8,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: only rows whose LSH bucket is within
    ``probe_hamming`` bit flips of the query's bucket are scored (multi-probe
    LSH). At 100 TB the bucketed table is written partitioned by bucket so a
    query prunes to a handful of partitions.
    """
    b = lsh_buckets(embeddings, vec_col, n_planes)
    qrow = b.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qv"),
        _qnorm2(F.col(vec_col)).alias("_qn"),
        F.col("bucket").alias("_qb"),
    )
    joined = b.where(F.col(id_col) != query_id).crossJoin(F.broadcast(qrow))
    ham = F.bit_count(F.col("bucket").bitwiseXOR(F.col("_qb")).cast("long"))
    return (
        joined.where(ham <= probe_hamming)
        .select(
            F.col(id_col),
            (
                _qdot(F.col(vec_col), F.col("_qv"))
                / F.sqrt(F.col("_qn").cast("double") * _qnorm2(F.col(vec_col)).cast("double"))
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
