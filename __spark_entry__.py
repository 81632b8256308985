"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship pipeline on sf0.001 — transcripts -> gap-filled
  1m rollup -> per-(conv, day) delta-of-delta/Gorilla packed TMFRAME blocks
  -> decode back to points (returned DataFrame; the driver collects).
- ``queries()`` / ``oracle_sql()``: the operator registry from
  tmframe_spark.queries (one entry per implemented operator from
  SURVEY.md §2 plus the training-data ops). Since round 2 the oracle is
  omitted ONLY for genuinely non-SQL-expressible ops — the windowed
  count-window dedup (its unbounded limit IS oracled), BLAKE2b tfsum, and
  the MinHash/hyperplane/IVF approximations (each pytest-twinned against an
  oracle-verified exact form); the block round-trip, msgpack decode,
  display render, simhash, bpe counting and multimodal header decode all
  carry full DuckDB value-hash oracles. The driver record holds the first
  ~50 registry rows, all 50 with full oracles; 31 tail entries carry
  their full oracles in the pytest mirror instead
  (queries.pytest_only_oracles — the identical rows+schema+bit-value
  compare, run by tests/test_queries_vs_duckdb.py), and the remaining 15
  are rows-only by documented design, each pytest-twinned against an
  exact reference or bracketed by an oracled exactness limit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tmframe_spark import queries as q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q.q_block_roundtrip(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return q.queries()


def oracle_sql() -> dict[str, str]:
    return q.oracle_sql()
