"""Benchmark decontamination + PII redaction for training-data pipelines.

- contamination_scores / decontaminate: per-document fraction of k-word
  shingles that also appear in a BENCHMARK set (eval questions, test
  splits). Training on benchmark text inflates eval scores; the standard
  defense is n-gram overlap screening (public practice, e.g. the GPT-3 /
  C4 decontamination writeups). The benchmark shingle set is the small
  side: one distinct-shingle build, then ONE broadcast mark-join over the
  corpus shingles — the corpus (100 TB side) is scanned exactly once, and
  hit + total counts come from a single per-doc aggregation.
- redact_pii: one-pass regexp scrub of the classic lexical PII shapes
  (emails, URLs, long digit runs). Patterns live in the Spark/RE2 common
  subset so the DuckDB oracle restates them verbatim.

Both oracle-exact: `contamination` and `pii_redact` registry queries
hash-match DuckDB restatements (single IEEE division of exact ints; same
regex dialect subset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tmframe_spark.text.dedup import shingles


def contamination_scores(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 8,
) -> DataFrame:
    """Per-corpus-doc shingle overlap with the benchmark:
    (id, contaminated, total, contamination = contaminated / total).

    ``shingle_k`` defaults to 8 words — long enough that natural reuse is
    rare and matches mean copied benchmark text (the public
    decontamination convention of ~8-13-gram screens). The benchmark's
    distinct shingle set is built once and met via one broadcast mark-join;
    every corpus doc keeps a row (0.0 when clean). The division is one
    IEEE op on exact ints — engine/partitioning independent."""
    bench_sh = (
        benchmark.select(
            F.explode(shingles(F.col(text_col), shingle_k)).alias("w")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    corp_sh = corpus.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), shingle_k)).alias("w"),
    )
    # ONE corpus pass: a broadcast left join marks each shingle, and a
    # single per-doc aggregation counts both sides (a separate totals
    # aggregation would scan + explode the 100 TB side twice — round-5
    # review finding)
    return (
        corp_sh.join(F.broadcast(bench_sh), "w", "left")
        .groupBy("id")
        .agg(
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("contaminated"),
            F.count(F.lit(1)).alias("total"),
        )
        .select(
            F.col("id").alias(id_col),
            "contaminated",
            "total",
            (F.col("contaminated") / F.col("total")).alias("contamination"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.05,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 8,
) -> DataFrame:
    """Drop corpus documents whose benchmark-shingle overlap fraction
    exceeds ``threshold`` (strictly greater — a 0.0 threshold keeps only
    fully clean docs)."""
    dirty = (
        contamination_scores(corpus, benchmark, id_col, text_col, shingle_k)
        .where(F.col("contamination") > threshold)
        .select(id_col)
    )
    return corpus.join(dirty, id_col, "left_anti")


#: (pattern, replacement) — Spark/RE2 common-subset regexes, applied in
#: order (emails before digit runs so an address's digits don't split it).
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"[0-9][0-9 ()+.-]{5,}[0-9]", "<PHONE>"),
)


def redact_pii(col) -> "F.Column":
    """Column expression: the PII_PATTERNS chain applied in order (pure
    codegen regexp_replace — no UDF)."""
    out = col
    for pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def with_redacted_text(
    df: DataFrame, text_col: str = "text", out_col: str = "text_redacted"
) -> DataFrame:
    """Add the redacted text plus ``pii_hits`` = summed per-pattern match
    counts on the ORIGINAL text (code-point-safe regexp counting, the
    repo's cross-engine idiom) — equal to the replacement count whenever
    patterns don't overlap (the normal case), and either way an identical,
    well-defined metric on both engines."""
    hits = None
    for pat, _ in PII_PATTERNS:
        c = F.regexp_count(F.col(text_col), F.lit(pat))
        hits = c if hits is None else hits + c
    return df.withColumn(out_col, redact_pii(F.col(text_col))).withColumn(
        "pii_hits", hits.cast("long")
    )
