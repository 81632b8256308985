"""Incremental (cross-corpus) deduplication: dedup a NEW batch of documents
against an already-ingested corpus WITHOUT re-pairing the corpus with
itself — the continuous-ingestion shape of training-data dedup (a nightly
crawl lands against a multi-PB corpus; re-running whole-corpus MinHash per
batch would be O(corpus) every night).

The corpus is represented by a PERSISTED index (``minhash_index_write``),
three mod-partitioned parquet tables + a params manifest:

- ``exact/``  (h_mod=…/)   one (h, id) row per doc — h = the exact-dedup
  content key (``dedup.norm_text_md5``), the certain cheap first pass;
- ``bands/``  (bucket_mod=…/) (band, bucket, id) — the banded-LSH candidate
  surface (``dedup.band_buckets`` over the doc's MinHash signature);
- ``sigs/``   (id_mod=…/)  (id, sig) — full signatures for the exact
  est-Jaccard re-verify of band-collision candidates;
- ``meta.json`` — k/bands/shingle_k/nmods, read back at probe and append
  time so a probe can never run with mismatched parameters.

Every probe is PRUNED: the batch's touched partition values (≤ nmods of
them) are collected and pushed as a partition-column ``isin`` filter, so a
small batch reads a small fraction of the corpus-sized tables
(PartitionFilters — asserted in tests/test_incremental.py). A batch that
touches every partition degrades to one full scan, never more.

Candidate generation reuses the EXACT same expressions as the inline
``minhash_lsh_pairs`` (shared ``minhash_signatures`` + ``band_buckets``
helpers), so the cross-corpus pair set equals the inline pair set restricted
to (corpus, batch) pairs — asserted bit-for-bit in the tests, est_jaccard
included.

Scale shape (100 TB posture): the index is append-only (``
minhash_index_append`` folds each batch's survivors in — parquet appends
into the same partition dirs); probing shuffles only batch-sized and
candidate-sized data keyed by (band, bucket) or id; the corpus is never
self-joined. Reference analog: the archive's ingest-then-serve lifecycle
(SURVEY §2.1 S10) applied to the dedup domain.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tmframe_spark.text.dedup import (
    band_buckets,
    dedup_keep_canonical,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    norm_text_md5,
)

#: default partition-value count for the three mod-partitioned tables.
#: Bounds both the directory fan-out and the probe-time collected lists.
INDEX_NMODS = 64


def _meta_path(path: str) -> str:
    return os.path.join(path, "meta.json")


def _write_meta(path: str, meta: dict) -> None:
    os.makedirs(path, exist_ok=True)
    tmp = _meta_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, sort_keys=True)
    os.replace(tmp, _meta_path(path))  # atomic: readers see old or new


def read_index_meta(path: str) -> dict:
    with open(_meta_path(path)) as f:
        return json.load(f)


def _mod(col, nmods: int):
    return F.pmod(col, F.lit(nmods)).cast("int")


def minhash_index_write(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    nmods: int = INDEX_NMODS,
    mode: str = "overwrite",
) -> dict:
    """Build (or, mode='append', extend) the persisted dedup index for a
    corpus. Returns the params manifest. The signature projection is
    eagerly localCheckpoint'd once and feeds all three tables (the repo's
    multi-consumer rule)."""
    if k % bands != 0:
        raise ValueError(f"k={k} must be a multiple of bands={bands}")
    r = k // bands
    sigs = minhash_signatures(df, id_col, text_col, k, shingle_k).localCheckpoint(
        eager=True
    )
    sigs.withColumn("id_mod", _mod(F.col("id"), nmods)).write.mode(mode).partitionBy(
        "id_mod"
    ).parquet(os.path.join(path, "sigs"))
    band_rows = sigs.select(
        "id", F.posexplode(band_buckets(F.col("sig"), bands, r)).alias("band", "bucket")
    )
    band_rows.withColumn("bucket_mod", _mod(F.col("bucket"), nmods)).write.mode(
        mode
    ).partitionBy("bucket_mod").parquet(os.path.join(path, "bands"))
    exact = df.select(
        norm_text_md5(F.col(text_col)).alias("h"), F.col(id_col).alias("id")
    )
    exact.withColumn("h_mod", _mod(F.xxhash64(F.col("h")), nmods)).write.mode(
        mode
    ).partitionBy("h_mod").parquet(os.path.join(path, "exact"))
    meta = {"k": k, "bands": bands, "shingle_k": shingle_k, "nmods": nmods}
    if mode == "overwrite":
        _write_meta(path, meta)
    return meta


def minhash_index_append(
    df: DataFrame, path: str, id_col: str = "doc_id", text_col: str = "text"
) -> dict:
    """Fold a new batch (normally ``dedup_against_index``'s survivors) into
    an existing index, with the index's OWN stored parameters — a caller
    cannot drift k/bands/shingle_k between batches."""
    meta = read_index_meta(path)
    return minhash_index_write(
        df, path, id_col, text_col, mode="append", **meta
    )


def exact_dups_against_index(
    df: DataFrame, path: str, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_new, id_corpus) for every batch doc whose normalized text md5
    already exists in the corpus — id_corpus = the lowest matching corpus
    id. The probe reads only the batch's h_mod partitions."""
    spark = df.sparkSession
    nmods = read_index_meta(path)["nmods"]
    probe = df.select(
        F.col(id_col).alias("id_new"), norm_text_md5(F.col(text_col)).alias("h")
    ).withColumn("h_mod", _mod(F.xxhash64(F.col("h")), nmods))
    mods = [r[0] for r in probe.select("h_mod").distinct().collect()]
    idx = (
        spark.read.parquet(os.path.join(path, "exact"))
        .where(F.col("h_mod").isin(mods))
        .select("h", F.col("id").alias("id_corpus"))
    )
    return (
        probe.join(idx, "h")
        .groupBy("id_new")
        .agg(F.min("id_corpus").alias("id_corpus"))
    )


def cross_dup_pairs(
    df: DataFrame,
    path: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_new, id_corpus, est_jaccard) for every (batch doc, corpus doc)
    pair that collides in ≥1 LSH band AND whose MinHash-estimated Jaccard
    meets ``threshold`` — the inline ``minhash_lsh_pairs`` semantics
    restricted to cross pairs, computed by PROBING the index instead of
    re-pairing the corpus. Batch and corpus id spaces must be disjoint
    (the ingest contract; same as any append-only id scheme)."""
    spark = df.sparkSession
    meta = read_index_meta(path)
    k, bands, nmods = meta["k"], meta["bands"], meta["nmods"]
    r = k // bands
    sigs_new = minhash_signatures(
        df, id_col, text_col, k, meta["shingle_k"]
    ).localCheckpoint(eager=True)
    band_new = sigs_new.select(
        F.col("id").alias("id_new"),
        F.posexplode(band_buckets(F.col("sig"), bands, r)).alias("band", "bucket"),
    ).withColumn("bucket_mod", _mod(F.col("bucket"), nmods))
    probed = [r_[0] for r_ in band_new.select("bucket_mod").distinct().collect()]
    idx = (
        spark.read.parquet(os.path.join(path, "bands"))
        .where(F.col("bucket_mod").isin(probed))
        .select("band", "bucket", F.col("id").alias("id_corpus"))
    )
    # candidate-sized from here on; checkpoint before the two driver-visible
    # consumers (mod collect + verify join) so the band join runs once
    cand = (
        band_new.join(idx, ["band", "bucket"])
        .groupBy("id_new", "id_corpus")
        .agg(F.count(F.lit(1)).alias("n_bands"))
        .localCheckpoint(eager=True)
    )
    cmods = [
        r_[0]
        for r_ in cand.select(_mod(F.col("id_corpus"), nmods).alias("m"))
        .distinct()
        .collect()
    ]
    sigs_idx = (
        spark.read.parquet(os.path.join(path, "sigs"))
        .where(F.col("id_mod").isin(cmods))
        .select(F.col("id").alias("id_corpus"), F.col("sig").alias("sig_corpus"))
    )
    est = F.size(
        F.filter(F.zip_with("sig_new", "sig_corpus", lambda x, y: x == y), lambda e: e)
    ) / F.lit(float(k))
    return (
        cand.join(
            sigs_new.select(F.col("id").alias("id_new"), F.col("sig").alias("sig_new")),
            "id_new",
        )
        .join(sigs_idx, "id_corpus")
        .withColumn("est_jaccard", F.round(est, 6))
        .where(F.col("est_jaccard") >= threshold)
        .select("id_new", "id_corpus", "est_jaccard")
    )


def dedup_against_index(
    df: DataFrame,
    path: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    within_batch: bool = False,
) -> DataFrame:
    """The incremental-ingest dedup step: drop every batch doc that is an
    exact or near duplicate of a corpus doc already in the index; return
    the surviving rows unchanged (anti-join by id — the text payload never
    reshuffles). ``within_batch=True`` additionally dedups the survivors
    against each other (exact first-occurrence + MinHash components,
    canonical-keep) so the batch enters the index internally clean.

    The full cycle is probe → keep → ``minhash_index_append(kept, path)``;
    jobs/dedup_job.py wires it end to end."""
    exact = exact_dups_against_index(df, path, id_col, text_col).select("id_new")
    near = cross_dup_pairs(df, path, threshold, id_col, text_col).select("id_new")
    drop = exact.unionByName(near).distinct().withColumnRenamed("id_new", id_col)
    kept = df.join(drop, id_col, "left_anti")
    if within_batch:
        kept = exact_dedup(kept, id_col, text_col)
        meta = read_index_meta(path)
        pairs = minhash_lsh_pairs(
            kept,
            id_col,
            text_col,
            k=meta["k"],
            bands=meta["bands"],
            threshold=threshold,
            shingle_k=meta["shingle_k"],
        )
        kept = dedup_keep_canonical(kept, pairs, id_col)
    return kept
