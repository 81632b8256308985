"""Incremental cross-corpus dedup (text/incremental.py): the index-probed
pair set equals the inline minhash_lsh_pairs cross pairs bit-for-bit,
exact copies map to the lowest corpus id, the full probe→keep→append cycle
catches dups of earlier batches, probes prune partitions, empties degrade."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tmframe_spark.text.dedup import minhash_lsh_pairs
from tmframe_spark.text.incremental import (
    cross_dup_pairs,
    dedup_against_index,
    exact_dups_against_index,
    minhash_index_append,
    minhash_index_write,
    read_index_meta,
)


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .persist()
    )


def _split(docs, at=250):
    corpus = docs.where(F.col("doc_id") < at)
    batch_clean = docs.where(F.col("doc_id") >= at)
    # planted duplicates of CORPUS docs, ids far above both halves:
    # exact copies (case/whitespace variants) at +1_000_000 for doc_id%50==0,
    # near copies (one appended token) at +2_000_000 for doc_id%50==1
    exact_copies = corpus.where(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("  "), F.upper("text"), F.lit(" ")).alias("text"),
    )
    near_copies = corpus.where(F.col("doc_id") % 50 == 1).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzqx")).alias("text"),
    )
    batch = batch_clean.unionByName(exact_copies).unionByName(near_copies)
    return corpus, batch


def test_cross_pairs_match_inline_minhash(spark, docs, tmp_path):
    """Probed candidates == inline minhash_lsh_pairs on the union,
    restricted to (corpus, batch) pairs — same pair set, same est_jaccard
    (shared minhash_signatures + band_buckets expressions)."""
    corpus, batch = _split(docs)
    path = str(tmp_path / "idx")
    minhash_index_write(corpus, path, k=64, bands=16, shingle_k=3)
    got = {
        (r["id_corpus"], r["id_new"]): r["est_jaccard"]
        for r in cross_dup_pairs(batch, path, threshold=0.5).collect()
    }
    corpus_ids = {r[0] for r in corpus.select("doc_id").collect()}
    batch_ids = {r[0] for r in batch.select("doc_id").collect()}
    inline = minhash_lsh_pairs(
        corpus.unionByName(batch), "doc_id", k=64, bands=16, threshold=0.5, shingle_k=3
    )
    want = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in inline.collect()
        if r["id_a"] in corpus_ids and r["id_b"] in batch_ids
    }
    assert len(want) >= 5  # planted near+exact copies guarantee a pair set
    assert got == want


def test_exact_probe_and_full_dedup(spark, docs, tmp_path):
    corpus, batch = _split(docs)
    path = str(tmp_path / "idx")
    minhash_index_write(corpus, path)
    exact = {
        r["id_new"]: r["id_corpus"]
        for r in exact_dups_against_index(batch, path).collect()
    }
    planted_exact = {
        r[0] + 1_000_000: r[0]
        for r in corpus.where("doc_id % 50 = 0").select("doc_id").collect()
    }
    assert planted_exact.items() <= exact.items()  # every exact copy → its original
    kept = {r["doc_id"] for r in dedup_against_index(batch, path).collect()}
    assert not {i for i in kept if i >= 1_000_000}  # all planted copies dropped
    clean_ids = {r[0] for r in docs.where("doc_id >= 250").select("doc_id").collect()}
    # the driver corpus itself contains near-dups across the 250 split, so
    # clean docs may legitimately drop; require most survive and no planted do
    assert len(kept & clean_ids) > 0.8 * len(clean_ids)


def test_append_cycle_catches_later_batches(spark, tmp_path):
    """probe → keep → append: batch 2's near-copy of a batch-1 doc is
    dropped even though that doc was never in the original corpus."""
    base = spark.createDataFrame(
        [(i, f"base document number {i} about topic {i % 7} alpha beta gamma delta")
         for i in range(20)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    minhash_index_write(base, path, k=64, bands=16)
    b1 = spark.createDataFrame(
        [(100, "fresh batch one text epsilon zeta eta theta iota kappa unique")],
        "doc_id long, text string",
    )
    kept1 = dedup_against_index(b1, path, threshold=0.5)
    assert kept1.count() == 1
    minhash_index_append(kept1, path)
    assert read_index_meta(path)["k"] == 64
    b2 = spark.createDataFrame(
        [
            (200, "fresh batch one text epsilon zeta eta theta iota kappa unique"),
            (201, "entirely different content lambda mu nu xi omicron pi rho"),
        ],
        "doc_id long, text string",
    )
    kept2 = {r["doc_id"] for r in dedup_against_index(b2, path, threshold=0.5).collect()}
    assert kept2 == {201}


def test_within_batch_dedup(spark, tmp_path):
    base = spark.createDataFrame(
        [(0, "corpus doc alpha beta gamma delta epsilon zeta eta")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    minhash_index_write(base, path)
    batch = spark.createDataFrame(
        [
            (10, "twin text one two three four five six seven eight"),
            (11, "twin text one two three four five six seven eight"),
            (12, "unrelated survivor nine ten eleven twelve thirteen fourteen"),
        ],
        "doc_id long, text string",
    )
    kept = {r["doc_id"] for r in dedup_against_index(batch, path, within_batch=True).collect()}
    assert kept == {10, 12}  # 11 removed within-batch, lowest id kept


def test_probe_reads_are_partition_pruned(spark, docs, tmp_path):
    corpus, batch = _split(docs)
    path = str(tmp_path / "idx")
    minhash_index_write(corpus, path)
    plan = (
        exact_dups_against_index(batch, path)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan, plan
    seg = [s for s in plan.split("PartitionFilters")[1:] if "h_mod" in s[:300]]
    assert seg, plan
    plan2 = (
        cross_dup_pairs(batch, path, threshold=0.5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    seg2 = [s for s in plan2.split("PartitionFilters")[1:] if "id_mod" in s[:300]]
    assert seg2, plan2  # the sig re-verify scan prunes by candidate id_mod


def test_incremental_dedup_on_driver_corpus(spark):
    """Driver-corpus pin (the registry entry's exact call): every planted
    exact (+1_000_000) and near (+2_000_000) copy of an indexed corpus doc
    is dropped by the index probe; a sane majority of genuinely-new odd-id
    docs survives (the driver corpus has real near-dups across the split,
    so some odd docs legitimately drop)."""
    from tmframe_spark.queries import q_incremental_dedup

    kept = {r["doc_id"] for r in q_incremental_dedup(spark, SF_DIR).collect()}
    assert kept, "batch should not dedup to empty"
    assert not {i for i in kept if i >= 1_000_000}  # all planted copies gone
    assert all(i % 2 == 1 for i in kept)  # survivors are genuine batch docs


def test_empty_batch_and_bad_params(spark, tmp_path):
    base = spark.createDataFrame(
        [(0, "some corpus doc alpha beta gamma")], "doc_id long, text string"
    )
    path = str(tmp_path / "idx")
    with pytest.raises(ValueError, match="multiple of bands"):
        minhash_index_write(base, path, k=60, bands=16)
    minhash_index_write(base, path)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert dedup_against_index(empty, path).count() == 0
    assert cross_dup_pairs(empty, path).count() == 0


def test_append_is_crash_atomic(spark, tmp_path):
    """A crash ANYWHERE inside minhash_index_append — simulated at its worst
    point, all three tables fully written but the meta commit not reached —
    leaves every probe answering exactly as before the append; a later
    committed append under a FRESH token brings the batch in whole, and
    vacuum removes the orphan (round-5 verdict finding #3)."""
    from tmframe_spark.text.incremental import minhash_index_vacuum

    base = spark.createDataFrame(
        [(i, f"base document number {i} about topic {i % 7} alpha beta gamma")
         for i in range(20)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    minhash_index_write(base, path, k=64, bands=16)
    committed_before = read_index_meta(path)["batches"]

    b1 = spark.createDataFrame(
        [(100, "crashy batch text epsilon zeta eta theta iota kappa unique")],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame(
        [(300, "crashy batch text epsilon zeta eta theta iota kappa unique"),
         (301, "entirely different content lambda mu nu xi omicron pi rho")],
        "doc_id long, text string",
    )
    before = {r["doc_id"] for r in dedup_against_index(probe, path, 0.5).collect()}
    assert before == {300, 301}  # b1 not ingested yet: 300 survives

    # the simulated crash: tables written (same code path as append), meta
    # commit never runs
    params = {x: read_index_meta(path)[x] for x in ("k", "bands", "shingle_k", "nmods")}
    minhash_index_write(b1, path, mode="append", **params)
    assert read_index_meta(path)["batches"] == committed_before
    after_crash = {r["doc_id"] for r in dedup_against_index(probe, path, 0.5).collect()}
    assert after_crash == before, "half-committed batch leaked into a probe"

    # retried ingest commits under a fresh token -> the batch is in WHOLE
    minhash_index_append(b1, path)
    meta = read_index_meta(path)
    assert len(meta["batches"]) == len(committed_before) + 1
    after = {r["doc_id"] for r in dedup_against_index(probe, path, 0.5).collect()}
    assert after == {301}

    # vacuum removes exactly the orphan token's directories
    import os

    orphans = minhash_index_vacuum(path)
    assert len(orphans) == 1 and orphans[0] not in meta["batches"]
    for table in ("sigs", "bands", "exact"):
        toks = {d.split("=", 1)[1] for d in os.listdir(os.path.join(path, table))
                if d.startswith("batch=")}
        assert toks <= set(meta["batches"])
    # and the vacuumed index still answers identically
    assert {r["doc_id"] for r in dedup_against_index(probe, path, 0.5).collect()} == after


def test_index_writes_one_file_per_partition_directory(spark, tmp_path):
    """Regression lock for the r6 small-files fix: every (batch, mod)
    directory of every index table holds exactly ONE parquet file (the
    repartition-before-partitionBy rule) — without it each upstream task
    writes into every directory (10,864 files measured for a 5.5k-doc
    index pre-fix)."""
    import glob
    import os

    docs = spark.createDataFrame(
        [(i, f"doc {i} unique{i} filler alpha beta gamma") for i in range(200)],
        "doc_id long, text string",
    ).repartition(16)  # many upstream tasks — the amplification trigger
    path = str(tmp_path / "idx")
    minhash_index_write(docs, path)
    for table in ("sigs", "bands", "exact"):
        dirs = glob.glob(os.path.join(path, table, "batch=*", "*=*"))
        assert dirs, table
        for d in dirs:
            files = [f for f in os.listdir(d) if f.endswith(".parquet")]
            assert len(files) == 1, (table, d, len(files))


def test_sigs_reuse_is_bit_identical(spark, docs, tmp_path):
    """r7 probe->append signature reuse: passing precomputed
    minhash_signatures through dedup_against_index / minhash_index_append
    must leave BOTH the surviving-doc set and the written index tables
    bit-identical to the recompute path (signatures are deterministic)."""
    from tmframe_spark.text.dedup import minhash_signatures

    corpus, batch = _split(docs)
    p_a = str(tmp_path / "idx_recompute")
    p_b = str(tmp_path / "idx_reuse")
    minhash_index_write(corpus, p_a)
    minhash_index_write(corpus, p_b)
    meta = read_index_meta(p_a)

    kept_a = dedup_against_index(batch, p_a, 0.5, within_batch=True)
    minhash_index_append(kept_a, p_a)

    sigs = minhash_signatures(
        batch, "doc_id", "text", meta["k"], meta["shingle_k"]
    ).localCheckpoint(eager=True)
    kept_b = dedup_against_index(batch, p_b, 0.5, within_batch=True, sigs=sigs)
    kept_sigs = sigs.join(kept_b.selectExpr("doc_id as id"), "id", "left_semi")
    minhash_index_append(kept_b, p_b, sigs=kept_sigs)

    assert sorted(r["doc_id"] for r in kept_a.collect()) == sorted(
        r["doc_id"] for r in kept_b.collect()
    )
    for table in ("sigs", "bands", "exact"):
        ta = sorted(
            map(str, spark.read.parquet(f"{p_a}/{table}").drop("batch").collect())
        )
        tb = sorted(
            map(str, spark.read.parquet(f"{p_b}/{table}").drop("batch").collect())
        )
        assert ta == tb, table
