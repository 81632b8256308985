"""Streaming dedup-ingest (streaming/ingest.py): per-micro-batch probe of
the persisted MinHash index, exactly-once under at-least-once replays and
simulated crash windows."""

import json
import os
import tempfile

import pandas as pd
from pyspark.sql import functions as F

from tmframe_spark.streaming.ingest import (
    _batch_token,
    dedup_ingest_writer,
    materialize_dedup_ingest,
    read_ingested,
)
from tmframe_spark.text.incremental import (
    minhash_index_write,
    read_index_meta,
)

# three i-unique tokens per doc keep same-topic pairs' shingle Jaccard
# ~0.29 (well under the 0.5 probe threshold), so within-batch dedup never
# collapses distinct BASE docs
BASE = [
    (i, f"base corpus document number {i} tag{i} mark{i} topic {i % 5} alpha beta")
    for i in range(20)
]


def _mkindex(spark, tmp_path):
    path = str(tmp_path / "idx")
    minhash_index_write(
        spark.createDataFrame(BASE, "doc_id long, text string"), path, k=64, bands=16
    )
    return path


def _docs_pdf(rows):
    return pd.DataFrame({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]})


def test_stream_drain_dedups_across_batches(spark, tmp_path):
    idx = _mkindex(spark, tmp_path)
    root = str(tmp_path / "out")
    src = tempfile.mkdtemp(prefix="tmframe_ingest_src_")
    # batch A: 100 new, 101 = exact dup of corpus doc 3; batch B: 200 new,
    # 201 = exact dup of batch A's survivor 100 (cross-BATCH dedup needs the
    # index append between micro-batches to have happened)
    a = [(100, "entirely new content epsilon zeta eta theta"), (101, BASE[3][1])]
    b = [(200, "another novel document iota kappa lambda mu"), (201, a[0][1])]
    _docs_pdf(a).to_parquet(os.path.join(src, "a.parquet"))
    schema = spark.read.parquet(src).schema
    q = materialize_dedup_ingest(
        spark, src, schema, root, idx, threshold=0.5, max_files=1
    )
    q.awaitTermination(300)
    _docs_pdf(b).to_parquet(os.path.join(src, "b.parquet"))
    q = materialize_dedup_ingest(
        spark, src, schema, root, idx, threshold=0.5, max_files=1
    )
    q.awaitTermination(300)

    kept = {r["doc_id"] for r in read_ingested(spark, root).collect()}
    assert kept == {100, 200}, kept
    meta = read_index_meta(idx)
    assert len(meta["batches"]) == 3  # initial + one per micro-batch
    # replay the whole stream (fresh query, same checkpoint): clean no-op
    q = materialize_dedup_ingest(
        spark, src, schema, root, idx, threshold=0.5, max_files=1
    )
    q.awaitTermination(300)
    assert {r["doc_id"] for r in read_ingested(spark, root).collect()} == {100, 200}
    assert len(read_index_meta(idx)["batches"]) == 3


def test_replay_after_commit_is_exactly_once(spark, tmp_path):
    # drive the foreachBatch fn directly; crash window = manifest deleted
    # AFTER the index append committed (the dangerous replay: the batch's
    # own content is already in the index)
    idx = _mkindex(spark, tmp_path)
    root = str(tmp_path / "out")
    write_batch = dedup_ingest_writer(root, idx, threshold=0.5)
    df = spark.createDataFrame(
        [(100, "entirely new content epsilon zeta eta theta"), (101, BASE[3][1])],
        "doc_id long, text string",
    )
    write_batch(df, 0)
    kept0 = {r["doc_id"] for r in read_ingested(spark, root).collect()}
    assert kept0 == {100}
    batches0 = read_index_meta(idx)["batches"]
    man = os.path.join(root, "_docs_batches", "batch-0.json")
    docs_kept = json.load(open(man))["docs_kept"]
    assert docs_kept == 1

    # clean replay: manifest present -> skipped outright
    write_batch(df, 0)
    assert read_index_meta(idx)["batches"] == batches0

    # crashed replay: manifest lost, append already committed -> the probe
    # excludes the batch's own token, survivors recompute IDENTICALLY, the
    # index is not double-appended
    os.remove(man)
    write_batch(df, 0)
    assert {r["doc_id"] for r in read_ingested(spark, root).collect()} == {100}
    assert read_index_meta(idx)["batches"] == batches0
    sigs = spark.read.parquet(os.path.join(idx, "sigs"))
    tok = _batch_token(root, 0)
    assert sigs.where(F.col("batch") == tok).count() == 1  # exactly one copy


def test_retry_after_partial_append_vacuums_first(spark, tmp_path):
    # crash window: the three table writes half-done (simulated: tables
    # written under the batch token, meta commit never ran) -> the retry
    # must vacuum the token's dirs before re-appending, or the sigs table
    # would hold TWO copies of every survivor row
    idx = _mkindex(spark, tmp_path)
    root = str(tmp_path / "out")
    df = spark.createDataFrame(
        [(100, "entirely new content epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    tok = _batch_token(root, 0)
    params = {
        x: read_index_meta(idx)[x] for x in ("k", "bands", "shingle_k", "nmods")
    }
    minhash_index_write(df, idx, mode="append", batch=tok, **params)  # no commit
    write_batch = dedup_ingest_writer(root, idx, threshold=0.5)
    write_batch(df, 0)
    sigs = spark.read.parquet(os.path.join(idx, "sigs"))
    assert sigs.where(F.col("batch") == tok).count() == 1
    assert {r["doc_id"] for r in read_ingested(spark, root).collect()} == {100}


def test_ingest_job_end_to_end(spark, tmp_path, capsys):
    # jobs/ingest_job.py in-process: bootstrap an empty index, drain two
    # landed files, verify the summary line and a second-run no-op
    import jobs.ingest_job as job

    src = tempfile.mkdtemp(prefix="tmframe_ingestjob_src_")
    _docs_pdf(BASE).to_parquet(os.path.join(src, "base.parquet"))
    _docs_pdf([(900, BASE[0][1]), (901, "fresh text nu xi omicron pi rho")]).to_parquet(
        os.path.join(src, "more.parquet")
    )
    root = str(tmp_path / "root")
    idx = str(tmp_path / "idx")
    rc = job.main([
        "--source", src, "--root", root, "--index", idx,
        "--init-index", "--max-files", "1",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    summary = lines[-1]
    assert summary["batches"] == 2 and summary["docs_in"] == 22
    # doc 900 is an exact dup of BASE[0] (ingested in batch 1) -> dropped
    assert summary["docs_kept"] == 21
    kept = {r["doc_id"] for r in read_ingested(spark, root).collect()}
    assert 900 not in kept and 901 in kept and len(kept) == 21
    # re-run: checkpoint answers; nothing new lands, nothing changes
    rc = job.main(["--source", src, "--root", root, "--index", idx])
    assert rc == 0
    again = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")][-1]
    assert again["docs_kept"] == 21 and again["index_batches"] == summary["index_batches"]


def test_ingest_with_ann_leg_end_to_end_and_replay(spark, tmp_path):
    """The full continuous pipeline: docs land -> dedup -> survivors enter
    the doc table AND the (pre-built, frozen-quantizer) IVF+PQ index; the
    appended vectors are immediately servable, and a crashed replay leaves
    exactly one ANN copy (the <token>-ann committed no-op)."""
    import os

    from tmframe_spark.vec.embed import hash_embed
    from tmframe_spark.vec.pq import (
        ivfpq_build_index,
        ivfpq_read_meta,
        ivfpq_topk_from_index,
    )

    idx = _mkindex(spark, tmp_path)
    root = str(tmp_path / "out")
    ann = str(tmp_path / "ann")
    # quantizers frozen on the base corpus's embeddings
    base_emb = hash_embed(
        spark.createDataFrame(BASE, "doc_id long, text string"), dim=32
    ).withColumnRenamed("doc_id", "vec_id")
    ivfpq_build_index(base_emb, ann, nlist=2, m=4, ksub=8, iters=2,
                      store_vectors=True)

    write_batch = dedup_ingest_writer(root, idx, threshold=0.5,
                                      ann_index_path=ann, embed_dim=32)
    df = spark.createDataFrame(
        [(100, "entirely new content epsilon zeta eta theta"),
         (101, BASE[3][1])],
        "doc_id long, text string",
    )
    write_batch(df, 0)
    meta = ivfpq_read_meta(ann)
    assert len(meta["batches"]) == 2  # build + one ingest batch
    # the ingested doc 100's embedding is servable: query with its own
    # vector, expect itself at rank 1 (cosine ~1)
    qv = [float(x) for x in hash_embed(
        df.where("doc_id = 100"), dim=32
    ).collect()[0]["embedding"]]
    # exact re-rank against the index's stored vectors (the appended
    # batch's vectors table leg): raw ADC at this tiny geometry can
    # misrank, the refined result cannot
    top = ivfpq_topk_from_index(spark, ann, qv, k=3, nprobe=2, refine=5).collect()
    assert top[0]["vec_id"] == 100 and top[0]["cosine"] > 0.999

    # crashed replay (manifest lost after everything committed): both the
    # dedup index AND the ANN index must stay exactly-once
    os.remove(os.path.join(root, "_docs_batches", "batch-0.json"))
    write_batch(df, 0)
    assert len(ivfpq_read_meta(ann)["batches"]) == 2
    codes = spark.read.parquet(os.path.join(ann, "codes"))
    tok = _batch_token(root, 0) + "-ann"
    assert codes.where(F.col("batch") == tok).count() == 1  # doc 100 only
