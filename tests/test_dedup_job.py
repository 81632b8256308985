"""jobs/dedup_job.py: end-to-end corpus dedup (exact pass -> pair gen ->
components -> canonical keep), in-process mains against the driver corpus."""

import tempfile

from tests.conftest import SF_DIR


def _run(args):
    import jobs.dedup_job as job

    return job.main(args)


def test_dedup_job_minhash_end_to_end(spark):
    from tmframe_spark.text.dedup import (
        dedup_clusters,
        exact_dedup,
        minhash_lsh_pairs,
    )

    out = tempfile.mkdtemp(prefix="dedup_out_")
    cl = tempfile.mkdtemp(prefix="dedup_cl_")
    rc = _run([
        "--input", f"{SF_DIR}/documents.parquet", "--output", out,
        "--method", "minhash", "--threshold", "0.5", "--clusters-out", cl,
    ])
    assert rc == 0
    got = {r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()}
    # independent expectation: exact survivors minus non-canonical members
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    surv = exact_dedup(docs, "doc_id")
    pairs = minhash_lsh_pairs(surv, "doc_id", threshold=0.5, shingle_k=3)
    clusters = {r["id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    losers = {i for i, c in clusters.items() if i != c}
    want = {r["doc_id"] for r in surv.select("doc_id").collect()} - losers
    assert got == want and len(got) < docs.count()
    # the cluster sidecar landed and is canonical-min consistent
    side = {r["id"]: r["cluster_id"] for r in spark.read.parquet(cl).collect()}
    assert side == clusters
    assert all(c <= i for i, c in side.items())


def test_dedup_job_exact_only(spark):
    from tmframe_spark.text.dedup import exact_dedup

    out = tempfile.mkdtemp(prefix="dedup_out_")
    rc = _run([
        "--input", f"{SF_DIR}/documents.parquet", "--output", out,
        "--method", "exact",
    ])
    assert rc == 0
    got = spark.read.parquet(out).count()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert got == exact_dedup(docs, "doc_id").count()


def test_dedup_job_jaccard_routes_via_precheck(spark, capsys):
    import json

    out = tempfile.mkdtemp(prefix="dedup_out_")
    rc = _run([
        "--input", f"{SF_DIR}/documents.parquet", "--output", out,
        "--method", "jaccard", "--threshold", "0.5",
    ])
    assert rc == 0
    lines = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    pair_line = next(ln for ln in lines if ln.get("stage") == "pairs")
    # the driver corpus is clean (BENCH.md: capped_tokens=0) -> the job must
    # route to the plain exact form, not pay the 2.3x capped overhead
    assert pair_line["method"] == "jaccard" and pair_line["df_capped"] is False
    assert spark.read.parquet(out).count() > 0


def test_dedup_job_decontaminates_against_benchmark(spark, capsys):
    import json

    out = tempfile.mkdtemp(prefix="dedup_out_")
    bench_dir = tempfile.mkdtemp(prefix="dedup_bench_") + "/bench"
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # benchmark = copies of a few corpus docs -> those docs (and their
    # exact dups) must not survive the pipeline
    bench_ids = {r["doc_id"] for r in docs.where("doc_id % 100 = 0").collect()}
    docs.where("doc_id % 100 = 0").write.parquet(bench_dir)
    rc = _run([
        "--input", f"{SF_DIR}/documents.parquet", "--output", out,
        "--method", "minhash", "--threshold", "0.5",
        "--benchmark", bench_dir, "--contamination-threshold", "0.5",
    ])
    assert rc == 0
    kept = {r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()}
    assert not (kept & bench_ids)
    lines = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    dec = next(ln for ln in lines if ln.get("stage") == "decontaminate")
    assert dec["docs_dropped"] >= len(bench_ids)
