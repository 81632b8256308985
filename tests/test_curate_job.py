"""jobs/curate_job.py: the composed curation pipeline (quality -> lang ->
dedup -> redact -> mixture -> packing), in-process mains with JSON lineage
checks, plus the incremental-index mode against a prebuilt corpus index."""

import json
import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _run(args, capsys):
    import jobs.curate_job as job

    rc = job.main(args)
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    return rc, {l["stage"]: l for l in lines}, lines


def test_curate_full_pipeline(spark, capsys):
    out = tempfile.mkdtemp(prefix="curate_out_")
    packed = tempfile.mkdtemp(prefix="curate_pack_")
    rc, stages, lines = _run([
        "--input", f"{SF_DIR}/documents.parquet", "--output", out,
        "--min-tokens", "5", "--min-quality", "0.2", "--max-top2-frac", "0.5",
        "--langs", "en,und",
        "--dedup", "minhash", "--threshold", "0.5",
        "--redact",
        "--mix", "en:3,fr:1", "--mix-col", "lang",
        "--pack-budget", "256", "--pack-out", packed,
    ], capsys)
    assert rc == 0
    # lineage: monotone non-increasing doc counts through the filter stages
    order = ["read", "quality", "repetition", "lang", "dedup"]
    counts = [stages["read"]["docs"]] + [
        stages[s]["docs_out"] for s in order[1:]
    ]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert stages["mixture"]["rows_out"] == stages["write"]["rows"]
    df = spark.read.parquet(out)
    assert set(df.select("pred_lang").distinct().toPandas()["pred_lang"]) <= {"en", "und"}
    assert set(df.select("lang").distinct().toPandas()["lang"]) == {"en", "fr"}
    assert "pii_hits" in df.columns and "epoch" not in df.columns
    # packing sidecar respects the budget for multi-doc bins
    pk = spark.read.parquet(packed)
    assert stages["pack"]["docs_packed"] == df.select("doc_id").distinct().count()
    over = (
        pk.groupBy("shard", "bin")
        .agg(F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("d"))
        .where((F.col("t") > 256) & (F.col("d") > 1))
        .count()
    )
    assert over == 0


def test_curate_minimal_is_dedup_only(spark, capsys):
    """Default flags: just exact+minhash dedup — matches dedup_job's
    composition on the same corpus."""
    from tmframe_spark.text.dedup import (
        dedup_keep_canonical,
        exact_dedup,
        minhash_lsh_pairs,
    )

    out = tempfile.mkdtemp(prefix="curate_min_")
    rc, stages, _ = _run([
        "--input", f"{SF_DIR}/documents.parquet", "--output", out,
        "--threshold", "0.5",
    ], capsys)
    assert rc == 0
    got = {r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    surv = exact_dedup(docs, "doc_id")
    want = {
        r["doc_id"]
        for r in dedup_keep_canonical(
            surv, minhash_lsh_pairs(surv, "doc_id", threshold=0.5), "doc_id"
        ).select("doc_id").collect()
    }
    assert got == want


def test_curate_incremental_index_mode(spark, capsys):
    """--index: the batch is probed against a prebuilt corpus index
    (planted near-copy dropped) and --update-index folds survivors in so
    an immediate re-run drops everything."""
    from tmframe_spark.text.incremental import minhash_index_write

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    corpus = docs.where("doc_id < 250")
    idx = tempfile.mkdtemp(prefix="curate_idx_")
    minhash_index_write(corpus, idx, k=64, bands=16, shingle_k=3)

    batch = (
        docs.where("doc_id >= 250 and doc_id < 300")
        .unionByName(
            corpus.where("doc_id % 50 = 1").select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zzqx")).alias("text"),
            )
        )
    )
    binp = tempfile.mkdtemp(prefix="curate_batch_")
    batch.write.mode("overwrite").parquet(binp)
    out = tempfile.mkdtemp(prefix="curate_incr_")
    rc, stages, _ = _run([
        "--input", binp, "--output", out,
        "--index", idx, "--threshold", "0.5", "--update-index",
    ], capsys)
    assert rc == 0
    assert stages["dedup"]["mode"] == "incremental"
    assert stages["index_append"]["params"]["k"] == 64
    kept = {r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()}
    assert kept and not {i for i in kept if i >= 1_000_000}
    # re-running the same batch now dedups to empty (survivors are indexed)
    out2 = tempfile.mkdtemp(prefix="curate_incr2_")
    rc2, stages2, _ = _run([
        "--input", out, "--output", out2,
        "--index", idx, "--threshold", "0.5",
    ], capsys)
    assert rc2 == 0
    assert stages2["dedup"]["docs_out"] == 0


def test_curate_span_removal_stage(spark, capsys):
    """--remove-spans: planted cross-doc boilerplate is cut at token level
    (canonical occurrence survives), lineage reports the exact totals, and
    the written corpus carries the cleaned text + n_removed metadata."""
    import tempfile

    boiler = ("this license header is shared across documents exactly "
              "verbatim in every mirror of the corpus")
    rows = [
        (1, boiler + " plus unique tail alpha beta gamma delta epsilon zeta"),
        (2, "totally different unique leading content here " + boiler),
        (3, "another fully unique document with no shared spans at all"),
    ]
    src = tempfile.mkdtemp(prefix="curate_span_src_")
    out = tempfile.mkdtemp(prefix="curate_span_out_")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(src)

    rc, stages, _ = _run([
        "--input", src, "--output", out,
        "--dedup", "off", "--remove-spans", "8",
    ], capsys)
    assert rc == 0
    sr = stages["span_removal"]
    assert sr["w"] == 8 and sr["docs_affected"] == 1 and sr["tokens_removed"] > 0

    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert got[1]["text"].startswith("this license header is shared")
    assert "license" not in got[2]["text"] and got[2]["n_removed"] > 0
    assert got[3]["n_removed"] == 0
    assert sr["tokens_removed"] == sum(r["n_removed"] for r in got.values())


def test_curate_lm_quality_stage(spark, capsys):
    """--min-lm-logprob: docs that the reference-trained bigram LM finds
    implausible are dropped; fluent-in-reference docs and unscorable
    (<2-token) docs survive, with lm_logprob kept as metadata."""
    import tempfile

    ref_rows = [(i, "the quick brown fox jumps over the lazy dog again and again")
                for i in range(8)]
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),   # in-model
        (2, "dog lazy the over jumps fox brown quick the"),   # scrambled
        (3, "zz qq ww ee rr tt yy uu"),                       # all-oov
        (4, "single"),                                        # unscorable
    ]
    ref = tempfile.mkdtemp(prefix="curate_lm_ref_")
    src = tempfile.mkdtemp(prefix="curate_lm_src_")
    out = tempfile.mkdtemp(prefix="curate_lm_out_")
    spark.createDataFrame(ref_rows, "doc_id long, text string").write.mode(
        "overwrite").parquet(ref)
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite").parquet(src)

    from tmframe_spark.text.lm import lm_score, lm_train

    model = lm_train(spark.read.parquet(ref))
    scores = {r["doc_id"]: r["avg_logprob"]
              for r in lm_score(spark.read.parquet(src), model).collect()}
    # the fluent doc scores strictly above the scrambled and oov docs
    assert scores[1] > scores[2] > scores[3]
    floor = (scores[1] + scores[2]) / 2

    rc, stages, _ = _run([
        "--input", src, "--output", out,
        "--dedup", "off",
        "--min-lm-logprob", str(floor), "--lm-ref", ref,
    ], capsys)
    assert rc == 0
    st = stages["lm_quality"]
    assert st["docs_dropped"] == 2 and st["ref"] == ref
    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {1, 4}
    assert got[1]["lm_logprob"] == scores[1]
    assert got[4]["lm_logprob"] is None


def test_curate_dsir_stage(spark, capsys):
    """--min-dsir-weight: docs leaning toward the target corpus survive;
    off-domain docs drop; dsir_weight kept as metadata."""
    import tempfile

    target_rows = [(i, "the quick brown fox jumps over the lazy dog")
                   for i in range(6)]
    rows = [
        (1, "the quick brown fox naps near the lazy dog"),   # target-like
        (2, "stock prices fell sharply in early trading today"),
        (3, "market volatility increased amid economic uncertainty"),
    ]
    tgt = tempfile.mkdtemp(prefix="curate_dsir_t_")
    src = tempfile.mkdtemp(prefix="curate_dsir_s_")
    out = tempfile.mkdtemp(prefix="curate_dsir_o_")
    spark.createDataFrame(target_rows, "doc_id long, text string").write.mode(
        "overwrite").parquet(tgt)
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite").parquet(src)

    from tmframe_spark.text.dsir import dsir_fit, dsir_weights

    docs = spark.read.parquet(src)
    scores = {r["doc_id"]: r["avg_weight"] for r in dsir_weights(
        docs, dsir_fit(spark.read.parquet(tgt)), dsir_fit(docs)).collect()}
    assert scores[1] > max(scores[2], scores[3])
    floor = (scores[1] + max(scores[2], scores[3])) / 2

    rc, stages, _ = _run([
        "--input", src, "--output", out, "--dedup", "off",
        "--min-dsir-weight", str(floor), "--dsir-target", tgt,
    ], capsys)
    assert rc == 0
    assert stages["dsir"]["docs_dropped"] == 2
    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {1} and got[1]["dsir_weight"] == scores[1]


def test_curate_quality_plus_span_removal_compose(spark, capsys):
    """Regression (found by the r6 sf0.1 rehearsal): stage 1's quality
    columns and stage 5's span-removal join both carried an n_tokens column
    — the final write failed with COLUMN_ALREADY_EXISTS whenever BOTH
    stages ran. The span stage must join only (id, clean text, n_removed)."""
    import tempfile

    boiler = ("this license header is shared across documents exactly "
              "verbatim in every mirror of the corpus")
    rows = [
        (1, boiler + " plus unique tail alpha beta gamma delta epsilon zeta"),
        (2, "totally different unique leading content here " + boiler),
        (3, "another fully unique document with no shared spans at all"),
    ]
    src = tempfile.mkdtemp(prefix="curate_qspan_src_")
    out = tempfile.mkdtemp(prefix="curate_qspan_out_")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(src)

    rc, stages, _ = _run([
        "--input", src, "--output", out,
        "--min-tokens", "3", "--min-quality", "0.0",
        "--dedup", "off", "--remove-spans", "8",
    ], capsys)
    assert rc == 0
    df = spark.read.parquet(out)
    assert df.columns.count("n_tokens") == 1
    assert stages["span_removal"]["docs_affected"] == 1
    assert {r["doc_id"] for r in df.collect()} == {1, 2, 3}
