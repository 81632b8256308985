"""Benchmark decontamination + PII redaction: overlap math, filtering,
and the regex scrub on planted PII."""

import pytest
from pyspark.sql import functions as F

from tmframe_spark.text.decontaminate import (
    contamination_scores,
    decontaminate,
    redact_pii,
    with_redacted_text,
)

BENCH_TEXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


@pytest.fixture(scope="module")
def corpus(spark):
    fresh = "one two three four five six seven eight nine ten"
    rows = [
        (0, BENCH_TEXT),                              # the benchmark doc itself
        (1, BENCH_TEXT),                              # full copy -> 1.0
        (2, BENCH_TEXT + " " + fresh),                # partial overlap
        (3, fresh),                                   # clean -> 0.0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def test_contamination_scores(corpus, spark):
    bench = corpus.where("doc_id = 0")
    got = {
        r["doc_id"]: (r["contaminated"], r["total"], r["contamination"])
        for r in contamination_scores(corpus, bench, shingle_k=8).collect()
    }
    assert set(got) == {0, 1, 2, 3}  # every doc keeps a row
    assert got[0][2] == 1.0 and got[1][2] == 1.0
    assert 0.0 < got[2][2] < 1.0
    assert got[3] == (0, 3, 0.0)  # 10 words -> 3 8-shingles, none shared
    # 20-word doc: 13 shingles, the 3 fully-inside-benchmark ones hit
    assert got[2][1] == 13 and got[2][0] == 3


def test_decontaminate_drops_above_threshold(corpus):
    bench = corpus.where("doc_id = 0")
    kept = {
        r["doc_id"] for r in decontaminate(corpus, bench, threshold=0.5).collect()
    }
    assert kept == {2, 3}  # full copies (incl. the bench doc) dropped
    strict = {
        r["doc_id"] for r in decontaminate(corpus, bench, threshold=0.0).collect()
    }
    assert strict == {3}


def test_redact_pii_patterns(spark):
    rows = [
        (0, "mail me at alice.smith+x@sub.example.co or visit https://a.b/c?d=1"),
        (1, "call 0049 123 456-789 now"),
        (2, "clean text with short 123 number"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text_redacted"], r["pii_hits"])
           for r in with_redacted_text(df).collect()}
    assert got[0] == ("mail me at <EMAIL> or visit <URL>", 2)
    assert got[1] == ("call <PHONE> now", 1)
    assert got[2] == ("clean text with short 123 number", 0)
    # scrub is idempotent: redacting redacted text changes nothing
    red = df.select(redact_pii(redact_pii(F.col("text"))).alias("t"),
                    redact_pii(F.col("text")).alias("once")).collect()
    assert all(r["t"] == r["once"] for r in red)


def test_contamination_plan_broadcasts_benchmark_single_pass(corpus):
    # the scale contract: the benchmark shingle set is the broadcast build
    # side of ONE mark-join — the corpus is scanned and exploded exactly
    # once (hits and totals come from the same aggregation)
    bench = corpus.where("doc_id = 0")
    plan = (
        contamination_scores(corpus, bench, shingle_k=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Generate explode") <= 2, plan  # corpus once + bench once


def test_repetition_stats_flags_degenerate_text(spark):
    from tmframe_spark.text.analysis import repetition_stats

    rows = [
        (0, "spam spam spam spam spam spam"),          # one 2-gram repeated
        (1, "the quick brown fox jumps over dogs"),    # all distinct 2-grams
        (2, "ab ab cd ab ab cd ab ab"),                # mixed
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[0]["top2_frac"] == 1.0 and got[0]["total_2grams"] == 5
    assert got[1]["top2_frac"] == 1 / 6 and got[1]["top2_count"] == 1
    assert got[2]["top2_frac"] == 3 / 7  # 'ab ab' x3 of 7 2-grams
    # exactness: frac == top/total for every row
    for r in got.values():
        assert r["top2_frac"] == r["top2_count"] / r["total_2grams"]
        assert r["top3_frac"] == r["top3_count"] / r["total_3grams"]


def test_shingle_idf_stats_vs_reference(spark):
    """IDF-weighted novelty against a sequential reference: a doc built
    entirely from corpus-wide boilerplate scores low, a unique doc scores
    the max weight on every shingle, and the integer weights equal
    floor(log2 N) - floor(log2 df) exactly."""
    import re

    from tmframe_spark.text.analysis import shingle_idf_stats

    boiler = "the quick brown fox jumps over the lazy dog"
    docs = [
        (1, boiler),
        (2, boiler + " again " + boiler),
        (3, boiler),
        (4, "entirely novel phrasing appears nowhere else in this corpus"),
        (5, "short doc"),
    ]

    def ref(k=3):
        per: dict[int, dict[str, int]] = {}
        for i, t in docs:
            ws = re.split(r"\s+", t.strip().lower())
            sh = [" ".join(ws[p : p + k]) for p in range(0, max(len(ws) - k, 0) + 1)]
            d = per.setdefault(i, {})
            for s in sh:
                d[s] = d.get(s, 0) + 1
        dfreq: dict[str, int] = {}
        for d in per.values():
            for s in d:
                dfreq[s] = dfreq.get(s, 0) + 1
        n = len(docs)
        out = {}
        for i, d in per.items():
            tot = sum(d.values())
            idf = sum(c * (n.bit_length() - dfreq[s].bit_length()) for s, c in d.items())
            out[i] = (tot, idf)
        return out

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_shingles"], r["idf_sum"]) for r in
           shingle_idf_stats(df, "doc_id", k=3).collect()}
    expect = ref()
    assert got == expect
    # doc 4 is fully novel: every shingle at df=1 -> weight floor(log2 5)=2
    assert got[4][1] == got[4][0] * 2
    # docs 1/3 are identical boilerplate (df=3): weight 2 - 1 = 1 each
    assert got[1][1] == got[1][0] * 1
