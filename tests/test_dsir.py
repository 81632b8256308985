"""DSIR importance weights (text/dsir.py) against a sequential reference:
exact integer evidence columns, the Q32 weight within the ulp bound, and
target-likeness ordering on a planted corpus."""

import hashlib
import math
from collections import Counter

import pytest

from tmframe_spark.text.dsir import DSIR_Q, dsir_fit, dsir_weights

TARGET = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (10, "the quick red fox runs over the lazy cat"),
    (20, "a quick brown dog jumps over the lazy fox"),
]
RAW = [
    (1, "stock prices fell sharply in early trading today"),
    (2, "the quick brown fox naps under the lazy tree"),  # target-like
    (3, "market volatility increased amid economic uncertainty levels"),
    (4, "single"),
]


def _feats(text, m=512):
    ws = text.lower().strip().split()
    grams = list(ws)
    if len(ws) >= 2:
        grams += [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    else:
        grams += ws  # the short-doc convention: whole doc as its "bigram"
    return [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % m for g in grams]


def _ref(target_rows, raw_rows, score_rows, m=512):
    tc = Counter(f for _, t in target_rows for f in _feats(t, m))
    rc = Counter(f for _, t in raw_rows for f in _feats(t, m))
    nt, nr = sum(tc.values()), sum(rc.values())
    out = {}
    for did, text in score_rows:
        c = Counter(_feats(text, m))
        n_feats = sum(c.values())
        dot_t = sum(v * tc.get(f, 0) for f, v in c.items())
        dot_r = sum(v * rc.get(f, 0) for f, v in c.items())
        q = sum(
            v
            * math.floor(
                (
                    math.log((tc.get(f, 0) + 1) / (nt + m))
                    - math.log((rc.get(f, 0) + 1) / (nr + m))
                )
                * DSIR_Q
            )
            for f, v in c.items()
        )
        out[did] = (n_feats, dot_t, dot_r, q)
    return out


@pytest.fixture(scope="module")
def scored(spark):
    docs = spark.createDataFrame(TARGET + RAW, "doc_id long, text string")
    target = dsir_fit(docs.where("doc_id % 10 = 0"), n_buckets=512)
    raw = dsir_fit(docs.where("doc_id % 10 <> 0"), n_buckets=512)
    return {r["doc_id"]: r for r in dsir_weights(docs, target, raw).collect()}


def test_integer_evidence_exact(scored):
    ref = _ref(TARGET, RAW, TARGET + RAW)
    for did, (n, dt, dr, _q) in ref.items():
        r = scored[did]
        assert (r["n_feats"], int(r["dot_target"]), int(r["dot_raw"])) == (n, dt, dr)


def test_q32_weight_within_ulp_bound(scored):
    ref = _ref(TARGET, RAW, TARGET + RAW)
    for did, (n, _dt, _dr, q) in ref.items():
        assert abs(scored[did]["weight_q32"] - q) <= n, did


def test_target_like_raw_doc_outranks_off_domain(scored):
    # doc 2 shares the target's vocabulary; docs 1/3 do not
    assert scored[2]["avg_weight"] > scored[1]["avg_weight"]
    assert scored[2]["avg_weight"] > scored[3]["avg_weight"]
    # and the target docs themselves rank above the off-domain raw docs
    assert scored[0]["avg_weight"] > scored[1]["avg_weight"]


def test_partitioning_independence(spark):
    docs = spark.createDataFrame(TARGET + RAW, "doc_id long, text string")
    target = dsir_fit(docs.where("doc_id % 10 = 0"), n_buckets=512)
    raw = dsir_fit(docs.where("doc_id % 10 <> 0"), n_buckets=512)
    a = {r["doc_id"]: r["weight_q32"]
         for r in dsir_weights(docs.repartition(7), target, raw).collect()}
    b = {r["doc_id"]: r["weight_q32"]
         for r in dsir_weights(docs.repartition(2), target, raw).collect()}
    assert a == b


def test_mismatched_buckets_and_empty_fit_raise(spark):
    docs = spark.createDataFrame(TARGET, "doc_id long, text string")
    fit = dsir_fit(docs, n_buckets=512)
    other = dsir_fit(docs, n_buckets=256)
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_weights(docs, fit, other)
    empty = dsir_fit(
        spark.createDataFrame([], "doc_id long, text string"), n_buckets=512
    )
    with pytest.raises(ValueError, match="empty"):
        dsir_weights(docs, fit, empty)


def test_corpus_drift_identical_corpora_zero(spark):
    from tmframe_spark.text.dsir import corpus_drift

    docs = spark.createDataFrame(TARGET, "doc_id long, text string")
    fa = dsir_fit(docs, n_buckets=512)
    fb = dsir_fit(docs, n_buckets=512)
    rows = corpus_drift(fa, fb).collect()
    assert rows and all(int(r["contrast"]) == 0 and r["psi_q32"] == 0 for r in rows)


def test_corpus_drift_planted_shift_tops_both_signals(spark):
    import hashlib

    from tmframe_spark.text.dsir import corpus_drift

    base = TARGET + RAW
    shifted = base + [(900 + i, "zzqdrift " * 30) for i in range(5)]
    fa = dsir_fit(spark.createDataFrame(base, "doc_id long, text string"),
                  n_buckets=512)
    fb = dsir_fit(spark.createDataFrame(shifted, "doc_id long, text string"),
                  n_buckets=512)
    rows = corpus_drift(fa, fb).collect()
    planted_f = int(hashlib.md5(b"zzqdrift").hexdigest()[:15], 16) % 512
    top_contrast = min(rows, key=lambda r: int(r["contrast"]))  # most B-heavy
    top_psi = max(rows, key=lambda r: r["psi_q32"])
    assert top_contrast["f"] == planted_f
    assert top_psi["f"] == planted_f and top_psi["psi_q32"] > 0


def test_corpus_drift_reference_and_psi_sum(spark):
    import math

    from tmframe_spark.text.dsir import DSIR_Q, corpus_drift

    a_rows, b_rows = TARGET, RAW
    fa = dsir_fit(spark.createDataFrame(a_rows, "doc_id long, text string"),
                  n_buckets=512)
    fb = dsir_fit(spark.createDataFrame(b_rows, "doc_id long, text string"),
                  n_buckets=512)
    got = {r["f"]: r for r in corpus_drift(fa, fb).collect()}
    from collections import Counter

    ca = Counter(f for _, t in a_rows for f in _feats(t))
    cb = Counter(f for _, t in b_rows for f in _feats(t))
    na, nb, m = sum(ca.values()), sum(cb.values()), 512
    assert set(got) == set(ca) | set(cb)
    for f in got:
        r = got[f]
        assert (r["c_a"], r["c_b"]) == (ca.get(f, 0), cb.get(f, 0))
        assert int(r["contrast"]) == ca.get(f, 0) * nb - cb.get(f, 0) * na
        pa = (ca.get(f, 0) + 1) / (na + m)
        pb = (cb.get(f, 0) + 1) / (nb + m)
        ref_q = math.floor((pa - pb) * math.log(pa / pb) * DSIR_Q)
        assert abs(r["psi_q32"] - ref_q) <= 1, f
