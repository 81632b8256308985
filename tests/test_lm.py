"""Bigram Stupid-Backoff LM quality scoring (text/lm.py): exact integer
position classes, the Q32 log-score sum vs a python reference (within the
±1-quantum-per-position ulp bound — ln is not correctly rounded, so exact
cross-library bits are out of reach by design), and determinism."""

import math
from collections import Counter

import pytest

from tmframe_spark.text.lm import LM_ALPHA, LM_Q, lm_score, lm_train

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the hat"),
    (2, "a dog ran over the hill"),
    (3, "the the the the"),
    (4, "zyx qwv zyx qwv"),  # oov-free in-corpus but unique bigrams
    (5, "single"),  # < 2 tokens -> zero scored positions
    (6, "the cat sat on the mat"),  # duplicate of 0
]


def _ref(train_rows, score_rows, alpha=LM_ALPHA):
    """Single-threaded Stupid Backoff reference."""
    uni, big = Counter(), Counter()
    for _, text in train_rows:
        ws = text.lower().strip().split()
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    n = sum(uni.values())
    out = {}
    for did, text in score_rows:
        ws = text.lower().strip().split()
        hits = backs = oovs = 0
        q = 0
        for a, b in zip(ws, ws[1:]):
            if (a, b) in big:
                hits += 1
                s = big[(a, b)] / uni[a]
            elif b in uni:
                backs += 1
                s = alpha * uni[b] / n
            else:
                oovs += 1
                s = alpha / n
            q += math.floor(math.log(s) * LM_Q)
        out[did] = (len(ws) - 1 if len(ws) >= 2 else 0, hits, backs, oovs, q)
    return out


@pytest.fixture(scope="module")
def scored(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = lm_train(docs)
    return {r["doc_id"]: r for r in lm_score(docs, model).collect()}


def test_integer_position_classes_exact(scored):
    ref = _ref(DOCS, DOCS)
    for did, (n_scored, hits, backs, oovs, _) in ref.items():
        r = scored[did]
        got = (r["n_scored"], r["hits"], r["backoffs"], r["oovs"])
        assert got == (n_scored, hits, backs, oovs), (did, got)


def test_q32_logprob_within_ulp_bound(scored):
    ref = _ref(DOCS, DOCS)
    for did, (n_scored, *_rest, q) in ref.items():
        got = scored[did]["logprob_q32"]
        if n_scored == 0:
            assert got is None
        else:
            assert abs(got - q) <= n_scored, (did, got, q)


def test_zero_position_doc_scores_zeros(scored):
    r = scored[5]
    assert (r["n_scored"], r["hits"], r["backoffs"], r["oovs"]) == (0, 0, 0, 0)
    assert r["logprob_q32"] is None and r["avg_logprob"] is None


def test_oov_scoring_against_foreign_model(spark):
    # score a doc whose words the model has never seen: every position oov
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = lm_train(docs)
    foreign = spark.createDataFrame(
        [(99, "completely unseen wordforms here")], "doc_id long, text string"
    )
    r = lm_score(foreign, model).collect()[0]
    assert (r["n_scored"], r["hits"], r["backoffs"], r["oovs"]) == (3, 0, 0, 3)
    # three identical oov quanta, summed exactly
    q1 = math.floor(math.log(LM_ALPHA / model["total"]) * LM_Q)
    assert abs(r["logprob_q32"] - 3 * q1) <= 3


def test_duplicate_doc_scores_identically(scored):
    a, b = scored[0], scored[6]
    assert (a["n_scored"], a["hits"], a["backoffs"], a["oovs"], a["logprob_q32"]) == (
        b["n_scored"], b["hits"], b["backoffs"], b["oovs"], b["logprob_q32"]
    )


def test_partitioning_independence(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = lm_train(docs)
    a = {r["doc_id"]: r["logprob_q32"] for r in lm_score(docs.repartition(7), model).collect()}
    b = {r["doc_id"]: r["logprob_q32"] for r in lm_score(docs.repartition(2), model).collect()}
    assert a == b


def test_min_count_prunes_bigrams_only(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = lm_train(docs, min_count=2)
    kept = {r["gram"] for r in model["bigram"].collect()}
    # "the cat" appears in docs 0, 1, 6 -> survives; "a dog" is unique -> pruned
    assert "the cat" in kept and "a dog" not in kept
    # unigram table unpruned: every context for surviving bigrams resolves
    r = {x["doc_id"]: x for x in lm_score(docs, model).collect()}[2]
    assert r["hits"] + r["backoffs"] + r["oovs"] == r["n_scored"]
    assert r["oovs"] == 0  # all words trained, backoff only


def test_empty_model_raises(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    empty = spark.createDataFrame([], "doc_id long, text string")
    model = lm_train(empty)
    with pytest.raises(ValueError, match="empty corpus"):
        lm_score(docs, model)
