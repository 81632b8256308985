"""N-gram language-model quality scoring — the CCNet-style corpus filter
(Wenzek et al. 2020: score documents by LM perplexity against a clean
reference corpus; high-perplexity docs are low-quality candidates).

Spark-first shape:

- training collapses the reference corpus to bigram / unigram COUNT tables
  (one map-side-combined shuffle each — the BPE trainer's corpus pass);
- scoring is two gram-keyed left joins per position (model tables from a
  small clean reference auto-broadcast under the join threshold; at equal
  scale the joins are data-sized hash joins, AQE handles hot grams);
- the per-document reduction is EXACT: integer position-class counts
  (hits / backoffs / oovs) plus a Q32 fixed-point log-probability sum
  (``floor(ln(s) * 2^32)`` per position, summed as int64) — deterministic
  and partition-independent by construction, unlike a raw double sum whose
  value depends on reduction order.

Cross-engine caveat (why the float is NOT oracle-hashed): ``ln`` is not a
correctly-rounded IEEE-754 operation — JVM and C libm may differ in the
last ulp, so per-position quanta can differ by ±1 between engines. The
integer columns ARE oracle-hashed (pytest mirror ``lm_quality``); the Q32
sum is pytest-pinned against a python reference within the ±n_scored
quantum bound that the ulp argument guarantees.

Scoring rule (Stupid Backoff, Brants et al. 2007 — score, not a proper
probability, exactly as published):

    S(w | ctx) = c(ctx w) / c(ctx)          if c(ctx w) > 0   ["hit"]
               = alpha * c(w) / N           elif c(w) > 0     ["backoff"]
               = alpha * 1 / N              else              ["oov"]
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Q32 fixed point for the log-score sum: floor(ln(s) * 2^32) per position.
LM_Q = 1 << 32

#: Stupid Backoff discount (the published constant).
LM_ALPHA = 0.4


def _words(col):
    """The corpus tokenization every text op shares (analysis._words)."""
    return F.split(F.lower(F.trim(col)), r"\s+")


def _bigram_positions(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per bigram position: (id, ctx=w_i, w=w_{i+1}, gram="w_i w_{i+1}").
    Docs with fewer than two tokens contribute no positions (empty array —
    never a descending Spark sequence())."""
    ws = _words(F.col(text_col))
    idx = F.when(F.size(ws) >= 2, F.sequence(F.lit(1), F.size(ws) - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return (
        docs.select(F.col(id_col).alias("id"), ws.alias("_ws"), idx.alias("_idx"))
        .select("id", "_ws", F.explode("_idx").alias("i"))
        .select(
            "id",
            F.element_at("_ws", F.col("i")).alias("ctx"),
            F.element_at("_ws", F.col("i") + 1).alias("w"),
            F.concat_ws(
                " ",
                F.element_at("_ws", F.col("i")),
                F.element_at("_ws", F.col("i") + 1),
            ).alias("gram"),
        )
    )


def lm_train(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
) -> dict:
    """Train the bigram Stupid-Backoff model over a (clean) corpus.

    Returns ``{"bigram": (gram, c2), "unigram": (w, c1), "total": N}``.
    ``min_count`` prunes the BIGRAM table only (the classic model-size
    lever); unigrams are never pruned so a surviving bigram's context count
    always resolves. ``N`` is the unpruned token total (one scalar collect).
    Both tables are eagerly localCheckpointed: scoring reuses each across
    branches, and the unigram count feeds N."""
    uni = (
        docs.select(F.explode(_words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
        .localCheckpoint(eager=True)
    )
    big = (
        _bigram_positions(docs, id_col, text_col)
        .groupBy("gram")
        .agg(F.count("*").alias("c2"))
    )
    if min_count > 1:
        big = big.where(F.col("c2") >= min_count)
    big = big.localCheckpoint(eager=True)
    total = uni.agg(F.sum("c1")).collect()[0][0] or 0
    return {"bigram": big, "unigram": uni, "total": int(total)}


def lm_score(
    docs: DataFrame,
    model: dict,
    alpha: float = LM_ALPHA,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document against a trained model.

    Output, one row per input document (docs with <2 tokens score zeros):
    ``(id_col, n_scored, hits, backoffs, oovs, logprob_q32, avg_logprob)``
    where ``logprob_q32 = sum(floor(ln(S_position) * 2^32))`` (int64,
    exact reduction) and ``avg_logprob = (logprob_q32 / n_scored) / 2^32``
    (two final IEEE divisions). Lower avg_logprob = higher perplexity =
    lower LM quality."""
    n = model["total"]
    if n <= 0:
        raise ValueError("lm_score: model trained on an empty corpus")
    pos = _bigram_positions(docs, id_col, text_col)
    ctx_cnt = model["unigram"].select(
        F.col("w").alias("ctx"), F.col("c1").alias("ctx_cnt")
    )
    w_cnt = model["unigram"].select(F.col("w"), F.col("c1").alias("w_cnt"))
    joined = (
        pos.join(model["bigram"], "gram", "left")
        .join(ctx_cnt, "ctx", "left")
        .join(w_cnt, "w", "left")
    )
    # per-position Stupid Backoff score as ONE pinned double expression,
    # then the Q32 floor — everything after this sums as exact int64
    s = (
        F.when(
            F.col("c2").isNotNull(),
            F.col("c2").cast("double") / F.col("ctx_cnt").cast("double"),
        )
        .when(
            F.col("w_cnt").isNotNull(),
            F.lit(alpha) * F.col("w_cnt").cast("double") / F.lit(float(n)),
        )
        .otherwise(F.lit(alpha) / F.lit(float(n)))
    )
    q = F.floor(F.log(s) * F.lit(float(LM_Q))).cast("long")
    per_doc = joined.groupBy("id").agg(
        F.count("*").alias("n_scored"),
        F.sum(F.col("c2").isNotNull().cast("long")).alias("hits"),
        F.sum(
            (F.col("c2").isNull() & F.col("w_cnt").isNotNull()).cast("long")
        ).alias("backoffs"),
        F.sum(
            (F.col("c2").isNull() & F.col("w_cnt").isNull()).cast("long")
        ).alias("oovs"),
        F.sum(q).alias("logprob_q32"),
    )
    base = docs.select(F.col(id_col).alias("id"))
    out = base.join(per_doc, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_scored", F.lit(0)).cast("long").alias("n_scored"),
        F.coalesce("hits", F.lit(0)).cast("long").alias("hits"),
        F.coalesce("backoffs", F.lit(0)).cast("long").alias("backoffs"),
        F.coalesce("oovs", F.lit(0)).cast("long").alias("oovs"),
        F.col("logprob_q32"),
        (
            (F.col("logprob_q32").cast("double") / F.col("n_scored").cast("double"))
            / F.lit(float(LM_Q))
        ).alias("avg_logprob"),
    )
    return out
