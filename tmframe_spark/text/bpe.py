"""Distributed BPE tokenizer training + encoding over document corpora.

The missing "train the tokenizer" stage of a training-data pipeline
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units"). BPE is inherently iterative — each merge changes the
next iteration's pair counts — so the Spark form follows the engine's
iterative-trainer precedent (vec/similarity.ivf_train_distributed):

- the corpus collapses to a WORD-FREQUENCY table first (one shuffle);
  every later iteration runs over distinct words weighted by freq, which
  is vocabulary-sized, not corpus-sized — the classic trick that makes
  BPE training tractable at any corpus scale;
- one iteration = pair counts (arrays_zip of the symbol array against its
  own tail, explode, freq-weighted sum — all JVM-side), a ONE-ROW collect
  of the argmax pair (deterministic tie-break: count desc, then pair
  lexicographic), and a leftmost-greedy merge applied as an F.aggregate
  fold (pure codegen, no UDF);
- lineage is truncated with an eager localCheckpoint every iteration
  (the library-op rule: never persist(), checkpoint instead).

Symbols: unicode code-unit characters plus a trailing '</w>' end-of-word
marker (Sennrich's scheme: 'low' -> [l, o, w, </w>]). Non-BMP characters
would split into surrogate halves (Java string semantics) — acceptable
for the ASCII/BMP corpora here and documented.

Encoding applies the learned ranked merges per DISTINCT word (encode each
word once, join back — the same vocabulary-sized trick) in an
Arrow-batched pandas UDF: per-word BPE encoding walks merge ranks
iteratively, which no fixed-depth SQL expression can express for
arbitrary merge counts.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tmframe_spark.text.dedup import tokens

EOW = "</w>"


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the normalized token stream — the corpus-sized
    shuffle happens exactly once, here."""
    return (
        df.select(F.explode(tokens(F.col(text_col), distinct=False)).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _init_syms(wf: DataFrame) -> DataFrame:
    return wf.select(
        "word",
        "freq",
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW))).alias("syms"),
    )


def _merge_fold(a: str, b: str):
    """Leftmost-greedy merge of adjacent (a, b) into a+b as a pure-codegen
    left fold: 'aaa' under (a,a) becomes [aa, a], exactly the sequential
    BPE behavior (a freshly merged symbol never re-merges in the same
    pass unless it equals ``a`` again)."""
    merged = a + b
    return F.aggregate(
        "syms",
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    corpus: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` BPE merges; returns the ranked merge
    list [(left, right), ...]. Stops early when the best remaining pair's
    weighted frequency drops below ``min_freq`` (or no pairs remain).

    Driver state is one (pair, count) row per iteration — the same
    bounded-collect contract as the IVF trainer's changed-cell reads."""
    wf = _init_syms(word_freqs(corpus, text_col)).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        zipped = F.zip_with(
            F.slice("syms", 1, F.size("syms") - 1),
            F.slice(F.col("syms"), 2, F.size("syms") - 1),
            lambda x, y: F.struct(x.alias("a"), y.alias("b")),
        )
        pairs = (
            wf.select("freq", F.explode(zipped).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(F.col("cnt").desc(), "a", "b").limit(1).collect()
        if not top or top[0]["cnt"] < min_freq:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        wf = wf.withColumn("syms", _merge_fold(a, b)).localCheckpoint(eager=True)
    return merges


def bpe_vocab(corpus: DataFrame, merges: list[tuple[str, str]], text_col: str = "text") -> DataFrame:
    """Final (symbol, freq) table after applying ``merges`` — the learned
    subword vocabulary with corpus frequencies."""
    enc = bpe_encode_words(word_freqs(corpus, text_col), merges)
    return (
        enc.select("freq", F.explode("pieces").alias("symbol"))
        .groupBy("symbol")
        .agg(F.sum("freq").cast("long").alias("freq"))
    )


def bpe_encode_words(wf: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply learned merges to a (word, ...) table, adding ``pieces``
    (array<string>). Per-word iterative rank-walk in an Arrow-batched
    pandas UDF against a broadcast rank dict — runs once per DISTINCT
    word; join the result back to corpus rows for document-level use."""
    from pyspark.sql.types import ArrayType, StringType

    ranks = {pair: i for i, pair in enumerate(merges)}
    bmerges = {i: p[0] + p[1] for i, p in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def enc(words: pd.Series) -> pd.Series:
        out = []
        for w in words:
            syms = list(w) + [EOW]
            while len(syms) > 1:
                best, bi = None, -1
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best):
                        best, bi = r, i
                if best is None:
                    break
                syms[bi : bi + 2] = [bmerges[best]]
            out.append(syms)
        return pd.Series(out)

    return wf.withColumn("pieces", enc(F.col("word")))


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document subword token counts under a learned BPE: encode each
    DISTINCT word once, broadcast-free join back on the word, sum piece
    counts per doc. Output: id_col, n_words, n_pieces."""
    w = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col), distinct=False)).alias("word"),
    ).where(F.col("word") != "")
    pieces = bpe_encode_words(
        w.groupBy("word").agg(F.count(F.lit(1)).alias("_c")).drop("_c"), merges
    ).select("word", F.size("pieces").alias("n_p"))
    return (
        w.join(pieces, "word")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_p").cast("long").alias("n_pieces"),
        )
    )
