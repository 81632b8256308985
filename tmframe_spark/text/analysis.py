"""Text analysis for training-data pipelines: tokens, quality, lang-id,
fingerprints. All JVM-side built-ins (whole-stage codegen) — no Python UDFs
in any of these hot paths.

Every function here is oracle-exact: the registry queries `token_stats_by_lang`,
`doc_quality`, `lang_id`, `bpe_token_count`, `doc_fingerprint` route through
these and hash-match an independent DuckDB restatement, so the math is pinned
to constructs both engines evaluate identically (code-point regex counts,
token-array filters, single IEEE divisions of exact ints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword markers for the lexicon heuristic; dict order
#: is the deterministic tie priority (first listed wins ties).
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "la", "et"],
    "es": ["el", "los", "que"],
}

#: stopwords for the quality pre-filter stats
STOPWORDS = ("the", "a", "and", "of")


def _words(col) -> "F.Column":
    """Lowercased whitespace token array (empty-string element for blank
    text — callers that need a count use token_count, which guards that)."""
    return F.split(F.lower(F.trim(col)), r"\s+")


def token_count(col) -> "F.Column":
    """Whitespace tokenization count, codegen-friendly:
    0 for blank text, else #whitespace-runs + 1."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_ish_token_count(col) -> "F.Column":
    """A BPE-ish proxy: word runs and punctuation count as separate tokens.

    count = #(\\w+ runs) + #([^\\w\\s] chars) — provably identical to
    splitting on whitespace plus a boundary before/after every punctuation
    char (the lookaround form), but expressible without lookarounds so an
    RE2-based engine (DuckDB) can restate it for the oracle. Still pure
    JVM-side regex. Both terms are regexp_extract_all MATCH COUNTS (one per
    code point), never length() — Spark length() counts UTF-16 code units,
    so an astral-plane punctuation char (emoji) would count 2 in Spark vs 1
    in DuckDB and silently break the cross-engine oracle."""
    t = F.trim(col)
    words = F.size(F.regexp_extract_all(t, F.lit(r"\w+"), F.lit(0)))
    punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), F.lit(0)))
    return words + punct


def stopword_hits(col, stopwords: tuple[str, ...] = STOPWORDS) -> "F.Column":
    """Count of stopword TOKENS (exact token membership over the whitespace
    split — not substring counting, which would over-count e.g. 'them')."""
    return F.size(F.filter(_words(col), lambda w: w.isin(*stopwords)))


def with_text_stats(
    df: DataFrame, col: str = "text", stopwords: tuple[str, ...] = STOPWORDS
) -> DataFrame:
    """Adds n_tokens, n_chars, punct_chars, stopword_hits, stop_ratio,
    quality_score. All but quality_score are oracle-exact (ints / one IEEE
    division of exact ints); quality_score is a float composite for ranking
    only (never hash-compared)."""
    c = F.col(col)
    punct = F.size(F.regexp_extract_all(F.trim(c), F.lit(r"[^\w\s]"), F.lit(0)))
    stop = stopword_hits(c, stopwords)
    n_tok = token_count(c)
    # quality: bounded composite of length, punctuation restraint, stopword
    # presence — the classic cheap pre-filter for web-scale corpora
    quality = F.round(
        F.least(F.lit(1.0), n_tok / F.lit(64.0)) * 0.5
        + F.when(n_tok > 0, F.least(F.lit(1.0), stop * F.lit(8.0) / n_tok) * 0.3).otherwise(0.0)
        + F.when(F.length(c) > 0, (F.lit(1.0) - F.least(F.lit(1.0), punct * F.lit(4.0) / F.length(c))) * 0.2).otherwise(0.0),
        6,
    )
    return (
        df.withColumn("n_tokens", n_tok.cast("long"))
        .withColumn("n_chars_calc", F.length(c).cast("long"))
        .withColumn("punct_chars", punct.cast("long"))
        .withColumn("stopword_hits", stop.cast("long"))
        .withColumn("stop_ratio", F.col("stopword_hits") / F.col("n_tokens"))
        .withColumn("quality_score", quality)
    )


def lang_id(df: DataFrame, col: str = "text", out: str = "pred_lang") -> DataFrame:
    """Marker-lexicon language ID: count per-language stopword-token hits,
    argmax with deterministic tie order = LANG_MARKERS listing order
    (en > de > fr > es), 'und' when no marker hits at all.

    Forward iteration with strict > keeps the FIRST-listed language on ties
    (an incumbent is only displaced by a strictly higher score)."""
    words = _words(F.col(col))
    best = F.lit("und")
    best_score = F.lit(0)
    for lang, markers in LANG_MARKERS.items():
        s = F.size(F.filter(words, lambda w: w.isin(*markers)))
        best = F.when(s > best_score, F.lit(lang)).otherwise(best)
        best_score = F.greatest(s, best_score)
    return df.withColumn(out, best)


def fingerprint(df: DataFrame, col: str = "text", out: str = "fingerprint") -> DataFrame:
    """Document fingerprint: md5 of the normalized text (lowercased,
    whitespace-collapsed). A content-identity key for exact dedup that is
    robust to whitespace/case jitter."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")
    return df.withColumn(out, F.md5(norm))


def rolling_fingerprints(df: DataFrame, col: str = "text", k: int = 5) -> DataFrame:
    """Winnowing-style shingle fingerprints: xxhash64 of each k-word shingle
    (JVM-side: split -> transform over index range -> concat_ws -> xxhash64).
    Explodes to one row per shingle."""
    words = F.split(F.lower(F.trim(F.col(col))), r"\s+")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingles = F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, k)))
    )
    return df.withColumn("shingle_hash", F.explode(shingles))


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """Gopher-style repetition signals (the MassiveText/Gopher quality
    filter family — public practice): for each n in ``ns``, the fraction
    of ALL n-grams taken by the single most frequent n-gram
    (``top{n}_frac``, with ``top{n}_count`` / ``total_{n}grams``). High
    values flag degenerate, repetitive text that the length/punct stats
    miss entirely.

    Exact arithmetic: integer counts + one IEEE division each, so the
    registry query hash-matches a DuckDB restatement. Shingles are the
    MULTISET form (``shingles(..., distinct=False)``) — repetition is
    precisely what distinct would erase. Per-doc group sizes are bounded
    by document length, so the groupBy is data-sized and skew-free.
    """
    from tmframe_spark.text.dedup import shingles

    out = None
    for n in ns:
        tok = df.select(
            F.col(id_col).alias("id"),
            F.explode(shingles(F.col(text_col), n, distinct=False)).alias("w"),
        )
        st = (
            tok.groupBy("id", "w")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("id")
            .agg(F.max("c").alias("top"), F.sum("c").alias("total"))
            .select(
                F.col("id").alias(id_col),
                F.col("top").alias(f"top{n}_count"),
                F.col("total").alias(f"total_{n}grams"),
                (F.col("top") / F.col("total")).alias(f"top{n}_frac"),
            )
        )
        # join the per-n stats frames directly (one row per id each) — a
        # df.select(id) base would add a scan + join and silently assume
        # id uniqueness (round-5 review finding)
        out = st if out is None else out.join(st, id_col)
    return out


def shingle_idf_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Corpus-rarity (IDF-weighted) novelty score per document — the
    rarity-magnitude companion of the binary duplicated-span signal
    (dedup.duplicate_span_stats): every k-word shingle instance is
    weighted by floor(log2 N) - floor(log2 df) where df is the shingle's
    distinct-document frequency and N the corpus size. High mean weight =
    mostly corpus-unique phrasing (novel or gibberish); low = boilerplate
    assembled from common phrases. The C4/MassiveText-style heuristic
    family, in a cross-engine-exact integer form.

    Integer exactness: floor(log2 x) is computed as length(bin(x)) - 1 —
    pure string length of the binary rendering, identical in Spark and
    DuckDB (no float log anywhere); ``mean_idf`` is the single IEEE
    division of the two exact integers.

    Scale shape: identical to duplicate_span_stats — shingles shuffle as
    md5 hashes, the (id, hash) partial agg collapses repeats map-side,
    df-counts and the join back share the hash key, the final agg is
    id-keyed, and the corpus size joins in as a broadcast single row.
    """
    from tmframe_spark.text.dedup import shingles

    sp = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.transform(shingles(F.col(text_col), k, distinct=False), F.md5)
        ).alias("h"),
    )
    per = sp.groupBy("id", "h").agg(F.count(F.lit(1)).alias("c"))
    dfreq = per.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).alias("n"))
    w = F.length(F.expr("bin(n)")) - F.length(F.expr("bin(df)"))
    return (
        per.join(dfreq, "h")
        .crossJoin(F.broadcast(n))
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.sum("c").cast("long").alias("n_shingles"),
            F.sum(F.col("c") * w).cast("long").alias("idf_sum"),
        )
        .withColumn("mean_idf", F.col("idf_sum") / F.col("n_shingles"))
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 256,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic sliding-window document chunking — the
    embedding-pipeline primitive that turns long documents into
    fixed-budget overlapping windows (RAG / embedding-table prep; the
    text-domain analog of the tier system's fixed-step buckets).

    Whitespace tokens (the repo's ``_words`` normalization: lower + trim +
    ``\\s+`` split); chunk k covers tokens ``[1 + k*stride, ... + chunk_tokens)``
    (1-based slice) for k = 0 .. ceil(max(n - chunk_tokens, 0) / stride) —
    the final chunk may be shorter (the tail), a doc with
    n <= chunk_tokens yields exactly one chunk (its whole token list: the
    shingle-family short-doc convention), overlap = chunk_tokens - stride.
    ``stride`` defaults to ``chunk_tokens`` (disjoint windows).

    Output: (id, chunk_idx, start_tok [1-based], n_chunk_tokens,
    chunk_text). Pure codegen — split / sequence / transform / slice /
    array_join, no shuffle, no UDF; chunk identity is a pure function of
    the text, so the output is partitioning- and engine-independent (FULL
    DuckDB oracle in the pytest mirror, ``doc_chunks``)."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    stride = chunk_tokens if stride is None else stride
    if not 1 <= stride <= chunk_tokens:
        raise ValueError(
            f"stride must be in [1, chunk_tokens={chunk_tokens}], got {stride}"
        )
    ws = _words(F.col(text_col))
    n = F.size(ws)
    # number of windows - 1: ceil(max(n - chunk, 0) / stride) as exact ints
    kmax = F.floor(
        (F.greatest(n - F.lit(chunk_tokens), F.lit(0)) + F.lit(stride - 1))
        / F.lit(stride)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), kmax),
        lambda k: F.struct(
            k.alias("chunk_idx"),
            (k * stride + 1).alias("start_tok"),
            F.slice(ws, k * stride + 1, chunk_tokens).alias("toks"),
        ),
    )
    return df.select(
        F.col(id_col), F.explode(chunks).alias("c")
    ).select(
        id_col,
        F.col("c.chunk_idx").cast("long").alias("chunk_idx"),
        F.col("c.start_tok").cast("long").alias("start_tok"),
        F.size("c.toks").cast("long").alias("n_chunk_tokens"),
        F.array_join("c.toks", " ").alias("chunk_text"),
    )
