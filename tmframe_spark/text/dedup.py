"""Near-duplicate detection for document corpora at 100 TB scale.

- exact_dedup: hash-groupBy first-occurrence (one shuffle).
- jaccard_pairs: EXACT token-set Jaccard over candidate pairs that share at
  least one token (the verification oracle; SQL-expressible).
- minhash_lsh_pairs: MinHash + banded LSH — the scale path. Shingle ->
  K min-hashes via K seeded xxhash64 (all JVM-side) -> B bands of R rows ->
  bucket-join on (band, band-signature) -> exact-verify candidates. Only
  near-duplicates ever meet in a shuffle; the full O(n^2) pair space is
  never materialized.
- simhash64: 64-bit SimHash over token hashes via bit-vote aggregation
  (JVM-side bit arithmetic; hamming-distance buckets give another
  near-dup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokens(col, distinct: bool = True):
    t = F.split(F.lower(F.trim(col)), r"\s+")
    return F.array_distinct(t) if distinct else t


def shingles(col, k: int = 3, distinct: bool = True):
    """k-word shingles (JVM-side transform over the token array).
    k>=3 is the discriminative choice for near-dup detection — unigram sets
    saturate on any corpus with a shared vocabulary.

    distinct=False skips array_distinct (O(n^2) string compares per doc) —
    safe wherever multiset semantics don't matter, e.g. MinHash (duplicate
    shingles cannot change a min)."""
    if k <= 1:
        return tokens(col, distinct)
    w = tokens(col, distinct=False)
    n = F.size(w)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i + 1, k)))
    return F.array_distinct(sh) if distinct else sh


def norm_text_md5(col):
    """md5 of whitespace-normalized lowercased text — the exact-dedup
    content key, shared by ``exact_dedup`` and the incremental index's
    exact table (text/incremental.py) so both agree on what "identical
    document" means."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Keep the lowest-id row per exact (normalized) text."""
    from pyspark.sql.window import Window

    norm = norm_text_md5(F.col(text_col))
    w = Window.partitionBy(norm).orderBy(F.col(id_col))
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str = "text", threshold: float = 0.5,
    shingle_k: int = 1, max_docs: int | None = 100_000,
) -> DataFrame:
    """Exact token-set Jaccard for every pair sharing >= 1 token.

    Output: id_a, id_b (a<b), jaccard. The intersection count comes from a
    self-join on exploded distinct tokens — O(hot-token-df^2), so this exact
    form is strictly the small-scale verification ORACLE for the LSH path.
    To keep a naive caller from launching it against a corpus, it refuses
    inputs beyond ``max_docs`` (one cheap count — negligible next to the
    quadratic join it prevents) and points at the scale paths:
    ``jaccard_pairs_capped`` (df-capped exact) / ``minhash_lsh_pairs``
    (banded LSH). Pass ``max_docs=None`` to force it anyway.
    """
    if max_docs is not None:
        n = df.count()
        if n > max_docs:
            raise ValueError(
                f"jaccard_pairs is the O(n^2) verification oracle; input has "
                f"{n} docs > max_docs={max_docs}. Use jaccard_pairs_capped "
                f"or minhash_lsh_pairs at scale (or pass max_docs=None)."
            )
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(F.col(text_col), shingle_k)).alias("w")
    )
    sizes = tok.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a, b = tok.alias("a"), tok.alias("b")
    inter = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
    j = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            # one IEEE division of exact integers — bit-identical across
            # engines/partitionings (no round(), which differs in tie mode)
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return j.select("id_a", "id_b", "jaccard")


def duplicate_span_stats(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    w: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplicated-span statistics — the detection half of
    exact-substring dedup (Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better") at fixed w-token span granularity:
    a span is DUPLICATED when its text occurs in >= ``min_docs`` distinct
    documents. Intra-document repetition alone does not mark a span (that
    signal is ``analysis.repetition_stats``); this op targets cross-corpus
    boilerplate (licenses, headers, templated text).

    Output: ``id_col``, ``n_spans`` (total span instances), ``n_dup_spans``
    (instances whose span is duplicated), ``dup_frac`` (one IEEE division
    of the exact integers — cross-engine identical). Docs shorter than
    ``w`` tokens contribute their whole token list as one span (the
    ``shingles`` short-doc rule, shared with the Jaccard/MinHash family).

    Scale shape (100 TB posture): spans are reduced to md5 hashes before
    any shuffle (16 bytes/span instead of w words); the (id, hash) partial
    aggregate collapses intra-doc repeats map-side; the span-document-count
    aggregate and the join back to per-doc rows share the hash key, so AQE
    plans one exchange for both; the final per-doc aggregate is keyed by
    id. No O(n^2) pair space exists anywhere — unlike Jaccard, duplicated
    spans only ever meet in a count, never a pairwise join.
    """
    # md5 applied inside the array transform (a generator like explode cannot
    # nest inside another expression), so only 16-byte hashes ever explode
    sp = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.transform(shingles(F.col(text_col), w, distinct=False), F.md5)
        ).alias("h"),
    )
    per = sp.groupBy("id", "h").agg(F.count(F.lit(1)).alias("c"))
    # distinct-doc count per span == row count of the (id, h) aggregate
    docs = per.groupBy("h").agg(F.count(F.lit(1)).alias("docs"))
    dup_c = F.when(F.col("docs") >= min_docs, F.col("c")).otherwise(F.lit(0))
    return (
        per.join(docs, "h")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.sum("c").cast("long").alias("n_spans"),
            F.sum(dup_c).cast("long").alias("n_dup_spans"),
        )
        .withColumn("dup_frac", F.col("n_dup_spans") / F.col("n_spans"))
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    w: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """The REMOVAL half of exact-substring dedup (Lee et al. 2021) at fixed
    w-token span granularity — the companion of ``duplicate_span_stats``.

    A span (w consecutive tokens; a whole short doc is one span) is
    DUPLICATED when its text occurs in >= ``min_docs`` distinct documents.
    One occurrence of each duplicated span survives — the CANONICAL
    instance: lowest doc id, then lowest position within that doc
    (min_by, deterministic). Every token covered by any NON-canonical
    duplicated-span instance is dropped; the cleaned text is the kept
    tokens of the normalized (lowercased, whitespace-split) stream joined
    with single spaces. Overlapping spans union their coverage, so a long
    duplicated region disappears wholesale outside its canonical doc —
    and inside it, a canonical occurrence survives only where no
    overlapping non-canonical instance covers it (token-level union
    semantics, documented contract).

    Output: one row per input doc — ``id_col``, ``clean_text``,
    ``n_tokens`` (normalized token count), ``n_removed``. Fully-boilerplate
    docs come back with ``clean_text = ''``.

    Scale shape (100 TB posture): spans shuffle as 16-byte md5 hashes
    keyed by hash (the per-(h, id) partial agg collapses intra-doc repeats
    map-side); the coverage explode is bounded by w * tokens; removed
    positions and the rebuild are keyed by doc id. No pairwise space
    exists — duplicated spans only ever meet in counts and min_by, never
    a join of doc pairs.
    """
    ws = tokens(F.col(text_col), distinct=False)
    tk = df.select(F.col(id_col).alias("id"), ws.alias("ws"), F.size(ws).alias("n"))
    # hash every span inside one array transform (the duplicate_span_stats
    # pattern: only 16-byte hashes ever explode, the token array does not
    # ride through the generator), then posexplode for 1-based positions
    spans = F.transform(
        F.sequence(F.lit(1), F.greatest(F.col("n") - (w - 1), F.lit(1))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("ws"), i, w))),
    )
    sp = tk.select("id", "n", F.posexplode(spans).alias("pos0", "h")).select(
        "id", "n", (F.col("pos0") + 1).alias("pos"), "h"
    )
    pi = sp.groupBy("h", "id").agg(F.min("pos").alias("minpos"))
    hi = pi.groupBy("h").agg(
        F.count(F.lit(1)).alias("docs"),
        F.min("id").alias("canon_id"),
        F.expr("min_by(minpos, id)").alias("canon_pos"),
    )
    dup = hi.where(F.col("docs") >= min_docs)
    # non-canonical duplicated instances -> the token positions they cover
    rm = (
        sp.join(dup, "h")
        .where(~((F.col("id") == F.col("canon_id")) & (F.col("pos") == F.col("canon_pos"))))
        .select(
            "id",
            F.explode(
                F.sequence(F.col("pos"), F.least(F.col("pos") + (w - 1), F.col("n")))
            ).alias("p"),
        )
        .distinct()
    )
    tok = tk.select(
        "id", F.posexplode("ws").alias("p0", "tok")
    ).select("id", (F.col("p0") + 1).alias("p"), "tok")
    kept = tok.join(rm, ["id", "p"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tok"))), lambda x: x["tok"]
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        tk.select("id", "n")
        .join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.col("n").cast("long").alias("n_tokens"),
            (F.col("n") - F.coalesce("n_kept", F.lit(0))).cast("long").alias("n_removed"),
        )
    )


def estimate_capped_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_k: int = 1,
    max_df: int = 100,
) -> DataFrame:
    """Cheap pre-check for the ``jaccard_pairs`` vs ``jaccard_pairs_capped``
    decision (round-4 verdict #6): ONE aggregation pass, no joins — orders
    of magnitude cheaper than either pairs query. Returns a 1-row DataFrame
    ``(capped_tokens, total_tokens, max_observed_df)``.

    - ``capped_tokens == 0``: the df-cap would exclude nothing — the capped
      form's extra distinct + semi-join re-verify is pure overhead
      (measured 2.3x slower on the clean driver corpus, BENCH.md round-4);
      use ``jaccard_pairs``.
    - ``capped_tokens > 0``: the plain self-join does O(max_observed_df^2)
      work on each hot token; use ``jaccard_pairs_capped``, which pays the
      re-verify only on surviving candidates.
    """
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), shingle_k)).alias("w"),
    )
    dfreq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    # coalesce: an empty/all-null corpus must report zeros, not NULLs a
    # caller's int() would choke on (round-5 review finding)
    return dfreq.agg(
        F.coalesce(F.sum((F.col("df") > max_df).cast("long")), F.lit(0)).alias(
            "capped_tokens"
        ),
        F.count(F.lit(1)).alias("total_tokens"),
        F.coalesce(F.max("df"), F.lit(0)).alias("max_observed_df"),
    )


def jaccard_pairs_capped(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    threshold: float = 0.5,
    shingle_k: int = 1,
    max_df: int = 100,
):
    """Scale-safe exact Jaccard: document-frequency-capped candidate
    generation + exact re-verification.

    The plain ``jaccard_pairs`` self-join is quadratic in the hottest
    token's document frequency — one stop word makes it O(n^2) at corpus
    scale. Here tokens with df > ``max_df`` are EXCLUDED from candidate
    generation only; every surviving candidate pair is then re-verified
    with its FULL token sets (semi-joined down to candidate ids first), so
    reported jaccard values are exact — the cap can only lose pairs whose
    every shared token is ultra-common (recall asserted in tests).

    When to use which (BENCH.md round-4 measured the crossover; run
    ``estimate_capped_tokens`` first — one agg pass — when unsure):

    ==================== =========================== =====================
    corpus shape          estimate says               use
    ==================== =========================== =====================
    clean / deduped       capped_tokens == 0          jaccard_pairs
                                                      (cap = pure 2.3x
                                                      overhead, 0 benefit)
    natural text with     capped_tokens > 0           jaccard_pairs_capped
    stop words / boiler-  (each hot token costs the   (re-verify only on
    plate                 plain join max_df^2 rows)   candidates)
    corpus-scale, recall  —                           minhash_lsh_pairs
    bounded OK                                        (banded LSH)
    ==================== =========================== =====================

    No silent truncation: returns ``(pairs, stats)`` where ``stats`` is a
    1-row DataFrame (capped_tokens, total_tokens) quantifying the cap.
    """
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), shingle_k)).alias("w"),
    )
    dfreq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    stats = dfreq.agg(
        F.sum((F.col("df") > max_df).cast("long")).alias("capped_tokens"),
        F.count(F.lit(1)).alias("total_tokens"),
    )
    rare = dfreq.where(F.col("df") <= max_df).select("w")
    tok_gen = tok.join(rare, "w")  # candidate generation only
    a, b = tok_gen.alias("a"), tok_gen.alias("b")
    cand = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # exact re-verify over full token sets, restricted to candidate ids
    sizes = tok.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    ta = tok.select(F.col("id").alias("id_a"), "w")
    tb = tok.select(F.col("id").alias("id_b"), "w")
    inter = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "w"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
    pairs = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return pairs, stats


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 64,
    shingle_k: int = 3,
    pre_repartition: bool = True,
) -> DataFrame:
    """K-permutation MinHash signature per doc, entirely JVM-side.

    Shape matters twice here:
    1. each shingle string is hashed ONCE (xxhash64); the K permutations
       derive from that 8-byte value (xxhash64(h, i) — keyed rehash of a
       long, far cheaper than K string hashes);
    2. the hashed-shingle array is materialized through a (tiny: one row
       per doc, longs only) round-robin exchange before the K-permutation
       projection — otherwise Catalyst's CollapseProject inlines the
       shingle-construction expression into all K lambdas and recomputes
       the string work K times (measured 20x slower).
    No explode: the whole signature is one codegen projection per doc row.
    """
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_mh_text"))
    if pre_repartition:
        # the shingle-hash projection runs at SCAN parallelism; a corpus
        # that arrives as few/small files (this sandbox's testdata) would
        # hash single-threaded. At warehouse scale the parquet layout
        # already yields parallel scans — pass pre_repartition=False there
        # to avoid shuffling the raw text a second time.
        src = src.repartition(n_part, F.col("id"))
    hs = F.transform(
        shingles(F.col("_mh_text"), shingle_k, distinct=False), lambda s: F.xxhash64(s)
    )
    # explicit partition count on the exchange: the K-permutation projection
    # downstream is heavy CPU over tiny bytes, exactly the shape AQE's
    # byte-based coalescing serializes to one task (measured 6.4s -> 0.5s
    # at sf0.1 on 32 cores). The exchange carries hashed shingles (8B each),
    # never the raw text.
    hashed = src.select("id", hs.alias("hs")).repartition(n_part, F.col("id"))
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(F.transform(F.col("hs"), lambda h: F.xxhash64(h, i))),
    )
    return hashed.select("id", sig.alias("sig"))


def band_buckets(sig_col, bands: int, r: int):
    """Per-band bucket hash array over a MinHash signature column: band b's
    bucket = xxhash64 of its r signature slots, comma-joined. Shared by
    ``minhash_lsh_pairs`` and the persisted incremental index
    (text/incremental.py) so inline and index-probed candidate sets are
    identical by construction."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(
            F.concat_ws(
                ",",
                F.transform(F.slice(sig_col, b * r + 1, r), lambda x: x.cast("string")),
            )
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    shingle_k: int = 3,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Banded-LSH candidate generation + exact MinHash-estimate filter.

    bands of r = k/bands rows: a pair becomes a candidate iff some band's
    signature slice matches exactly (bucket join on the band hash — the only
    shuffle is by bucket, never all-pairs). Output: id_a, id_b,
    est_jaccard (= matching minhash fraction).

    ``sigs``: optionally a precomputed (already materialized)
    ``minhash_signatures(df, id_col, text_col, k, shingle_k)`` frame for
    EXACTLY ``df``'s rows — signatures are deterministic, so passing them
    is bit-identical to recomputing (the ingest probe->append reuse path,
    text/incremental.py).
    """
    r = k // bands
    # eager localCheckpoint, not persist(): the signature projection sits
    # AFTER its exchange, so plain exchange-reuse would still recompute the
    # K permutations once per consumer (band explode + both est re-joins —
    # measured 4x the work in the physical plan). Checkpointing computes it
    # exactly once at the pinned parallelism; blocks are released by the
    # ContextCleaner when this DataFrame is GC'd — nothing leaks across
    # calls (the r1 persist() never unpersisted).
    if sigs is None:
        sigs = minhash_signatures(df, id_col, text_col, k, shingle_k).localCheckpoint(
            eager=True
        )
    band_rows = sigs.select(
        "id",
        F.posexplode(band_buckets(F.col("sig"), bands, r)).alias("band", "bucket"),
    )
    a, b = band_rows.alias("a"), band_rows.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        # same shuffle a distinct() would cost, but the band-match count
        # comes out free (useful skew/recall observability at scale)
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )
    sa = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
        )
    ) / F.lit(float(k))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", F.round(est, 6))
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


#: Spark-side portable 60-bit token hash: first 15 hex chars of md5 as an
#: int64 — bit-identical to DuckDB's CAST('0x' || substr(md5(w),1,15) AS
#: BIGINT), so simhash is verifiable across engines. 60 bits keeps the value
#: non-negative in a signed int64 on both sides.
def _portable_hash60(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


SIMHASH_BITS = 60


def simhash64(
    df: DataFrame, id_col: str, text_col: str = "text", portable: bool = True
) -> DataFrame:
    """SimHash: per-bit majority vote over token hashes (bits 0..59).

    All JVM-side: explode tokens -> for each bit, sum(+-1 by bit value) ->
    reassemble the sign vector into an int64. ``portable=True`` (default)
    hashes tokens with the md5-prefix hash so a DuckDB oracle can restate
    the whole function; ``portable=False`` uses xxhash64 (cheaper, same
    hamming-distance properties) for hot paths that don't need the oracle.
    """
    h = _portable_hash60(F.col("w")) if portable else F.xxhash64("w")
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("w")
    ).withColumn("h", h)
    g = tok.groupBy("id").agg(F.collect_list("h").alias("hs"))
    # one higher-order expression (bit index is a lambda variable) instead of
    # 60 unrolled aggregates — same codegen-size concern as minhash
    sim = F.expr(
        f"aggregate(sequence(0, {SIMHASH_BITS - 1}), 0L, (acc, i) -> acc | "
        "  IF(aggregate(hs, 0L, (a, h) -> a + IF((shiftright(h, i) & 1) = 1, 1L, -1L)) > 0, "
        "     shiftleft(1L, i), 0L))"
    )
    return g.select("id", sim.alias("simhash"))


def _undirected(edges: DataFrame) -> DataFrame:
    """Canonicalize an edge set: (min, max) per pair, self-loops dropped,
    distinct."""
    return (
        edges.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _sym(edges: DataFrame) -> DataFrame:
    """Both directions of a canonical edge set."""
    return edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 20,
) -> DataFrame:
    """Connected components over a near-duplicate PAIR set: one
    ``(id, cluster_id)`` row per node appearing in any pair, with
    ``cluster_id`` = the component's minimum id (the canonical member).

    This is the missing step between pair generation (``jaccard_pairs`` /
    ``minhash_lsh_pairs`` / ``embedding_near_dup_*`` — all emit pairs) and
    actually DEDUPING a corpus: near-duplication is not transitive, so
    per-pair decisions both over- and under-delete; standard practice keeps
    exactly one canonical document per connected component
    (``dedup_keep_canonical``).

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014 — public
    knowledge), which converges in O(log n) rounds on any graph — no
    reliance on near-dup components having small diameter. Each half-round
    is a per-node min (``groupBy(u).min`` — map-side combinable) plus one
    join back to the edges (AQE skew-join handles a hot star center); no
    ``collect_list`` neighborhoods, so a node of ANY degree never
    materializes in one task, and no driver-side graph state — the driver
    sees only a per-round convergence signature (count + hash sum). Edges
    are eagerly localCheckpoint'd per round to truncate the iterative
    join lineage (the repo rule for iterative plans).

    Raises RuntimeError if ``max_rounds`` alternations do not converge
    (loud, never a silent partial clustering). Works for any orderable id
    type (long ids, string ids).
    """
    edges = _undirected(
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    ).localCheckpoint(eager=True)

    def star(edges_canon: DataFrame, large: bool) -> DataFrame:
        es = _sym(edges_canon)
        mins = (
            es.groupBy("u")
            .agg(F.min("v").alias("_mv"))
            .select("u", F.least("u", "_mv").alias("m"))
        )
        j = es.join(mins, "u")
        if large:
            out = j.where(F.col("v") > F.col("u")).select(
                F.col("v").alias("u"), F.col("m").alias("v")
            )
        else:
            out = j.where(F.col("v") < F.col("u")).select(
                F.col("v").alias("u"), F.col("m").alias("v")
            ).unionByName(mins.select(F.col("u"), F.col("m").alias("v")))
        return _undirected(out)

    def signature(e: DataFrame):
        # bit_xor: order-independent and overflow-free under ANSI mode
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"])

    sig = signature(edges)
    for _ in range(max_rounds):
        edges = star(star(edges, large=True), large=False).localCheckpoint(
            eager=True
        )
        new_sig = signature(edges)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_rounds} rounds "
            f"(edge signature still moving: {sig} -> {new_sig})"
        )
    # at convergence every component is a star rooted at its minimum:
    # label(u) = min(u, min neighbor)
    return (
        _sym(edges)
        .groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select(F.col("u").alias("id"), F.least("u", "_mv").alias("cluster_id"))
    )


def dedup_keep_canonical(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    id_a: str = "id_a", id_b: str = "id_b",
) -> DataFrame:
    """Corpus-level near-dup dedup: keep only the canonical (minimum-id)
    member of each connected component of ``pairs``; documents in no pair
    survive untouched. One anti-join against the (small — only clustered
    ids) loser set."""
    losers = (
        dedup_clusters(pairs, id_a, id_b)
        .where(F.col("id") != F.col("cluster_id"))
        .select(F.col("id").alias(id_col))
    )
    return docs.join(losers, id_col, "left_anti")
