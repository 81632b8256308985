"""Deterministic text embeddings via feature hashing (the "hashing trick",
Weinberger et al., ICML 2009 — public): embedding[d] = signed count of
tokens hashing to bucket d. Integer-valued, scale-free (every consumer
here is cosine-based, and cosine is scale-invariant), engine-portable
(the repo's md5-prefix hash60), and entirely JVM-codegen — no UDF, no
shuffle, no ML runtime.

This is the baseline embedder that makes the full
chunk → embed → ANN-index pipeline RUNNABLE and oracle-testable in this
environment (a learned encoder would slot into the same array<float>
column contract); bag-of-hashed-words cosine is a real (if crude) lexical
similarity — near-dup texts embed near-identically, disjoint-vocabulary
texts embed near-orthogonally (pinned in tests/test_embed.py).

Reference analog: none (the reference has no vector layer) — engine
addition in the SURVEY §2 "LLM-data-pipeline" family, feeding
vec/similarity.py and vec/pq.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tmframe_spark.text.dedup import _portable_hash60, tokens


def hash_embed(
    df: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "embedding",
) -> DataFrame:
    """(id, embedding float[dim]) — embedding[d] = Σ sign(tok) over tokens
    with bucket(tok) == d, bucket = hash60(tok) % dim, sign = ±1 from
    hash60('s'‖US‖tok) parity (the ops/sample seed‖key convention). Values
    are integer-valued floats, so the exploded form carries a FULL DuckDB
    oracle (`hash_embed_dims` in the pytest mirror).

    Plan shape: one projection hashes every token ONCE into (bucket, sign)
    structs, materialized through a tiny round-robin exchange (the
    minhash_signatures CollapseProject guard — without it Catalyst inlines
    the hash work into all ``dim`` lambdas and recomputes it dim times),
    then one codegen projection folds the struct array into the dim-sized
    vector. O(tokens + dim·tokens integer compares) per doc, no shuffle of
    the text beyond the round-robin."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    ws = tokens(F.col(text_col), distinct=False)
    bs = F.transform(
        ws,
        lambda w: F.struct(
            F.pmod(_portable_hash60(w), F.lit(dim)).cast("int").alias("b"),
            (
                F.lit(1)
                - F.lit(2)
                * F.pmod(
                    _portable_hash60(F.concat_ws("\x1f", F.lit("s"), w)), F.lit(2)
                ).cast("int")
            ).alias("s"),
        ),
    )
    hashed = df.select(F.col(id_col), bs.alias("_bs")).repartition(
        int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    )
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.aggregate(
            F.col("_bs"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.when(x["b"] == d, x["s"].cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ).cast("float"),
    )
    return hashed.select(F.col(id_col), emb.alias(out_col))
