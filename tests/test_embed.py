"""hash_embed (vec/embed.py): determinism, lexical-similarity geometry,
the chunk → embed → ANN composition, and validation. The full DuckDB
oracle runs in the mirror (`hash_embed_dims`)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tmframe_spark.vec.embed import hash_embed


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
    (2, "completely disjoint vocabulary zeta eta theta iota kappa"),
    (3, ""),
]


def _emb_map(df):
    return {r["doc_id"]: np.array(r["embedding"], dtype=np.float64) for r in df.collect()}


def test_embeddings_deterministic_and_partitioning_invariant(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = _emb_map(hash_embed(df.repartition(1), dim=32))
    b = _emb_map(hash_embed(df.repartition(5), dim=32))
    assert set(a) == set(b) == {0, 1, 2, 3}
    for k in a:
        assert (a[k] == b[k]).all()
    # integer-valued floats; token count conservation: |sum of signs| <= n,
    # and the L1 mass never exceeds the token count
    n0 = len(DOCS[0][1].split())
    assert np.abs(a[0]).sum() <= n0 and (a[0] == a[0].round()).all()


def test_lexical_geometry(spark):
    # near-identical texts embed near-identically; disjoint vocabularies
    # are (near-)orthogonal relative to the near-dup pair
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    e = _emb_map(hash_embed(df, dim=64))

    def cos(x, y):
        return float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y)))

    assert cos(e[0], e[1]) > 0.8
    assert abs(cos(e[0], e[2])) < 0.5
    assert cos(e[0], e[1]) > cos(e[0], e[2]) + 0.3


def test_chunk_embed_ann_composition(spark, tmp_path):
    # the full pipeline: chunk long docs -> embed chunks -> persisted
    # IVF+PQ index -> serve; the query chunk's own text must be its top hit
    from tmframe_spark.text.analysis import chunk_documents
    from tmframe_spark.vec.pq import ivfpq_build_index, ivfpq_topk_from_index

    body = {
        0: " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(40)),
        1: " ".join(f"delta{i} epsilon{i} zeta{i}" for i in range(40)),
    }
    docs = spark.createDataFrame(list(body.items()), "doc_id long, text string")
    chunks = chunk_documents(docs, chunk_tokens=24, stride=24)
    emb = hash_embed(
        chunks.select(
            (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("vec_id"),
            F.col("chunk_text"),
        ),
        dim=32,
        id_col="vec_id",
        text_col="chunk_text",
    )
    n = emb.count()
    assert n == 10  # 2 docs x 120 tokens / 24
    path = str(tmp_path / "ivfpq")
    ivfpq_build_index(emb, path, nlist=2, m=4, ksub=8, iters=2,
                      id_col="vec_id", vec_col="embedding", store_vectors=True)
    qv = [float(x) for x in emb.where("vec_id = 1002").collect()[0]["embedding"]]
    top = ivfpq_topk_from_index(
        spark, path, qv, k=3, nprobe=2, refine=3, id_col="vec_id"
    ).collect()
    # the query vector itself is in the index -> cosine 1.0 at rank 1
    assert top[0]["vec_id"] == 1002 and top[0]["cosine"] > 0.999


def test_embed_validation(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="dim"):
        hash_embed(df, dim=0)
