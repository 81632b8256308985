"""SemDeDup (vec/semdedup.py): planted near-duplicates are pruned to the
lowest-id canonical, the in-cell pair set matches a sequential numpy
reference bit-for-bit, the O(cell^2) cap fails loudly, empties degrade."""

import numpy as np
import pytest

from tmframe_spark.vec.semdedup import semantic_dedup, semantic_pairs
from tmframe_spark.vec.similarity import ivf_train

_Q = 1 << 20


def _corpus(spark, n=60, dim=16, planted=(0, 5, 10)):
    """Deterministic random float32 corpus + near-copies of ``planted`` ids
    at id+1000 with ONE coordinate nudged by 2^-10 (grid-exact in float32
    and the fixed-point space) — cosine vs the original ~0.9999."""
    rng = np.random.default_rng(42)
    X = rng.normal(size=(n, dim)).astype(np.float32)
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    for i in planted:
        v = X[i].copy()
        v[0] += np.float32(1.0 / 1024.0)
        rows.append((i + 1000, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_prunes_planted_copies(spark):
    df = _corpus(spark)
    kept = semantic_dedup(df, nlist=4, iters=2, threshold=0.99)
    ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    assert ids == set(range(60))  # copies dropped, originals (lower id) kept


def test_semantic_pairs_match_numpy_reference(spark):
    """Same centroids in both paths; the reference recomputes assignment
    (argmin squared L2, ties to the lowest cell) and the exact fixed-point
    cosine in numpy — pair sets AND cosines must match bit-for-bit."""
    df = _corpus(spark)
    cents = ivf_train(df, nlist=4, iters=2)
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in semantic_pairs(df, centroids=cents, threshold=0.9).collect()
    }

    rows = df.collect()
    ids = [r["vec_id"] for r in rows]
    X = np.array([[float(x) for x in r["embedding"]] for r in rows], dtype=np.float64)
    C = np.asarray(cents, dtype=np.float64)
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    cell = np.argmin(d2, axis=1)
    Qm = np.floor(X * _Q).astype(np.int64)
    n2 = (Qm * Qm).sum(axis=1)
    ref = {}
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and cell[i] == cell[j]:
                cos = float((Qm[i] * Qm[j]).sum()) / np.sqrt(
                    float(n2[i]) * float(n2[j])
                )
                if cos >= 0.9:
                    ref[(ids[i], ids[j])] = cos
    assert got == ref and len(ref) > 0


def test_semantic_pairs_cell_cap_raises(spark):
    df = _corpus(spark)
    with pytest.raises(ValueError, match="cell_rows_cap"):
        semantic_pairs(df, nlist=1, iters=1, cell_rows_cap=10).collect()


def test_semantic_dedup_on_driver_corpus(spark):
    """Driver-corpus pin (the registry entry's exact call): over the planted
    _emb_planted corpus every ×1.25 copy (vec_id >= 1_000_000, cosine ≈
    0.994 to its original) lands in its original's IVF cell and is pruned,
    and every original survives — the non-vacuity check the prior session
    measured at sf0.001 AND sf0.01 (all 20 planted copies dropped)."""
    from tests.conftest import SF_DIR
    from tmframe_spark.queries import q_semantic_dedup, register_tables

    register_tables(spark, SF_DIR)
    planted_total = (
        spark.table("embeddings").where("vec_id % 25 = 0").count()
    )
    kept = {r["vec_id"] for r in q_semantic_dedup(spark, SF_DIR).collect()}
    originals = {
        r["vec_id"] for r in spark.table("embeddings").select("vec_id").collect()
    }
    assert planted_total >= 10
    assert originals <= kept  # every original (lowest-id member) survives
    assert not {v for v in kept if v >= 1_000_000}  # every planted copy pruned


def test_semantic_dedup_empty_input(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert semantic_pairs(empty).count() == 0
    assert semantic_dedup(empty).count() == 0
