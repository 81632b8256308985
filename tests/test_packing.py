"""Deterministic sequence packing: budget invariants, partitioning
independence, batch-boundary state, and the single-threaded reference."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tmframe_spark.text.packing import bin_stats, pack_documents

BUDGET = 256


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()


def _assignments(df):
    return {
        r["doc_id"]: (r["shard"], r["bin"], r["n_tokens"]) for r in df.collect()
    }


def test_packing_invariants(docs, spark):
    packed = pack_documents(docs, BUDGET, n_shards=16, seed=3)
    got = _assignments(packed)
    assert len(got) == docs.count()  # every doc exactly once
    sums: dict = {}
    counts: dict = {}
    for _, (s, b, t) in got.items():
        sums[(s, b)] = sums.get((s, b), 0) + t
        counts[(s, b)] = counts.get((s, b), 0) + 1
    for k, tot in sums.items():
        assert tot <= BUDGET or counts[k] == 1, (k, tot, counts[k])
    # occupancy summary agrees
    st = {(r["shard"], r["bin"]): r["tokens"] for r in
          bin_stats(packed, BUDGET).collect()}
    assert st == sums
    # bins are dense per shard: 0..max with no holes
    per_shard: dict = {}
    for (s, b) in sums:
        per_shard.setdefault(s, set()).add(b)
    for s, bs in per_shard.items():
        assert bs == set(range(max(bs) + 1)), (s, sorted(bs))


def test_packing_partitioning_independent(docs):
    a = _assignments(pack_documents(docs, BUDGET, n_shards=16, seed=3))
    b = _assignments(
        pack_documents(docs.repartition(13), BUDGET, n_shards=16, seed=3)
    )
    assert a == b


def test_packing_matches_reference_greedy(docs, spark):
    from tmframe_spark.text.analysis import token_count

    # recompute the content-keyed order with the same expressions, then run
    # the reference greedy single-threaded
    keyed = docs.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("t"),
        F.pmod(F.xxhash64(F.lit(3), F.col("doc_id").cast("string")), F.lit(16))
        .cast("int").alias("s"),
        F.xxhash64(F.lit(4), F.col("doc_id").cast("string")).alias("h"),
    ).orderBy("s", "h", "doc_id").collect()
    ref = {}
    cur_s, cur_bin, fill = None, 0, 0
    for r in keyed:
        if r["s"] != cur_s:
            cur_s, cur_bin, fill = r["s"], 0, 0
        if fill > 0 and fill + r["t"] > BUDGET:
            cur_bin += 1
            fill = 0
        fill += r["t"]
        ref[r["doc_id"]] = (r["s"], cur_bin, r["t"])
    got = _assignments(pack_documents(docs, BUDGET, n_shards=16, seed=3))
    assert got == ref


def test_packing_state_survives_tiny_arrow_batches(docs, spark):
    # force 7-row Arrow batches so greedy state must carry across batch
    # boundaries inside a partition
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "7")
        tiny = _assignments(pack_documents(docs, BUDGET, n_shards=4, seed=3))
    finally:
        spark.conf.set(key, old)
    normal = _assignments(pack_documents(docs, BUDGET, n_shards=4, seed=3))
    assert tiny == normal


def test_packing_oversized_doc_gets_own_bin(spark):
    rows = [(0, "w " * 10), (1, "x " * 500), (2, "y " * 10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    packed = pack_documents(df, 64, n_shards=1)
    got = {r["doc_id"]: (r["bin"], r["n_tokens"]) for r in packed.collect()}
    big_bin = got[1][0]
    assert got[1][1] > 64  # oversized
    others = {b for i, (b, _) in got.items() if i != 1}
    assert big_bin not in others  # alone in its bin
    with pytest.raises(ValueError, match="max_tokens"):
        pack_documents(df, 0, n_shards=1)


def test_packing_null_text_counts_zero_tokens(spark):
    # review finding: a NULL text must count 0 tokens, not poison the
    # greedy accumulator with NaN (which would disable bin openings for
    # the rest of the shard)
    rows = [(0, "a b c"), (1, None), (2, "d e f g h")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n_tokens"] for r in
           pack_documents(df, 4, n_shards=1).collect()}
    assert got == {0: 3, 1: 0, 2: 5}
