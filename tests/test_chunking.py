"""chunk_documents (text/analysis.py): sliding-window chunking vs a
sequential reference, boundary/short-doc conventions, reconstruction
identity, and validation. The full DuckDB oracle runs in the mirror
(`doc_chunks`, queries.pytest_only_oracles)."""

import pytest
from pyspark.sql import functions as F

from tmframe_spark.text.analysis import chunk_documents


def _ref_chunks(text, chunk, stride):
    ws = text.strip().lower().split()
    ws = ws if ws != [] else [""]  # split('') convention on both engines
    n = len(ws)
    kmax = (max(n - chunk, 0) + stride - 1) // stride
    out = []
    for k in range(kmax + 1):
        s = k * stride
        toks = ws[s : s + chunk]
        out.append((k, s + 1, len(toks), " ".join(toks)))
    return out


DOCS = [
    (0, ""),  # empty -> one ['']-token chunk (the split('') convention)
    (1, "one"),
    (2, "exactly eight tokens in this doc right here"),
    (3, "exactly eight tokens in this doc right here plus"),  # chunk+1
    (4, " ".join(f"w{i}" for i in range(30))),
    (5, "  Mixed   CASE and   extra    whitespace   normalized  "),
]


def test_chunks_match_sequential_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_idx"]): (
            r["start_tok"], r["n_chunk_tokens"], r["chunk_text"]
        )
        for r in chunk_documents(df, chunk_tokens=8, stride=5).collect()
    }
    want = {}
    for did, text in DOCS:
        for k, start, nt, ct in _ref_chunks(text, 8, 5):
            want[(did, k)] = (start, nt, ct)
    assert got == want


def test_disjoint_stride_reconstructs_text(spark):
    # stride == chunk_tokens: chunks partition the token list, so joining
    # them in chunk order rebuilds the normalized text exactly
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    reb = (
        chunk_documents(df, chunk_tokens=7)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "chunk_text"))
                    ),
                    lambda s: s["chunk_text"],
                ),
                " ",
            ).alias("rebuilt")
        )
    )
    got = {r["doc_id"]: r["rebuilt"] for r in reb.collect()}
    for did, text in DOCS:
        ws = text.strip().lower().split()
        assert got[did] == " ".join(ws if ws else [""])


def test_short_doc_yields_single_whole_chunk(spark):
    df = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    rows = chunk_documents(df, chunk_tokens=256, stride=64).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["chunk_idx"], r["start_tok"], r["n_chunk_tokens"]) == (0, 1, 3)
    assert r["chunk_text"] == "a b c"


def test_chunking_partitioning_invariant(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(map(tuple, chunk_documents(df.repartition(1), 8, 5).collect()))
    b = sorted(map(tuple, chunk_documents(df.repartition(7), 8, 5).collect()))
    assert a == b


def test_chunking_validation(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, chunk_tokens=8, stride=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, chunk_tokens=8, stride=9)
