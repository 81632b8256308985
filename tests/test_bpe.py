"""Distributed BPE trainer/encoder (text/bpe.py) vs a single-threaded
classic reference (Sennrich et al. merge loop): merges bit-equal,
encodings equal the reference's final symbol tables, round-trip identity,
and the vocabulary-sized scale shape."""

import re

import pytest

from tmframe_spark.text.bpe import (
    EOW,
    bpe_encode_words,
    bpe_token_counts,
    bpe_train,
    bpe_vocab,
    word_freqs,
)


def _ref_word_freqs(texts):
    wf: dict[str, int] = {}
    for t in texts:
        for w in re.split(r"\s+", t.strip().lower()):
            if w:
                wf[w] = wf.get(w, 0) + 1
    return wf


def _ref_bpe(word_freq: dict[str, int], num_merges: int, min_freq: int = 2):
    """Classic sequential BPE: freq-weighted pair counts over the distinct
    word table, argmax with (count desc, pair asc) tie-break, leftmost-
    greedy merge pass."""
    wf = {tuple(list(w) + [EOW]): f for w, f in word_freq.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, f in wf.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        mx = max(pairs.values())
        if mx < min_freq:
            break
        a, b = min(p for p, c in pairs.items() if c == mx)
        merges.append((a, b))
        new_wf: dict[tuple, int] = {}
        for syms, f in wf.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            key = tuple(out)
            new_wf[key] = new_wf.get(key, 0) + f
        wf = new_wf
    return merges, wf


TEXTS = [
    "low lower lowest newer newest wider wide widest",
    "low low low lower newer newer the the the the",
    "new new newer news newest lowest slow slower",
    "the quick brown fox the lazy dog the end",
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_word_freqs_match_reference(corpus):
    got = {r["word"]: r["freq"] for r in word_freqs(corpus).collect()}
    assert got == _ref_word_freqs(TEXTS)


def test_merges_bit_equal_to_reference(corpus):
    merges = bpe_train(corpus, num_merges=12)
    ref, _ = _ref_bpe(_ref_word_freqs(TEXTS), 12)
    assert merges == ref
    assert len(merges) > 4  # the corpus genuinely supports merges


def test_encoding_equals_reference_final_symbols(corpus, spark):
    merges = bpe_train(corpus, num_merges=10)
    _, ref_wf = _ref_bpe(_ref_word_freqs(TEXTS), 10)
    ref_syms = {"".join(s).removesuffix(EOW): list(s) for s in ref_wf}
    enc = bpe_encode_words(word_freqs(corpus), merges).collect()
    for r in enc:
        assert r["pieces"] == ref_syms[r["word"]], r["word"]
        # round-trip identity: concatenation restores word + EOW
        assert "".join(r["pieces"]) == r["word"] + EOW


def test_early_stop_on_min_freq(spark):
    # every word unique, all pair counts 1 -> no merges at min_freq=2
    df = spark.createDataFrame([(0, "abc defg hij")], "doc_id long, text string")
    assert bpe_train(df, num_merges=5, min_freq=2) == []
    # min_freq=1 merges greedily and terminates by merge budget
    assert len(bpe_train(df, num_merges=3, min_freq=1)) == 3


def test_token_counts_consistent(corpus):
    merges = bpe_train(corpus, num_merges=8)
    got = {r["doc_id"]: (r["n_words"], r["n_pieces"]) for r in
           bpe_token_counts(corpus, merges).collect()}
    _, ref_wf = _ref_bpe(_ref_word_freqs(TEXTS), 8)
    piece_len = {"".join(s).removesuffix(EOW): len(s) for s in ref_wf}
    for i, t in enumerate(TEXTS):
        ws = [w for w in re.split(r"\s+", t.strip().lower()) if w]
        assert got[i] == (len(ws), sum(piece_len[w] for w in ws))
    # merges compress: pieces < naive chars+EOW everywhere
    naive = {i: sum(len(w) + 1 for w in re.split(r"\s+", t.strip().lower()) if w)
             for i, t in enumerate(TEXTS)}
    assert all(got[i][1] < naive[i] for i in got)


def test_vocab_frequencies(corpus):
    merges = bpe_train(corpus, num_merges=8)
    voc = {r["symbol"]: r["freq"] for r in bpe_vocab(corpus, merges).collect()}
    wfr = _ref_word_freqs(TEXTS)
    _, ref_wf = _ref_bpe(wfr, 8)
    expect: dict[str, int] = {}
    for syms, f in ref_wf.items():
        for s in syms:
            expect[s] = expect.get(s, 0) + f
    assert voc == expect


def test_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert bpe_train(df, num_merges=4) == []
    assert bpe_token_counts(df, [("a", "b")]).count() == 0


def test_registry_query_matches_reference_on_driver_corpus(spark):
    """The registry's bpe_subword_stats rows, recomputed by the classic
    sequential reference over the same corpus — full bit-equality for the
    rows-only driver entry."""
    from tests.conftest import SF_DIR
    from tmframe_spark import queries as Q

    got = {r["doc_id"]: (r["n_words"], r["n_pieces"])
           for r in Q.queries()["bpe_subword_stats"](spark, SF_DIR).collect()}

    docs = [(r["doc_id"], r["text"]) for r in
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").collect()]
    wfr = _ref_word_freqs([t for _, t in docs])
    merges, ref_wf = _ref_bpe(wfr, 16)
    assert len(merges) == 16
    piece_len = {"".join(s).removesuffix(EOW): len(s) for s in ref_wf}
    expect = {}
    for i, t in docs:
        ws = [w for w in re.split(r"\s+", t.strip().lower()) if w]
        expect[i] = (len(ws), sum(piece_len[w] for w in ws))
    assert got == expect
