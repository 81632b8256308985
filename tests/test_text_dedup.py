"""MinHash-LSH vs exact shingle Jaccard: recall + estimate sanity, and
SimHash similarity properties, on data with planted near-duplicates."""

import pytest


from tmframe_spark.text.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash64,
)

WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima".split()


@pytest.fixture(scope="module")
def docs(spark):
    # 30 base docs of 40 words; each gets a near-dup (one word changed) and
    # an exact dup; plus unrelated docs
    rows = []
    did = 0
    for b in range(30):
        # lead with a unique marker so base docs never collide across groups
        base = [f"doc{b}"] + [WORDS[(b * 7 + i * 3) % len(WORDS)] for i in range(40)]
        rows.append((did, " ".join(base))); did += 1
        near = list(base); near[5] = "zulu"
        rows.append((did, " ".join(near))); did += 1
        rows.append((did, " ".join(base))); did += 1  # exact dup
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def test_lsh_recall_vs_exact(docs):
    exact = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(docs, "doc_id", threshold=0.7, shingle_k=3).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, "doc_id", threshold=0.5, shingle_k=3).collect()
    }
    assert exact, "planted near-dups must produce exact pairs"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.2f} < 0.9"


def test_capped_jaccard_recall_and_exact_values(docs):
    from tmframe_spark.text.dedup import jaccard_pairs_capped

    uncapped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(docs, "doc_id", threshold=0.7, shingle_k=3).collect()
    }
    # max_df=5 is aggressive here (exact-dup groups put every shingle at
    # df>=2); recall must still be total because every near-dup pair shares
    # at least one sub-cap shingle
    pairs, stats = jaccard_pairs_capped(
        docs, "doc_id", threshold=0.7, shingle_k=3, max_df=5
    )
    capped = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    st = stats.collect()[0]
    assert st["capped_tokens"] > 0, "cap must actually bite on this fixture"
    assert set(capped) == set(uncapped), "df-capped candidate gen lost pairs"
    for k, v in capped.items():
        # re-verification uses FULL token sets -> values exact, not capped
        assert v == uncapped[k]


def test_estimate_capped_tokens_routes_the_choice(docs, spark):
    """Round-4 verdict #6: the one-pass pre-check must agree with the capped
    query's own stats (so a user can route BEFORE paying for candidate
    generation) and report 0 on a corpus where the cap would be pure
    overhead (the measured 2.3x case, BENCH.md round-4)."""
    from tmframe_spark.text.dedup import estimate_capped_tokens, jaccard_pairs_capped

    est = estimate_capped_tokens(docs, "doc_id", shingle_k=3, max_df=5).collect()[0]
    _, stats = jaccard_pairs_capped(docs, "doc_id", shingle_k=3, max_df=5)
    st = stats.collect()[0]
    assert est["capped_tokens"] == st["capped_tokens"] > 0
    assert est["total_tokens"] == st["total_tokens"]
    assert est["max_observed_df"] > 5  # the hot tokens the cap would drop
    # a corpus of fully distinct tokens: the cap excludes nothing -> the
    # estimate says "use the plain exact form"
    clean = spark.createDataFrame(
        [(i, f"u{i}a u{i}b u{i}c") for i in range(50)], "doc_id long, text string"
    )
    est0 = estimate_capped_tokens(clean, "doc_id", max_df=5).collect()[0]
    assert est0["capped_tokens"] == 0 and est0["max_observed_df"] == 1


def test_lsh_recall_on_driver_corpus(spark):
    """Scale-proof (round-3 verdict #6): recall evidence on the DRIVER
    corpus, not just the 90-doc planted fixture. At sf0.1 the measured
    figures are 5000 docs / 256 exact pairs (all j>=0.6) / LSH recall
    1.000 / walls lsh 1.3 s vs exact 9.0 s (BENCH.md round-4); this test
    asserts the same invariant at the suite's sf so it cannot rot."""
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(docs, "doc_id", threshold=0.5, shingle_k=3).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, "doc_id", threshold=0.35, shingle_k=3).collect()
    }
    strong = {k for k, v in exact.items() if v >= 0.6}
    assert len(exact) >= 20, "driver corpus must contain near-dup pairs"
    assert strong, "driver corpus must contain pairs with jaccard >= 0.6"
    assert len(strong & lsh) / len(strong) >= 0.9, (
        f"bench-corpus LSH recall {len(strong & lsh)}/{len(strong)}"
    )


def test_minhash_estimate_close_to_exact(docs):
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(docs, "doc_id", threshold=0.05, shingle_k=3).collect()
    }
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(docs, "doc_id", threshold=0.3, shingle_k=3).collect()
    }
    both = set(exact) & set(est)
    assert both
    for k in both:
        assert abs(exact[k] - est[k]) < 0.25, f"{k}: exact {exact[k]} vs est {est[k]}"


def test_exact_dup_pairs_have_jaccard_1(docs):
    ones = [
        r
        for r in jaccard_pairs(docs, "doc_id", threshold=0.999, shingle_k=3).collect()
    ]
    assert len(ones) >= 30  # each base/exact-dup pair


def test_simhash_near_dups_have_small_hamming(docs, spark):
    sh = {r["id"]: r["simhash"] for r in simhash64(docs, "doc_id").collect()}
    # exact dup -> identical simhash; near dup -> small hamming distance
    for b in range(30):
        base_id, near_id, dup_id = 3 * b, 3 * b + 1, 3 * b + 2
        assert sh[base_id] == sh[dup_id]
        ham = bin((sh[base_id] ^ sh[near_id]) & ((1 << 64) - 1)).count("1")
        # ~13 distinct tokens vote per bit, so margins are tiny and one
        # changed word can flip a fair number of bits; << 32 (random) is
        # the meaningful property
        assert ham <= 24, f"near-dup hamming {ham} too large"


def test_bpe_count_equals_lookaround_split(spark):
    # the regexp_count form must equal the original lookaround-split form
    # (Spark supports lookarounds; DuckDB's RE2 does not — hence the rework)
    from pyspark.sql import functions as F

    from tmframe_spark.text.analysis import bpe_ish_token_count

    texts = [
        "hello, world!",
        "a.b.c",
        "!!",
        "",
        "   ",
        "foo_bar baz-qux",
        "x",
        "one  two\tthree",
        "(nested [brackets]!)",
        "ünïcode straße 東京",  # non-ASCII outside \w in both engines
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    t = F.trim(F.col("text"))
    legacy = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(
            F.filter(
                F.split(t, r"[\s]+|(?=[^\w\s])|(?<=[^\w\s])"),
                lambda x: F.length(x) > 0,
            )
        )
    )
    rows = df.select(
        "text",
        bpe_ish_token_count(F.col("text")).alias("new"),
        legacy.alias("old"),
    ).collect()
    for r in rows:
        assert r["new"] == r["old"], f"{r['text']!r}: {r['new']} != {r['old']}"


def test_portable_hash60_matches_duckdb(spark):
    import duckdb
    from pyspark.sql import functions as F

    from tmframe_spark.text.dedup import _portable_hash60

    words = ["abc", "", "the", "straße", "東京", "x" * 50]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: r["h"]
        for r in df.select("w", _portable_hash60(F.col("w")).alias("h")).collect()
    }
    con = duckdb.connect()
    for w in words:
        (want,) = con.execute(
            "SELECT CAST(('0x' || substr(md5(?), 1, 15)) AS BIGINT)", [w]
        ).fetchone()
        assert got[w] == want, w


def test_exact_dedup_keeps_lowest_id(docs):
    kept = {r["doc_id"] for r in exact_dedup(docs, "doc_id").collect()}
    for b in range(30):
        assert 3 * b in kept and 3 * b + 2 not in kept  # dup dropped
        assert 3 * b + 1 in kept  # near-dup kept (not exact)


def test_rolling_fingerprints_shingles(spark):
    from tmframe_spark.text.analysis import rolling_fingerprints

    df = spark.createDataFrame(
        [
            (0, "a b c d e f"),        # 6 words, k=5 -> 2 shingles
            (1, "a b c d e f"),        # identical -> identical shingles
            (2, "a b c d e g"),        # differs in last word -> shares 1 of 2
            (3, "x y"),                # shorter than k -> 1 (padded) shingle
        ],
        "doc_id long, text string",
    )
    fp = rolling_fingerprints(df, "text", k=5)
    by_doc = {}
    for r in fp.collect():
        by_doc.setdefault(r["doc_id"], []).append(r["shingle_hash"])
    assert len(by_doc[0]) == 2 and by_doc[0] == by_doc[1]
    assert len(set(by_doc[0]) & set(by_doc[2])) == 1
    assert len(by_doc[3]) == 1


def test_jaccard_pairs_refuses_corpus_scale(spark):
    # the exact O(n^2) oracle must refuse a beyond-cap input loudly
    import pytest as _pytest

    from tmframe_spark.text.dedup import jaccard_pairs

    docs = spark.range(50).selectExpr(
        "id AS doc_id", "concat('w', cast(id % 7 as string)) AS text"
    )
    with _pytest.raises(ValueError, match="jaccard_pairs_capped"):
        jaccard_pairs(docs, "doc_id", max_docs=10)
    # under the cap (and with max_docs=None) it still runs
    assert jaccard_pairs(docs, "doc_id", max_docs=None).count() >= 0


def test_dedup_clusters_matches_union_find(spark):
    """Connected components via alternating large/small-star must equal a
    driver-side union-find on the same edge set — including a 120-node
    chain (worst-case diameter, where naive min-propagation needs O(n)
    rounds but the star algorithm converges in O(log n))."""
    import numpy as np

    from tmframe_spark.text.dedup import dedup_clusters

    rng = np.random.default_rng(3)
    edges = set()
    for a, b in rng.integers(0, 300, size=(250, 2)):
        if a != b:
            edges.add((int(min(a, b)), int(max(a, b))))
    edges |= {(1000 + i, 1001 + i) for i in range(120)}  # long chain
    pairs = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    got = {(r["id"], r["cluster_id"]) for r in dedup_clusters(pairs).collect()}

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    comp: dict[int, list[int]] = {}
    for n in {n for e in edges for n in e}:
        comp.setdefault(find(n), []).append(n)
    ref = {(n, min(mem)) for mem in comp.values() for n in mem}
    assert got == ref


def test_dedup_keep_canonical_on_corpus(docs):
    """Corpus-level dedup: only each component's minimum id survives; docs
    in no near-dup pair are untouched."""
    from tmframe_spark.text.dedup import (
        dedup_clusters,
        dedup_keep_canonical,
        jaccard_pairs,
    )

    pairs = jaccard_pairs(docs, "doc_id", threshold=0.7, shingle_k=3)
    clusters = {r["id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert clusters, "fixture must produce near-dup clusters"
    kept = {r["doc_id"] for r in dedup_keep_canonical(docs, pairs, "doc_id").collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    losers = {i for i, c in clusters.items() if i != c}
    assert kept == all_ids - losers
    # every cluster's canonical member is kept, every other member dropped
    for i, c in clusters.items():
        assert (c in kept) and (i == c or i not in kept)


def test_dedup_clusters_empty_and_presplit(spark):
    from tmframe_spark.text.dedup import dedup_clusters

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup_clusters(empty).count() == 0
    # already-star input converges immediately and keeps its roots
    stars = spark.createDataFrame([(0, 5), (0, 9), (20, 21)], "id_a long, id_b long")
    got = {(r["id"], r["cluster_id"]) for r in dedup_clusters(stars).collect()}
    assert got == {(0, 0), (5, 0), (9, 0), (20, 20), (21, 20)}


def test_dedup_clusters_property_vs_union_find(spark):
    """Property check over random graph shapes (dense blobs, forests,
    bipartite-ish) — the star algorithm must equal union-find on all of
    them. Seeded loop instead of hypothesis: each case costs a Spark job,
    so a bounded deterministic sweep keeps the suite's time predictable."""
    import numpy as np

    from tmframe_spark.text.dedup import dedup_clusters

    for seed, n_nodes, n_edges in [(0, 12, 8), (1, 30, 60), (2, 60, 30),
                                   (3, 25, 5), (4, 40, 200)]:
        rng = np.random.default_rng(seed)
        edges = {
            (int(min(a, b)), int(max(a, b)))
            for a, b in rng.integers(0, n_nodes, size=(n_edges, 2))
            if a != b
        }
        if not edges:
            continue
        pairs = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
        got = {(r["id"], r["cluster_id"]) for r in dedup_clusters(pairs).collect()}
        parent: dict[int, int] = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        comp: dict[int, list[int]] = {}
        for v in {v for e in edges for v in e}:
            comp.setdefault(find(v), []).append(v)
        ref = {(v, min(mem)) for mem in comp.values() for v in mem}
        assert got == ref, (seed, n_nodes, n_edges)


def test_duplicate_span_stats_planted(spark):
    """Cross-doc duplicated spans against an in-test sequential reference:
    planted shared boilerplate marks both carriers; a short (<w tokens) doc
    contributes exactly one whole-doc span; intra-doc repetition alone does
    NOT mark a span (min_docs counts distinct documents)."""
    import re

    from tmframe_spark.text.dedup import duplicate_span_stats

    boiler = (
        "this license text is shared across documents exactly verbatim "
        "in every mirror of the corpus"
    )
    docs = [
        (1, boiler + " plus a unique tail one alpha beta gamma delta"),
        (2, "totally different unique leading content here " + boiler),
        (3, "short doc"),
        (4, " ".join(["repeat"] * 20)),
        (5, "another fully unique document with no shared spans anywhere at all"),
    ]

    def ref(w=8, min_docs=2):
        span_docs: dict[str, set[int]] = {}
        per_doc: dict[int, list[str]] = {}
        for i, t in docs:
            ws = re.split(r"\s+", t.strip().lower())
            sp = [" ".join(ws[p : p + w]) for p in range(0, max(len(ws) - w, 0) + 1)]
            per_doc[i] = sp
            for s in set(sp):
                span_docs.setdefault(s, set()).add(i)
        return {
            i: (
                len(sp),
                sum(1 for s in sp if len(span_docs[s]) >= min_docs),
            )
            for i, sp in per_doc.items()
        }

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in duplicate_span_stats(df, "doc_id", w=8).collect()
    }
    expect = ref()
    assert got == expect
    # the planted boilerplate is long enough to mark spans in docs 1 and 2
    assert expect[1][1] > 0 and expect[2][1] > 0
    # doc 3: one whole-doc span, unique; doc 4: intra-doc repeats only
    assert expect[3] == (1, 0)
    assert expect[4][1] == 0 and expect[5][1] == 0


def test_remove_duplicate_spans_planted(spark):
    """Removal half (Lee et al.) against an in-test sequential reference:
    the canonical (lowest-doc, lowest-pos) boilerplate occurrence
    survives, every other occurrence's tokens vanish; unique docs come
    back untouched; a doc that is ALL boilerplate empties out."""
    import re

    from tmframe_spark.text.dedup import remove_duplicate_spans

    boiler = (
        "this license text is shared across documents exactly verbatim "
        "in every mirror of the corpus"
    )
    docs = [
        (1, boiler + " plus a unique tail one alpha beta gamma delta"),
        (2, "totally different unique leading content here " + boiler),
        (3, boiler),  # pure boilerplate, non-canonical -> empties out
        (4, "another fully unique document with no shared spans anywhere at all"),
        (5, "short doc"),
    ]

    def ref(w=8, min_docs=2):
        tk = {i: re.split(r"\s+", t.strip().lower()) for i, t in docs}
        inst: dict[str, list[tuple[int, int]]] = {}
        for i, ws in tk.items():
            for p in range(1, max(len(ws) - w + 1, 1) + 1):
                s = " ".join(ws[p - 1 : p - 1 + w])
                inst.setdefault(s, []).append((i, p))
        removed: dict[int, set[int]] = {i: set() for i in tk}
        for s, occ in inst.items():
            if len({i for i, _ in occ}) < min_docs:
                continue
            canon = min(occ)  # (min doc id, then min pos)
            for i, p in occ:
                if (i, p) == canon:
                    continue
                n = len(tk[i])
                removed[i].update(range(p, min(p + w - 1, n) + 1))
        out = {}
        for i, ws in tk.items():
            keep = [t for p, t in enumerate(ws, 1) if p not in removed[i]]
            out[i] = (" ".join(keep), len(ws), len(ws) - len(keep))
        return out

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in remove_duplicate_spans(df, "doc_id", w=8).collect()
    }
    expect = ref()
    assert got == expect
    # doc 1 is canonical: its boilerplate survives verbatim as a prefix
    assert got[1][0].startswith("this license text is shared")
    # docs 2/3 lose the boilerplate wholesale
    assert "license" not in got[2][0] and got[2][2] > 0
    assert got[3] == ("", 15, 15)
    # untouched docs: zero removals, text equals the normalized original
    assert got[4] == (docs[3][1], 11, 0)
    assert got[5] == ("short doc", 2, 0)
