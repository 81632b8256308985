"""Deterministic content-keyed sampling: reproducibility, append
stability, nested composition, and stratified equivalence."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tmframe_spark.ops.sample import (
    deterministic_sample,
    stratified_deterministic_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_sample_partitioning_independent(docs):
    a = _ids(deterministic_sample(docs, 0.1, ["doc_id"], seed=7))
    b = _ids(deterministic_sample(docs.repartition(13), 0.1, ["doc_id"], seed=7))
    assert a == b and 0 < len(a) < docs.count()
    # rough rate sanity: 500 docs at 10% — binomial-style band
    assert 20 <= len(a) <= 90


def test_sample_append_stable(docs, spark):
    # sampling batch-by-batch then unioning == sampling the union: a row's
    # fate never depends on what else arrived
    lo = docs.where("doc_id < 200")
    hi = docs.where("doc_id >= 200")
    split = _ids(deterministic_sample(lo, 0.2, ["doc_id"], seed=3)) | _ids(
        deterministic_sample(hi, 0.2, ["doc_id"], seed=3)
    )
    whole = _ids(deterministic_sample(docs, 0.2, ["doc_id"], seed=3))
    assert split == whole


def test_sample_nested_rates_compose(docs):
    # a rate-0.1 sample of a rate-0.5 sample == the rate-0.1 sample:
    # both are threshold cuts of the same hash value
    outer = deterministic_sample(
        deterministic_sample(docs, 0.5, ["doc_id"], seed=9), 0.1, ["doc_id"], seed=9
    )
    direct = deterministic_sample(docs, 0.1, ["doc_id"], seed=9)
    assert _ids(outer) == _ids(direct)


def test_sample_seed_changes_selection(docs):
    a = _ids(deterministic_sample(docs, 0.2, ["doc_id"], seed=1))
    b = _ids(deterministic_sample(docs, 0.2, ["doc_id"], seed=2))
    assert a != b  # different seeds -> different (overlapping) draws


def test_sample_rate_bounds(docs):
    with pytest.raises(ValueError, match="rate"):
        deterministic_sample(docs, 1.5, ["doc_id"])
    assert deterministic_sample(docs, 0.0, ["doc_id"]).count() == 0
    assert deterministic_sample(docs, 1.0, ["doc_id"]).count() == docs.count()


def test_stratified_equals_per_stratum_samples(docs):
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    assert len(langs) >= 2
    keep_all, keep_some = langs[0], langs[1]
    rates = {keep_all: 1.0, keep_some: 0.3}
    got = stratified_deterministic_sample(docs, rates, "lang", ["doc_id"], seed=5)
    for lang, rate in rates.items():
        want = _ids(
            deterministic_sample(
                docs.where(F.col("lang") == lang), rate, ["doc_id"], seed=5
            )
        )
        assert _ids(got.where(F.col("lang") == lang)) == want
    # unlisted strata are dropped entirely
    assert got.where(~F.col("lang").isin(keep_all, keep_some)).count() == 0
    with pytest.raises(ValueError, match="stratum"):
        stratified_deterministic_sample(docs, {keep_all: 2.0}, "lang", ["doc_id"])


def test_sample_plan_is_shuffle_free(docs):
    # one codegen predicate on the scan: no Exchange anywhere in the plan
    plan = (
        deterministic_sample(docs, 0.1, ["doc_id"], seed=7)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


# ---------------------------------------------------------------- mixture


def test_mixture_plan_integer_math():
    from tmframe_spark.ops.sample import _H60_SPACE, mixture_plan

    counts = {"a": 100, "b": 50}
    # default total: binding group is whichever runs out first
    total, plan = mixture_plan(counts, {"a": 3, "b": 1})
    assert total == min(100 * 4 // 3, 50 * 4 // 1)  # = 133
    assert plan["a"] == (0, (3 * 133 // 4) * _H60_SPACE // 100)
    assert plan["b"] == (0, (1 * 133 // 4) * _H60_SPACE // 50)
    # exact-multiple fold: rate 1 becomes (0, keep-all)
    total, plan = mixture_plan({"a": 10}, {"a": 1}, total=10)
    assert plan["a"] == (0, _H60_SPACE)
    # upsample: 2.5x one group
    total, plan = mixture_plan({"a": 10}, {"a": 1}, total=25, allow_upsample=True)
    assert plan["a"] == (2, 5 * _H60_SPACE // 10)
    # exact multiple with copies folds one into the always-threshold
    total, plan = mixture_plan({"a": 10}, {"a": 1}, total=30, allow_upsample=True)
    assert plan["a"] == (2, _H60_SPACE)


def test_mixture_plan_errors():
    from tmframe_spark.ops.sample import mixture_plan

    with pytest.raises(ValueError, match="no rows"):
        mixture_plan({"a": 10}, {"a": 1, "b": 1})
    with pytest.raises(ValueError, match="positive int"):
        mixture_plan({"a": 10}, {"a": 0.5})
    with pytest.raises(ValueError, match="binding group 'b'"):
        mixture_plan({"a": 100, "b": 2}, {"a": 1, "b": 1}, total=100)


def test_mixture_sample_matches_per_group_cuts(docs):
    """Each group's kept set is EXACTLY the content-hash cut at the
    planned threshold — the mixture is deterministic_sample per group with
    data-derived rates (and repartition-independent)."""
    from tmframe_spark.ops.sample import _H60_SPACE, mixture_plan, mixture_sample

    parts = {"en": 5, "zh": 2, "de": 1, "fr": 1, "es": 1}
    out = mixture_sample(docs, parts, "lang", ["doc_id"], seed=11)
    got = {(r["doc_id"], r["lang"]) for r in out.select("doc_id", "lang").collect()}
    counts = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    _, plan = mixture_plan({g: counts[g] for g in parts}, parts)
    from tmframe_spark.ops.sample import _sample_key

    want = set()
    for g, (copies, thr) in plan.items():
        assert copies == 0 and 0 < thr <= _H60_SPACE
        kept = docs.where(F.col("lang") == g).where(
            _sample_key(["doc_id"], 11) < F.lit(thr)
        )
        want |= {(r["doc_id"], r["lang"]) for r in kept.select("doc_id", "lang").collect()}
    assert got == want and len(got) > 0
    rep = mixture_sample(docs.repartition(13), parts, "lang", ["doc_id"], seed=11)
    assert {(r["doc_id"], r["lang"]) for r in rep.select("doc_id", "lang").collect()} == got


def test_mixture_upsample_multiplicity(docs):
    """allow_upsample: each row appears copies(+1) times with dense epoch
    ids — multiplicities match the integer plan exactly."""
    from collections import Counter

    from tmframe_spark.ops.sample import mixture_plan, mixture_sample
    from tmframe_spark.text.dedup import _portable_hash60

    parts = {"zh": 1, "de": 1}
    counts = {
        r["lang"]: r["n"]
        for r in docs.where(F.col("lang").isin(["zh", "de"]))
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    W = sum(parts.values())
    max_total = min(counts[g] * W // w for g, w in parts.items())
    total = 2 * max_total + 3
    out = mixture_sample(
        docs, parts, "lang", ["doc_id"], seed=5, total=total, allow_upsample=True
    )
    rows = out.select("doc_id", "lang", "epoch").collect()
    mult = Counter((r["doc_id"], r["lang"]) for r in rows)
    # independent multiplicity computation from the same plan + hash
    _, plan = mixture_plan(counts, parts, total=total, allow_upsample=True)
    key = F.concat_ws("\x1f", F.lit("5"), F.col("doc_id").cast("string"))
    hashes = {
        (r["doc_id"], r["lang"]): r["h"]
        for r in docs.where(F.col("lang").isin(["zh", "de"]))
        .select("doc_id", "lang", _portable_hash60(key).alias("h"))
        .collect()
    }
    want = {}
    for (did, lang), h in hashes.items():
        copies, thr = plan[lang]
        m = copies + (1 if h < thr else 0)
        if m:
            want[(did, lang)] = m
    assert dict(mult) == want
    assert any(m >= 2 for m in want.values())  # upsampling actually happened
    # dense epochs per row
    for (did, lang), m in mult.items():
        eps = sorted(r["epoch"] for r in rows if r["doc_id"] == did and r["lang"] == lang)
        assert eps == list(range(m))


def test_mixture_unlisted_groups_dropped(docs):
    from tmframe_spark.ops.sample import mixture_sample

    out = mixture_sample(docs, {"zh": 1}, "lang", ["doc_id"], seed=0)
    langs = {r["lang"] for r in out.select("lang").collect()}
    assert langs == {"zh"}


# ---------------------------------------------------------------- splits


def test_split_thresholds_math():
    from tmframe_spark.ops.sample import _H60_SPACE, split_thresholds

    t = split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1})
    assert [n for n, _ in t] == ["train", "val", "test"]
    assert t[0][1] == int(0.8 * _H60_SPACE)
    assert t[-1][1] == _H60_SPACE  # exhaustive pin: no rounding sliver
    hold = split_thresholds({"train": 0.5})
    assert hold[-1][1] == int(0.5 * _H60_SPACE)  # holdout: NOT pinned
    with pytest.raises(ValueError, match="sum"):
        split_thresholds({"a": 0.8, "b": 0.3})
    with pytest.raises(ValueError, match="fraction"):
        split_thresholds({"a": 0.0})


def test_assign_splits_disjoint_exhaustive(docs):
    from tmframe_spark.ops.sample import assign_splits

    out = assign_splits(docs, {"train": 0.8, "val": 0.1, "test": 0.1},
                        ["doc_id"], seed=13)
    rows = out.select("doc_id", "split").collect()
    assert len(rows) == docs.count()
    assert all(r["split"] in ("train", "val", "test") for r in rows)
    got = {r["doc_id"]: r["split"] for r in rows}
    n = len(got)
    trains = sum(1 for s in got.values() if s == "train")
    assert 0.65 * n < trains < 0.95 * n  # binomial-style band around 0.8
    # repartition + append stability: fate is per-row content, not context
    rep = {
        r["doc_id"]: r["split"]
        for r in assign_splits(
            docs.repartition(17), {"train": 0.8, "val": 0.1, "test": 0.1},
            ["doc_id"], seed=13,
        ).select("doc_id", "split").collect()
    }
    assert rep == got
    sub = {
        r["doc_id"]: r["split"]
        for r in assign_splits(
            docs.where("doc_id < 100"), {"train": 0.8, "val": 0.1, "test": 0.1},
            ["doc_id"], seed=13,
        ).select("doc_id", "split").collect()
    }
    assert sub == {k: v for k, v in got.items() if k < 100}


def test_assign_splits_holdout_band(docs):
    from tmframe_spark.ops.sample import _H60_SPACE, _sample_key, assign_splits

    out = assign_splits(docs, {"train": 0.5}, ["doc_id"], seed=2)
    rows = out.select(
        "doc_id", "split", _sample_key(["doc_id"], 2).alias("h")
    ).collect()
    thr = int(0.5 * _H60_SPACE)
    for r in rows:
        assert (r["split"] == "train") == (r["h"] < thr)
    assert any(r["split"] is None for r in rows)  # held out rows exist
