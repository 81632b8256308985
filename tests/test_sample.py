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
