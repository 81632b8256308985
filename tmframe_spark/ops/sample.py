"""Deterministic, engine-portable sampling for training-data pipelines.

``df.sample()`` draws from a per-partition RNG: the selected rows change
with partitioning, cluster size, and even row order inside a file — useless
for reproducible corpus lineage. These samplers key every decision on row
CONTENT: keep a row iff ``hash60(seed || key) < rate * 2^60``, with hash60
the md5-prefix 60-bit hash every engine can restate (text/dedup, matched
against DuckDB bit-for-bit). Consequences:

- the same (seed, key) lands on the same side everywhere: any
  partitioning, any cluster size, any engine — the sample is a pure
  function of the data;
- appends never flip earlier rows (a row's fate is independent of what
  else arrives), so incremental pipelines can sample batch-by-batch and
  the union equals a one-shot sample of the union;
- nested rates compose: a rate-r sample of a rate-R sample (same seed)
  equals a rate-min(r, R) sample, because both are threshold cuts of the
  same hash value.

Scale shape: one codegen'd predicate on the scan — no shuffle, no state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_H60_SPACE = 1 << 60


def _sample_key(key_cols, seed: int):
    from tmframe_spark.text.dedup import _portable_hash60

    return _portable_hash60(
        F.concat_ws(
            "\x1f", F.lit(str(seed)), *[F.col(c).cast("string") for c in key_cols]
        )
    )


def deterministic_sample(
    df: DataFrame, rate: float, key_cols, seed: int = 0
) -> DataFrame:
    """Content-keyed Bernoulli sample at ``rate`` (0..1), keyed by
    ``key_cols`` (e.g. the document id). See the module docstring for the
    reproducibility/composition properties."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.where(_sample_key(key_cols, seed) < F.lit(int(rate * _H60_SPACE)))


def stratified_deterministic_sample(
    df: DataFrame, rates: dict, strata_col: str, key_cols, seed: int = 0
) -> DataFrame:
    """Per-stratum content-keyed sampling — the standard corpus-mixing
    move (e.g. keep 10% of English, 100% of a rare language). ``rates``
    maps stratum value -> rate; unlisted strata are dropped (rate 0).
    Same hash rule per row, so each stratum's kept set is exactly its
    ``deterministic_sample`` at that rate (asserted in tests)."""
    thresh = None
    for k, r in sorted(rates.items()):
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {k!r} must be in [0, 1], got {r}")
        t = F.lit(int(r * _H60_SPACE))
        cond = F.col(strata_col) == k
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    if thresh is None:
        return df.where(F.lit(False))
    return df.where(_sample_key(key_cols, seed) < thresh.otherwise(F.lit(0)))
