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


def split_thresholds(fractions: dict) -> list[tuple[str, int]]:
    """(name, upper-threshold) bands over the hash60 space, in the dict's
    insertion order (list 'train' first). Exact-integer cumulative cuts;
    when fractions sum to 1 (±1e-9) the last band is pinned to exactly
    2^60 so float rounding can never leave an unassigned sliver."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = 0.0
    for name, f in fractions.items():
        if not 0.0 < f <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in (0, 1], got {f}")
        total += f
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    out, cum = [], 0.0
    names = list(fractions)
    for name in names:
        cum += fractions[name]
        out.append((name, int(cum * _H60_SPACE)))
    if abs(total - 1.0) <= 1e-9:
        out[-1] = (names[-1], _H60_SPACE)
    return out


def assign_splits(
    df: DataFrame, fractions: dict, key_cols, seed: int = 0, out_col: str = "split"
) -> DataFrame:
    """Deterministic train/val/test split assignment: adds ``out_col``
    naming each row's split, by banding the same content-keyed hash60 the
    samplers cut — so splits are DISJOINT by construction, EXHAUSTIVE when
    fractions sum to 1 (rows past the last band get NULL otherwise, i.e.
    "held out"), and a pure function of the data: stable under
    repartitioning, appends, engines, and re-runs. One codegen projection,
    no shuffle. A row's split never changes when other rows arrive — the
    property random splits lack that makes leakage audits possible."""
    h = _sample_key(key_cols, seed)
    expr = None
    for name, t in reversed(split_thresholds(fractions)):
        cond = h < F.lit(t)
        expr = F.when(cond, F.lit(name)) if expr is None else F.when(cond, F.lit(name)).otherwise(expr)
    # reversed + nested otherwise: the FIRST band whose threshold exceeds h
    # wins, i.e. standard cumulative banding
    return df.withColumn(out_col, expr)


def mixture_plan(
    counts: dict,
    parts: dict,
    total: int | None = None,
    allow_upsample: bool = False,
) -> tuple[int, dict]:
    """Pure integer mixture planner: given per-group row counts and target
    INTEGER weight parts (e.g. ``{"web": 7, "wiki": 2, "code": 1}`` for
    70/20/10), compute ``(total, {group: (copies, threshold)})`` such that
    a group-g row is kept ``copies`` times plus once more iff its content
    hash clears ``threshold`` — expected kept rows per group =
    ``parts[g] * total // W`` exactly.

    All arithmetic is exact integers (Python big ints for the 2^60
    threshold scale), so the identical plan is restatable in any engine
    with integer division — the repo's cross-engine determinism rule; the
    DuckDB oracle recomputes it in HUGEINT SQL and bit-matches.

    ``total`` defaults to the LARGEST total realizable without upsampling
    (min over groups of ``count * W // part``). A larger total needs
    ``allow_upsample=True``, which repeats rows (training-epoch style);
    without it the binding group is named in the error."""
    if not parts:
        raise ValueError("parts must be a non-empty {group: positive int} dict")
    for g, w in parts.items():
        if not isinstance(w, int) or w <= 0:
            raise ValueError(f"part for group {g!r} must be a positive int, got {w!r}")
        if counts.get(g, 0) <= 0:
            raise ValueError(f"group {g!r} has no rows; its share is unrealizable")
    W = sum(parts.values())
    max_total = min(counts[g] * W // w for g, w in parts.items())
    if total is None:
        total = max_total
    if total < 0:
        raise ValueError(f"total must be >= 0, got {total}")
    if total > max_total and not allow_upsample:
        binding = min(parts, key=lambda g: counts[g] * W // parts[g])
        raise ValueError(
            f"total={total} exceeds the no-upsample maximum {max_total} "
            f"(binding group {binding!r}: {counts[binding]} rows for "
            f"{parts[binding]}/{W} of the mix); pass allow_upsample=True "
            f"to repeat rows, or lower total"
        )
    plan = {}
    for g, w in parts.items():
        needed = w * total // W
        copies, rem = divmod(needed, counts[g])
        if rem == 0 and copies >= 1:
            # exact multiple: fold one guaranteed copy into the threshold
            # term as "always" (hash60 is 60-bit, so h < 2^60 everywhere) —
            # the no-upsample rate-1 case becomes (0, 2^60) = keep-all
            copies, rem_threshold = copies - 1, _H60_SPACE
        else:
            rem_threshold = rem * _H60_SPACE // counts[g]
        plan[g] = (copies, rem_threshold)
    return total, plan


def mixture_sample(
    df: DataFrame,
    parts: dict,
    group_col: str,
    key_cols,
    seed: int = 0,
    total: int | None = None,
    allow_upsample: bool = False,
) -> DataFrame:
    """Resample a corpus to a target group mixture (the data-mixing step of
    training-set construction: domain/language shares like 70% web /
    20% wiki / 10% code). ``parts`` maps group value -> integer weight;
    unlisted groups are dropped. Rows are chosen by the same content-keyed
    threshold cut as ``deterministic_sample`` — the mixture is a pure
    function of (data, parts, seed, total), independent of partitioning,
    cluster size, and engine.

    Without upsampling this is ONE codegen predicate on the scan (a CASE
    over ~|parts| thresholds — no shuffle, no state; the per-group count
    collect is a |parts|-row scalar aggregate). With
    ``allow_upsample=True`` the result carries an ``epoch`` column
    (0..copies) and a row appears ``copies [+1]`` times via an exploded
    sequence — how a scarce domain gets multiple training epochs; rows
    with zero copies vanish through the non-outer explode. Expected kept
    rows per group = ``parts[g] * total // W`` (Bernoulli at the margin,
    like every sampler here)."""
    listed = sorted(parts)
    counts = {
        r["g"]: r["n"]
        for r in df.where(F.col(group_col).isin(listed))
        .groupBy(F.col(group_col).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    _, plan = mixture_plan(counts, parts, total, allow_upsample)
    h = _sample_key(key_cols, seed)
    thresh, copies = None, None
    for g in listed:
        c, t = plan[g]
        cond = F.col(group_col) == g
        thresh = (thresh.when if thresh is not None else F.when)(cond, F.lit(t))
        copies = (copies.when if copies is not None else F.when)(cond, F.lit(c))
    if not allow_upsample:
        # copies is 0 for every group (mixture_plan raised otherwise, and
        # a rate of exactly 1 lands as threshold == 2^60: keep-all)
        return df.where(h < thresh.otherwise(F.lit(0)))
    n_cop = copies.otherwise(F.lit(0)) + F.when(h < thresh.otherwise(F.lit(0)), 1).otherwise(0)
    seq = F.when(n_cop >= 1, F.sequence(F.lit(0), n_cop - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn("epoch", F.explode(seq))


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
