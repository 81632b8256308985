"""DSIR-style importance weights (Data Selection via Importance
Resampling, Xie et al. 2022): score raw documents by how target-like
their hashed-n-gram distribution is, then resample the top of the raw
pool. The classifier-free sibling of the CCNet LM filter (text/lm.py) —
both are first-class corpus-selection stages.

Features: unigrams + word bigrams hashed into ``n_buckets`` with the
portable md5-prefix hash (the simhash/dup-span oracle idiom, so DuckDB
can restate the bucketing bit-for-bit). Fit = one map-side-combined
bucket count per corpus. Scoring = one (id, bucket) count aggregate and
two bucket-keyed left joins (fitted count tables are n_buckets rows —
they broadcast at any corpus scale).

Exactness discipline (the lm.py pattern):
- integer evidence columns — ``n_feats`` and the kernel inner products
  ``dot_target`` / ``dot_raw`` (sum of c_f x corpus-count products, in
  decimal(38,0) so a 100 TB corpus cannot overflow them) — are exact and
  DuckDB-oracle-hashable;
- the importance weight itself needs ln, which is not correctly rounded
  cross-library, so it is Q32-quantized PER BUCKET and summed as exact
  int64 (deterministic, partition-independent; pytest pins it within the
  +-1-quantum-per-feature ulp bound):

      lam_f   = ln((C_target_f + 1) / (N_target + n_buckets))
              - ln((C_raw_f    + 1) / (N_raw    + n_buckets))
      w_q32   = sum_f c_f * floor(lam_f * 2^32)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tmframe_spark.text.dedup import _portable_hash60, shingles, tokens

DSIR_Q = 1 << 32


def _feature_buckets(docs: DataFrame, id_col: str, text_col: str, n_buckets: int):
    """One row per feature INSTANCE: (id, f) with f in [0, n_buckets).
    Unigrams plus 2-word shingles (a 1-token doc contributes its word once
    per family — the doc_novelty short-doc convention, restated in the
    oracle)."""
    c = F.col(text_col)
    grams = F.concat(tokens(c, distinct=False), shingles(c, 2, distinct=False))
    return docs.select(
        F.col(id_col).alias("id"), F.explode(grams).alias("g")
    ).select("id", (F.pmod(_portable_hash60(F.col("g")), F.lit(n_buckets))).alias("f"))


def dsir_fit(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
) -> dict:
    """Fit one hashed-n-gram multinomial: ``{"counts": (f, cnt), "total":
    N, "n_buckets": m}``. The count table is at most ``n_buckets`` rows
    (eagerly localCheckpointed — scoring reuses it and N reads off it)."""
    counts = (
        _feature_buckets(docs, id_col, text_col, n_buckets)
        .groupBy("f")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    total = counts.agg(F.sum("cnt")).collect()[0][0] or 0
    return {"counts": counts, "total": int(total), "n_buckets": n_buckets}


def dsir_weights(
    docs: DataFrame,
    target: dict,
    raw: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document against a fitted target/raw pair. Output per
    input doc: ``(id_col, n_feats, dot_target, dot_raw, weight_q32,
    avg_weight)`` — higher weight = more target-like. Docs with no
    features (empty text still yields its '' token) keep zero rows via
    the left join back."""
    if target["n_buckets"] != raw["n_buckets"]:
        raise ValueError(
            f"target/raw fitted with different n_buckets: "
            f"{target['n_buckets']} vs {raw['n_buckets']}"
        )
    m = target["n_buckets"]
    nt, nr = target["total"], raw["total"]
    if nt <= 0 or nr <= 0:
        raise ValueError("dsir_weights: a fitted corpus is empty")
    per = (
        _feature_buckets(docs, id_col, text_col, m)
        .groupBy("id", "f")
        .agg(F.count("*").alias("c"))
    )
    tc = target["counts"].select("f", F.col("cnt").alias("ct"))
    rc = raw["counts"].select("f", F.col("cnt").alias("cr"))
    j = per.join(tc, "f", "left").join(rc, "f", "left")
    ct = F.coalesce("ct", F.lit(0)).cast("long")
    cr = F.coalesce("cr", F.lit(0)).cast("long")
    # lam_f as ONE pinned double expression per bucket, then the Q32 floor;
    # everything downstream sums exactly
    lam = F.log((ct + 1).cast("double") / F.lit(float(nt + m))) - F.log(
        (cr + 1).cast("double") / F.lit(float(nr + m))
    )
    q = F.floor(lam * F.lit(float(DSIR_Q))).cast("long")
    dec = lambda x: x.cast("decimal(38,0)")  # noqa: E731
    per_doc = j.groupBy("id").agg(
        F.sum("c").cast("long").alias("n_feats"),
        F.sum(dec(F.col("c")) * dec(ct)).cast("decimal(38,0)").alias("dot_target"),
        F.sum(dec(F.col("c")) * dec(cr)).cast("decimal(38,0)").alias("dot_raw"),
        F.sum(F.col("c") * q).alias("weight_q32"),
    )
    base = docs.select(F.col(id_col).alias("id"))
    return base.join(per_doc, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
        "dot_target",
        "dot_raw",
        "weight_q32",
        (
            (F.col("weight_q32").cast("double") / F.col("n_feats").cast("double"))
            / F.lit(float(DSIR_Q))
        ).alias("avg_weight"),
    )


def corpus_drift(fit_a: dict, fit_b: dict) -> DataFrame:
    """Distribution drift between two fitted corpora (snapshot monitoring:
    did yesterday's crawl shift against today's?). One row per hashed
    feature bucket:

    - ``c_a`` / ``c_b``: the exact counts (0 where absent);
    - ``contrast = c_a * N_b - c_b * N_a`` (decimal(38,0)): the exact
      cross-multiplied rate difference — sign = direction, 0 = identical
      rates — comparable without any float;
    - ``psi_q32``: this bucket's Population-Stability-Index contribution,
      (p_a - p_b) * ln(p_a / p_b) with add-one smoothing, Q32-floored to
      int64 so the corpus-level PSI is an EXACT sum (sum(psi_q32) / 2^32);
      each contribution is >= 0 up to the one-quantum floor error.

    Both fitted tables are <= n_buckets rows; the join is trivially
    broadcast. The count columns are DuckDB-oracle-hashable; psi rides
    the lm.py Q32 float discipline.
    """
    if fit_a["n_buckets"] != fit_b["n_buckets"]:
        raise ValueError(
            f"fits use different n_buckets: {fit_a['n_buckets']} vs "
            f"{fit_b['n_buckets']}"
        )
    m = fit_a["n_buckets"]
    na, nb = fit_a["total"], fit_b["total"]
    if na <= 0 or nb <= 0:
        raise ValueError("corpus_drift: a fitted corpus is empty")
    a = fit_a["counts"].select("f", F.col("cnt").alias("c_a"))
    b = fit_b["counts"].select("f", F.col("cnt").alias("c_b"))
    j = a.join(b, "f", "full_outer").select(
        "f",
        F.coalesce("c_a", F.lit(0)).cast("long").alias("c_a"),
        F.coalesce("c_b", F.lit(0)).cast("long").alias("c_b"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    pa = (F.col("c_a") + 1).cast("double") / F.lit(float(na + m))
    pb = (F.col("c_b") + 1).cast("double") / F.lit(float(nb + m))
    psi = (pa - pb) * (F.log(pa) - F.log(pb))
    return j.select(
        "f",
        "c_a",
        "c_b",
        (dec("c_a") * F.lit(nb).cast("decimal(38,0)")
         - dec("c_b") * F.lit(na).cast("decimal(38,0)")).alias("contrast"),
        F.floor(psi * F.lit(float(DSIR_Q))).cast("long").alias("psi_q32"),
    )
