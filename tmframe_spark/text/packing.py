"""Deterministic sequence packing: group documents into fixed-token-budget
bins (the pretraining batch-prep step — concatenate docs up to a context
length; public practice, e.g. the T5/GPT "packing" writeups).

Bin packing is inherently sequential, so the distributed form fixes an
explicit, CONTENT-KEYED order and packs greedily within shards:

1. shard  = hash(seed, id) % n_shards  — a doc's shard is a pure function
   of the data, never of physical partitioning;
2. within a shard, docs are ordered by (hash, id) — again content-keyed;
3. first-fit greedy along that order: a doc joins the open bin if it fits
   the token budget, else opens the next bin; an oversized doc (tokens >
   budget) gets a bin of its own.

The result is a pure function of (data, budget, n_shards, seed): identical
bins at any partitioning, cluster size, or batch split — asserted in
tests against a single-threaded reference. Scale shape: one shuffle on
shard, then O(1) running state per shard inside an Arrow-batched pass
(greedy never looks back); bins are only ever (shard, bin) local, so no
global coordination exists to bottleneck.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_documents(
    docs: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
    n_shards: int = 256,
    seed: int = 0,
) -> DataFrame:
    """Assign every document to a (shard, bin): bins respect ``max_tokens``
    except when a single document alone exceeds it. Token counts come from
    ``token_count_col`` when given, else whitespace ``token_count`` over
    ``text_col``. Output: (id_col, n_tokens, shard, bin)."""
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    from tmframe_spark.text.analysis import token_count

    # NULL text / NULL counts coalesce to 0: a NaN reaching the greedy
    # accumulator would make 'fill + t > budget' permanently False and
    # silently pile the rest of the shard into one unbounded bin
    toks = F.coalesce(
        (
            F.col(token_count_col)
            if token_count_col
            else token_count(F.col(text_col))
        ).cast("long"),
        F.lit(0),
    )
    keyed = docs.select(
        F.col(id_col),
        toks.alias("n_tokens"),
        F.pmod(F.xxhash64(F.lit(seed), F.col(id_col).cast("string")), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        F.xxhash64(F.lit(seed + 1), F.col(id_col).cast("string")).alias("_h"),
    )

    schema = f"{keyed.schema[id_col].name} {keyed.schema[id_col].dataType.simpleString()}, n_tokens long, shard int, bin long"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # running greedy state survives Arrow batch boundaries; shards are
        # contiguous (sorted), so one (shard, bin, fill) triple suffices
        cur_shard, cur_bin, cur_fill = None, 0, 0
        for pdf in batches:
            if not len(pdf):
                continue
            bins = []
            for s, t in zip(pdf["shard"].tolist(), pdf["n_tokens"].tolist()):
                if s != cur_shard:
                    cur_shard, cur_bin, cur_fill = s, 0, 0
                if cur_fill > 0 and cur_fill + t > max_tokens:
                    cur_bin += 1
                    cur_fill = 0
                cur_fill += t
                bins.append(cur_bin)
            out = pdf[[id_col, "n_tokens", "shard"]].copy()
            out["bin"] = bins
            yield out

    # scale-adaptive pin (r7, ops.sizing): protects the Python stage from
    # AQE byte-coalescing without paying 64 worker round-trips on small
    # corpora; shard count still caps useful parallelism
    from tmframe_spark.ops.sizing import cpu_stage_partitions

    part = keyed.repartition(
        min(cpu_stage_partitions(keyed), n_shards), "shard"
    ).sortWithinPartitions("shard", "_h", id_col)
    return part.mapInPandas(fn, schema)


def bin_stats(packed: DataFrame, max_tokens: int) -> DataFrame:
    """Per-bin occupancy: (shard, bin, docs, tokens, utilization) — one
    exact division; oversized single-doc bins report utilization > 1."""
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        (F.sum("n_tokens") / F.lit(float(max_tokens))).alias("utilization"),
    )
