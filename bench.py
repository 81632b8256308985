"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec},
 "sf": ..., plus points/sec detail for the flagship rollup+encode}.

Scaling evidence (BASELINE.md protocol) is produced by scripts/scaling.py,
which runs the flagship at two parallelism levels in fresh JVMs.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F


def flagship_from_transcripts(transcripts) -> int:
    """Full rollup cascade: gap-filled 1m + 1h + 1d tiers, every tier packed
    into delta-of-delta/Gorilla TMFRAME blocks, plus a decode-verify sample.
    Returns total rolled-up points materialized+encoded.

    One collect drives all three tiers: the 1m rollup is persisted and its
    exchange reused across the cascade branches (no recomputation, no extra
    driver round-trips)."""
    from tmframe_spark.codec.udfs import pack_rollup_blocks, unpack_blocks
    from tmframe_spark.ops.rollup import cascade_up, rollup

    # optional (conv, calendar-chunk) pack split for the hot-conversation
    # straggler: convs above this many rollup rows re-key by calendar chunk
    # (pack_rollup_blocks docstring; bytes unchanged — tests/test_pack_fused)
    split = os.environ.get("SPARK_GRAFT_SPLIT_DENSE")
    split = int(split) if split else None

    # persist the data-sized 1m rollup: it feeds all three tiers, and at
    # cluster scale each executor caches only its partitions. Gap-filled
    # spine rows never exist as rows at all — pack_rollup_blocks synthesizes
    # them inside the UDF (byte-identical to gap_fill->pack_blocks;
    # tests/test_pack_fused.py).
    m_data = rollup(transcripts, "1m").persist()
    h_data = cascade_up(m_data, "1h")
    tiers = {
        ("1m", "day"): m_data,
        ("1h", "month"): h_data,
        ("1d", "year"): cascade_up(h_data, "1d"),
    }
    all_blocks = None
    sample_blocks = None
    for (tier, unit), df in tiers.items():
        blocks = pack_rollup_blocks(
            df, tier, unit, split_dense_rows=split
        ).withColumn("tier", F.lit(tier))
        if tier == "1d":
            # persist the coarsest tier's blocks (a few KB per conv-year):
            # the decode-verify action below reads them from cache instead
            # of RE-RUNNING the 1h+1d cascade + pack — the recompute was a
            # ~20 s, barely-parallel tail on the scaling-gate job (measured
            # in BENCH.md round-4)
            blocks = blocks.persist()
            sample_blocks = blocks
        all_blocks = blocks if all_blocks is None else all_blocks.unionByName(blocks)
    # one action for all three tiers (fewer driver round-trips)
    total = int(all_blocks.agg(F.sum("n_points")).collect()[0][0] or 0)
    # decode-verify sample: smallest tier decoded end-to-end (from cache)
    decoded = unpack_blocks(sample_blocks, ["conv_id", "grp"], v0="v0", v1="v1").count()
    assert decoded > 0
    sample_blocks.unpersist()
    m_data.unpersist()
    return total


def flagship_points(spark, sf_dir: str) -> int:
    """Flagship over the driver-provided events-derived transcripts."""
    from tmframe_spark.data.transcripts import load_transcripts
    from tmframe_spark.ops.rollup import with_ts_ns

    return flagship_from_transcripts(with_ts_ns(load_transcripts(spark, sf_dir)))


def flagship_synth_points(spark, n_turns: int, n_convs: int) -> int:
    """Flagship over the seeded synthetic transcript table (BASELINE.md
    measurement protocol: deterministic, scale-parameterized, generated
    in parallel on executors via spark.range)."""
    from tmframe_spark.data.transcripts import synth_transcripts

    return flagship_from_transcripts(synth_transcripts(spark, n_turns, n_convs))


def _median3(fn) -> float:
    """Median of 3 back-to-back repeats — the steady-state figure. The VM's
    cold-JIT band is ~±1 s per query, which made single cold samples
    generate phantom round-over-round deltas twice (r3 hash_dedup, r4
    merge_rank/range_serving/msgpack — round-4 verdict #2); medians measure
    the engine, not C2 compilation."""
    import statistics

    reps = []
    for _ in range(3):
        t0 = time.time()
        fn()
        reps.append(time.time() - t0)
    return round(statistics.median(reps), 3)


def bench_queries(spark, sf_dir: str) -> tuple[dict[str, float], dict[str, float]]:
    """Representative operator set beyond the flagship. Returns (cold,
    median3): the first sample of each query plus the median of 3 further
    back-to-back repeats."""
    from tmframe_spark import queries as Q

    names = [
        "asof_last_at_or_before",
        "hash_dedup",
        "merge_rank",
        "tfgroup_minute_counts",
        "minhash_lsh_pairs",
        "simhash",
        "ann_topk",
        "token_stats_by_lang",
        "sessionize",
        "count_window_dedup",
        "msgpack_decode",
        "range_serving",
    ]
    cold, median = {}, {}
    reg = Q.queries()
    for name in names:
        q = reg[name]
        t0 = time.time()
        q(spark, sf_dir).count()
        cold[name] = round(time.time() - t0, 3)
        median[name] = _median3(lambda: q(spark, sf_dir).count())
    return cold, median


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from tmframe_spark.session import get_spark

    spark = get_spark(cores=cpus, shuffle_partitions=2 * cpus, app_name="tmframe-bench")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = -1.0

    # warm codegen + Python worker pools + tiered JIT so the timed figures
    # measure steady-state throughput, not one-time JVM/worker spawn.
    # Measured: a single small warmup leaves C2 compilation still kicking in
    # during the timed run (11.5s -> 7.5s over four sf0.1 repeats); two
    # ascending warmups land the first timed run at steady state.
    flagship_points(spark, "/root/testdata/sf0.001")
    warm_dir = "/root/testdata/sf0.01"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir.rstrip("/"):
        flagship_points(spark, warm_dir)

    t0 = time.time()
    points = flagship_points(spark, sf_dir)
    flagship_sec = round(time.time() - t0, 3)
    flagship_med = _median3(lambda: flagship_points(spark, sf_dir))

    queries = {"flagship_rollup_pack_3tiers": flagship_sec}
    medians = {"flagship_rollup_pack_3tiers": flagship_med}
    cold_q, med_q = bench_queries(spark, sf_dir)
    queries.update(cold_q)
    medians.update(med_q)
    total = round(sum(queries.values()), 3)

    print(
        json.dumps(
            {
                "metric": "rolled-up points/sec (encode+aggregate) across 1m/1h/1d tiers",
                "value": total,
                "unit": "sec",
                "queries": queries,
                # steady-state figures: compare THESE round-over-round (the
                # cold samples above sit in a ±1 s JIT band — see _median3)
                "queries_median3": medians,
                "value_median3": round(sum(medians.values()), 3),
                "sf": sf,
                "cpus": cpus,
                "rolled_points": points,
                "points_per_sec": round(points / flagship_sec, 1),
                "points_per_sec_median3": round(points / flagship_med, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
