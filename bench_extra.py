"""Per-query isolation harness (guide §1.4): times each benched query with
the same `.count()` methodology as the frozen bench.py, plus a noop-sink
full-materialization sample, and dumps `.explain("formatted")` plans to
plans/<tag>/<query>_<suffix>.txt for the optimization record.

Usage:
    PYTHONPATH=/root/repo python bench_extra.py [suffix] [query ...]

suffix defaults to 'before'. Also measures the fixed register_tables /
load_transcripts overhead that every query invocation pays.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from pyspark.sql import functions as F

PLAN_DIR = "plans/r07"

NAMES = [
    "flagship_rollup_pack_3tiers",
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


def _time(fn, reps=3):
    out = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        out.append(round(time.time() - t0, 3))
    return out


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from tmframe_spark import queries as Q
    from tmframe_spark.session import get_spark

    spark = get_spark(cores=cpus, shuffle_partitions=2 * cpus, app_name="tmframe-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(PLAN_DIR, exist_ok=True)
    sc = spark.sparkContext

    # warm exactly like bench.py
    import bench

    bench.flagship_points(spark, "/root/testdata/sf0.001")
    if os.path.isdir("/root/testdata/sf0.01"):
        bench.flagship_points(spark, "/root/testdata/sf0.01")

    results: dict[str, dict] = {}

    # fixed overhead: register_tables (parquet re-read) and transcript lineage
    from tmframe_spark.data.transcripts import load_transcripts, register_tables

    results["_register_tables"] = {"count": _time(lambda: register_tables(spark, sf_dir), 5)}
    results["_load_transcripts_count"] = {
        "count": _time(lambda: load_transcripts(spark, sf_dir).count(), 5)
    }

    reg = Q.queries()
    for name in NAMES:
        if only and name not in only:
            continue
        if name == "flagship_rollup_pack_3tiers":
            sc.setJobDescription("flagship")
            results[name] = {"count": _time(lambda: bench.flagship_points(spark, sf_dir))}
            sc.setJobDescription(None)
            continue
        q = reg[name]
        sc.setJobDescription(f"{name}: construct+count")
        counts = _time(lambda: q(spark, sf_dir).count())
        sc.setJobDescription(f"{name}: construct only")
        constructs = _time(lambda: q(spark, sf_dir))
        sc.setJobDescription(f"{name}: noop sink")
        noops = _time(
            lambda: q(spark, sf_dir).write.format("noop").mode("overwrite").save(), 1
        )
        sc.setJobDescription(None)
        df = q(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"{PLAN_DIR}/{name}_{suffix}.txt", "w") as f:
            f.write(plan)
        results[name] = {
            "count": counts,
            "count_median": statistics.median(counts),
            "construct": constructs,
            "noop": noops,
        }
        print(json.dumps({name: results[name]}), flush=True)

    print("==SUMMARY==")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
