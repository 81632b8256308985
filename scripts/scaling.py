"""Two-parallelism scaling run (BASELINE.md measurement protocol).

The north rule's criterion — >= 0.8 throughput scaling efficiency between N
and 4N executors at 10^12-turn scale — cannot use a real cluster in this
sandbox, so (per the driver instruction) we run the SAME flagship rollup job
on the SAME input at local[8] and local[32], cold JVM each, and report
throughput at both plus efficiency = (pps_32 / pps_8) / 4.

Protocol:
1. Materialize the seeded synthetic transcript table (seed=42) to parquet
   ONCE — the shared input, exactly what an ingested table would be
   (turn_idx stored, not recomputed per query).
2. Per parallelism: fresh JVM, warmup at 1% size (codegen compiled, Python
   worker pool spawned), then the timed flagship: 1m/1h/1d rollup + fused
   gap-fill block pack + decode-verify sample.

Usage: python scripts/scaling.py [n_turns] [n_convs]
Writes scaling_results.json; BENCH.md narrates the results.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

GEN = """
import sys
sys.path.insert(0, {repo!r})
from tmframe_spark.session import get_spark
from tmframe_spark.data.transcripts import synth_transcripts
n_turns, n_convs, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
spark = get_spark(cores=32, app_name="scaling-gen")
spark.sparkContext.setLogLevel("ERROR")
synth_transcripts(spark, n_turns, n_convs).write.mode("overwrite").parquet(out)
spark.stop()
"""

RUNNER = """
import json, sys, time
sys.path.insert(0, {repo!r})
from tmframe_spark.session import get_spark
from tmframe_spark.ops.rollup import with_ts_ns
from bench import flagship_from_transcripts
cores, inp, warm = int(sys.argv[1]), sys.argv[2], sys.argv[3]
spark = get_spark(cores=cores, shuffle_partitions=2 * cores, app_name=f"scaling-{{cores}}")
spark.sparkContext.setLogLevel("ERROR")
# warmup: same plan shapes on the small table -> codegen + worker pool ready
flagship_from_transcripts(with_ts_ns(spark.read.parquet(warm)))
t = with_ts_ns(spark.read.parquet(inp))
t0 = time.time()
points = flagship_from_transcripts(t)
wall = time.time() - t0
print(json.dumps({{"cores": cores, "points": points, "wall": round(wall, 3),
                   "pps": round(points / wall, 1)}}))
spark.stop()
"""


def run(code: str, args: list[str], repo: str) -> str:
    env = dict(os.environ, SPARK_DRIVER_MEM="64g")
    out = subprocess.run(
        [sys.executable, "-c", code.format(repo=repo), *args],
        capture_output=True, text=True, timeout=3600, cwd=repo, env=env,
    )
    return out


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    base = tempfile.mkdtemp(prefix="tmframe_scaling_")
    inp = os.path.join(base, "transcripts")
    warm = os.path.join(base, "warmup")
    print(f"materializing inputs under {base} ...")
    for path, nt, nc in [(inp, n_turns, n_convs), (warm, max(n_turns // 100, 10_000), max(n_convs // 100, 10))]:
        r = run(GEN, [str(nt), str(nc), path], repo)
        if r.returncode != 0:
            raise RuntimeError(r.stderr[-3000:])

    results = {}
    for cores in (8, 32):
        t0 = time.time()
        r = run(RUNNER, [str(cores), inp, warm], repo)
        lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if not lines:
            raise RuntimeError(f"runner failed:\n{r.stderr[-3000:]}")
        results[cores] = json.loads(lines[-1])
        print(f"local[{cores}]: {results[cores]} (total {time.time()-t0:.0f}s incl JVM)")
    eff = (results[32]["pps"] / results[8]["pps"]) / 4.0
    summary = {
        "protocol": "same flagship job, same materialized seeded synthetic parquet input, cold JVMs, warmed codegen",
        "input": {"n_turns": n_turns, "n_convs": n_convs, "seed": 42},
        "local8": results[8],
        "local32": results[32],
        "scaling_efficiency_8_to_32": round(eff, 3),
        "gate": ">= 0.8",
        "passes": eff >= 0.8,
    }
    print(json.dumps(summary))
    with open(os.path.join(repo, "scaling_results.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
