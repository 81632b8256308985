"""Two-parallelism scaling run (BASELINE.md measurement protocol).

The north rule's criterion — >= 0.8 throughput scaling efficiency between N
and 4N executors — cannot use a real cluster in this sandbox, so (per the
driver instruction) we run the SAME flagship job on the SAME input at
local[8] and local[32], cold JVM each, and report throughput at both plus
efficiency = (pps_32 / pps_8) / 4. Results are written to BENCH.md.

Usage: python scripts/scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

RUNNER = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from tmframe_spark.session import get_spark
from bench import flagship_points
cores = int(sys.argv[1]); sf_dir = sys.argv[2]
spark = get_spark(cores=cores, shuffle_partitions=2 * cores, app_name=f"scaling-{{cores}}")
spark.sparkContext.setLogLevel("ERROR")
# warm the Python worker pool + JIT so we measure the job, not JVM startup
flagship_points(spark, "/root/testdata/sf0.001")
t0 = time.time()
points = flagship_points(spark, sf_dir)
wall = time.time() - t0
print(json.dumps({{"cores": cores, "points": points, "wall": round(wall, 3),
                   "pps": round(points / wall, 1)}}))
spark.stop()
"""


def run_at(cores: int, sf_dir: str, repo: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER.format(repo=repo), str(cores), sf_dir],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=repo,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    results = {}
    for cores in (8, 32):
        t0 = time.time()
        results[cores] = run_at(cores, sf_dir, repo)
        print(f"local[{cores}]: {results[cores]} (total {time.time()-t0:.0f}s incl JVM)")
    eff = (results[32]["pps"] / results[8]["pps"]) / 4.0
    summary = {
        "sf_dir": sf_dir,
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
