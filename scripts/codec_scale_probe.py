"""No-Spark parallel-process probe of the batch block encoder.

N identical single-thread OS processes each run the SAME pure-numpy
whole-conversation batch encode (the soak shape: 578 day blocks x 1440
slots x 17 data rows). The workload is perfectly parallel by construction
— no shuffle, no shared state — so any per-process throughput loss at
higher N is the BOX (memory bandwidth, SMT, hypervisor steal), not the
engine. Round-4 use: distinguishing the engine's scaling from the VM's
ceilings when interpreting scripts/scaling.py (see BENCH.md round-4 —
measured per-process throughput is FLAT to 16 processes, so the Spark
job's plateau past ~8 busy cores is the framework layer's shuffle/Arrow
throughput on this VM, not the codec or the plan).

Usage: python scripts/codec_scale_probe.py [proc_counts_csv]
Prints one JSON line per process count.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORK = r'''
import sys, time
sys.path.insert(0, sys.argv[2])
import numpy as np
from tmframe_spark.codec.blocks import encode_blocks_gapfilled_batch
rng = np.random.default_rng(int(sys.argv[1]))
STEP = 60_000_000_000
DAY = 86_400_000_000_000
def mk(nb, n, k):
    ns = np.full(nb, n, dtype=np.int64)
    t0s = (np.arange(nb) * DAY).astype(np.int64)
    bids = np.repeat(np.arange(nb), k)
    idx = np.concatenate(
        [np.sort(rng.choice(n, size=k, replace=False)) for _ in range(nb)]
    ).astype(np.int64)
    v0 = rng.integers(0, 500, size=len(bids)).astype(np.float64)
    v1 = rng.integers(1, 20, size=len(bids)).astype(np.int64)
    return t0s, ns, bids, idx, v0, v1
convs = [mk(578, 1440, 17) for _ in range(4)]
for t in convs:  # warm allocators/caches
    encode_blocks_gapfilled_batch(t[0], STEP, t[1], t[2], t[3], t[4], t[5])
t0 = time.time()
reps = 0
while time.time() - t0 < 12:
    for t in convs:
        encode_blocks_gapfilled_batch(t[0], STEP, t[1], t[2], t[3], t[4], t[5])
    reps += 1
print(reps * 4 * 578 * 1440 / (time.time() - t0))
'''


def main() -> None:
    counts = (
        [int(x) for x in sys.argv[1].split(",")] if len(sys.argv) > 1 else [1, 2, 4, 8, 16]
    )
    for nproc in counts:
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", WORK, str(i), REPO],
                stdout=subprocess.PIPE,
                text=True,
            )
            for i in range(nproc)
        ]
        rates = [float(p.communicate()[0].strip().splitlines()[-1]) for p in procs]
        print(
            json.dumps(
                {
                    "procs": nproc,
                    "per_proc_Mpts": round(sum(rates) / nproc / 1e6, 1),
                    "total_Mpts": round(sum(rates) / 1e6, 1),
                }
            )
        )


if __name__ == "__main__":
    main()
