"""16-thread contention attribution (the 1x4 -> 4x4 pair's analysis).

The 4x4 local-cluster level lands at 1.22-1.29M pages/sec on every
sample regardless of box state, while the 1x4 level swings 388-443k
with it — so the RAW N->4N ratio moves with the small level's luck,
not the engine. This harness prices the 16-thread hardware ceiling
directly:

  * zero-coordination baseline: 4 INDEPENDENT local[4] Spark
    processes running the pages pipeline CONCURRENTLY (16 task
    threads total demand, no shuffle between them, no executor
    protocol);
  * engine-attributable 4x4 efficiency
      = throughput(local-cluster[4,4]) / aggregate(4 x solo local[4]).

>= 1.0 means the coordinated cluster run extracts at least as much
from the box as four engines that never talk — every missing point of
the raw ratio is shared DRAM, which a real cluster does not share.

Usage: python tools/bench_contention16.py [pages_per_proc]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = """
import json, os, sys, time
sys.path.insert(0, ".")
from bano_spark.session import get_session
import bench

n_pages = int(sys.argv[1])
os.environ["SPARK_GRAFT_CPUS"] = "4"
spark = get_session("contend16_" + sys.argv[2], cpus=4, shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
bench.pages_pipeline(spark, n_pages)  # full-size warmup (JIT + faults)
t0 = time.time(); bench.pages_pipeline(spark, n_pages); dt = time.time() - t0
print(json.dumps({"proc": sys.argv[2], "sec": round(dt, 2),
                  "pages_per_sec": round(n_pages / dt, 1)}))
spark.stop()
"""


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load0 = os.getloadavg()[0]
    procs = [subprocess.Popen(
        [sys.executable, "-c", RUNNER, str(n_pages), str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, cwd=REPO) for i in range(4)]
    rates = []
    for p in procs:
        out, _ = p.communicate()
        line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
        rates.append(json.loads(line))
    agg = round(sum(r["pages_per_sec"] for r in rates), 1)
    print(json.dumps({
        "metric": "contention16_zero_coordination_aggregate",
        "pages_per_proc": n_pages, "procs": rates,
        "aggregate_pages_per_sec": agg,
        "load_1m_before": round(load0, 1),
        "load_1m_after": round(os.getloadavg()[0], 1)}))


if __name__ == "__main__":
    main()
