"""Attribute scaling loss: engine coordination vs memory-bandwidth
contention.

A single box cannot add DRAM channels the way a cluster adds
executors, so raw local[N] -> local[4N] efficiency conflates two
things. This harness separates them:

  * contended per-core baseline: 4 INDEPENDENT single-core Spark
    processes running the pages pipeline CONCURRENTLY — zero shuffle,
    zero coordination, pure hardware contention;
  * engine-attributable efficiency = throughput(local[4]) /
    aggregate throughput(4 x concurrent local[1]).

If the engine-attributable ratio is ~1.0, the local[4] shortfall vs
4 x solo-local[1] is the box's bandwidth ceiling, which a real 4x
executor cluster does not share.

Usage: python tools/bench_contention.py [pages_per_proc]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

RUNNER = """
import json, os, sys, time
sys.path.insert(0, ".")
from bano_spark.session import get_session
import bench

n_pages = int(sys.argv[1])
os.environ["SPARK_GRAFT_CPUS"] = "1"
spark = get_session("contend" + sys.argv[2], cpus=1, shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
bench.pages_pipeline(spark, 50000)
t0 = time.time(); bench.pages_pipeline(spark, n_pages); dt = time.time() - t0
print(json.dumps({"sec": dt, "pages_per_sec": n_pages / dt}))
spark.stop()
"""


def main() -> None:
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen([sys.executable, "-c", RUNNER, str(pages), str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                         text=True, cwd=cwd)
        for i in range(4)
    ]
    t0 = time.time()
    outs = [p.communicate()[0] for p in procs]
    wall = time.time() - t0
    rates = []
    for o in outs:
        line = [l for l in o.strip().splitlines() if l.startswith("{")][-1]
        rates.append(json.loads(line)["pages_per_sec"])
    print(json.dumps({
        "pages_per_proc": pages,
        "concurrent_solo_rates": [round(r, 1) for r in rates],
        "aggregate_pages_per_sec": round(sum(rates), 1),
        "wall": round(wall, 1),
    }))


if __name__ == "__main__":
    main()
