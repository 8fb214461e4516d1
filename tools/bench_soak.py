"""Sustained-throughput soak: one long pages-pipeline run after a full
warmup, with 1-minute load stamps so the box state is recorded next to
the number (this box has multi-minute external load bursts).

Usage: python tools/bench_soak.py [n_pages] [cpus]
       (defaults: 64_000_000 pages, 16 threads — the round-3 finding
       is that >16 task threads scales negatively on this box in any
       topology, so 16 is the sustained-throughput configuration)

Prints one JSON line: pages, cpus, seconds, pages_per_sec, and
load stamps before/after warmup and the timed run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 64_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import bench
    from bano_spark.session import get_session

    spark = get_session("soak", cpus=cpus,
                        shuffle_partitions=max(cpus * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")
    stamps = {"load_before_warmup": _load1()}
    # full-size warmup: C2 JIT + python-worker numpy imports dominate
    # the first run (measured 11.5s cold -> 4.4s warm on an identical
    # job); a small warmup does NOT warm the big-expression codegen
    bench.pages_pipeline(spark, n_pages)
    stamps["load_before_run"] = _load1()
    t = time.time()
    n = bench.pages_pipeline(spark, n_pages)
    sec = time.time() - t
    stamps["load_after_run"] = _load1()
    print(json.dumps({
        "metric": "pages_pipeline_soak", "pages": n_pages, "rows_out": n,
        "cpus": cpus, "value": round(sec, 1), "unit": "sec",
        "pages_per_sec": round(n_pages / sec, 1), **stamps}))
    spark.stop()


if __name__ == "__main__":
    main()
