"""Scaling-efficiency evidence for the north rule (N vs 4N cores).

No real cluster exists in this sandbox, so per BASELINE.md the
two-cluster-size criterion is evidenced by running the SAME pages
pipeline at local[N] and local[4N] on identical input and reporting
throughput at both plus efficiency = (pages/sec at 4N) / (4 * pages/sec
at N). Each level runs in its own subprocess (fresh JVM) so executor
thread counts are honest.

Usage: python tools/bench_scaling.py [n_small] [n_pages]
Writes/updates BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNNER = """
import json, os, sys, time
sys.path.insert(0, ".")
from bano_spark.session import get_session
import bench

n_cpus = int(sys.argv[1]); n_pages = int(sys.argv[2])
os.environ["SPARK_GRAFT_CPUS"] = str(n_cpus)
spark = get_session("scaling", cpus=n_cpus, shuffle_partitions=max(n_cpus, 16))
spark.sparkContext.setLogLevel("ERROR")
bench.pages_pipeline(spark, 50000)  # warmup (JIT, Arrow init)
t0 = time.time(); bench.pages_pipeline(spark, n_pages); dt = time.time() - t0
print(json.dumps({"cpus": n_cpus, "sec": dt, "pages_per_sec": n_pages / dt}))
spark.stop()
"""


def run_level(cpus: int, pages: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, str(cpus), str(pages)],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"level cpus={cpus} failed rc={out.returncode}")
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    pages = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    small = run_level(n_small, pages)
    big = run_level(n_small * 4, pages)
    eff = big["pages_per_sec"] / (4 * small["pages_per_sec"])
    result = {"pages": pages, "small": small, "big": big,
              "scaling_efficiency": round(eff, 3)}
    print(json.dumps(result))
    # append a run record; BENCH.md's analysis sections are
    # hand-maintained and must not be clobbered
    with open("BENCH.md", "a") as f:
        f.write(
            f"\n<!-- bench_scaling run: pages={pages} "
            f"N={small['cpus']}@{small['pages_per_sec']:,.0f}/s "
            f"4N={big['cpus']}@{big['pages_per_sec']:,.0f}/s "
            f"eff={eff:.3f} -->\n")


if __name__ == "__main__":
    main()
