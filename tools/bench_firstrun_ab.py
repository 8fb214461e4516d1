"""A/B the systematic first-pages-run anomaly (VERDICT r3, What's wrong #1).

Hypothesis (judge r3): the headline queries leave conciliate/spatial_join
persisted blocks resident and bench.py never released them before the
16M-page runs, so run 1 of the pages pipeline works under avoidable
executor memory pressure (10-60x slower than runs 2-3 in 6/6 samples).

Three arms, each in a FRESH subprocess (cached state is the hypothesis,
so arms must not share a JVM):

  control        — r3 bench behavior: 50k warmup, headline queries,
                   then 3x pages(N). No release.
  release        — same, but cache.release_all() + catalog.clearCache()
                   after the headline loop.
  release+warmup — release, plus one full-size pages(N) warmup run
                   (timed, disclosed, discarded) before the 3 samples.

Usage:  python tools/bench_firstrun_ab.py            # run all arms
        SPARK_GRAFT_AB_ARM=control python tools/bench_firstrun_ab.py
Output: one JSON line per arm with pages_runs_sec + load stamps.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = ["control", "release", "release+warmup", "fresh"]


def run_arm(arm: str) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "16000000"))

    import __spark_entry__ as E
    from bano_spark import cache
    from bano_spark.session import get_session
    from bench import HEADLINE, pages_pipeline

    spark = get_session(f"ab-{arm}", cpus=cpus, shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")
    load0 = round(os.getloadavg()[0], 1)

    pages_pipeline(spark, 50_000)
    if arm != "fresh":  # fresh = no headline queries at all: is run 1
        qs = E.queries()  # fast in a clean session? (isolates headline
        for name in HEADLINE:  # -query JVM residue from intrinsic ramp)
            qs[name](spark, sf_dir).count()

    warmup_sec = None
    if arm in ("release", "release+warmup"):
        cache.release_all()
        spark.catalog.clearCache()
    if arm == "release+warmup":
        t0 = time.time()
        pages_pipeline(spark, n_pages)
        warmup_sec = round(time.time() - t0, 3)

    runs = []
    for _ in range(3):
        t0 = time.time()
        pages_pipeline(spark, n_pages)
        runs.append(round(time.time() - t0, 3))

    print(json.dumps({
        "arm": arm,
        "pages": n_pages,
        "pages_runs_sec": runs,
        "warmup_full_sec": warmup_sec,
        "spread": round(max(runs) / min(runs), 2),
        "load_1m_before": load0,
        "load_1m_after": round(os.getloadavg()[0], 1),
    }), flush=True)
    spark.stop()


def main() -> None:
    arm = os.environ.get("SPARK_GRAFT_AB_ARM")
    if arm:
        run_arm(arm)
        return
    for arm in ARMS:
        env = dict(os.environ, SPARK_GRAFT_AB_ARM=arm)
        subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                       check=False)


if __name__ == "__main__":
    main()
