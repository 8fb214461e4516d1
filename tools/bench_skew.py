"""Hot-cell skew experiment: shuffle-path spatial join on an input
where half the points fall into ONE z12 cell (the Paris effect,
exaggerated), unsalted vs salted. Records evidence for the north
rule's explicit-skew-handling requirement.

Usage: python tools/bench_skew.py [n_points]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bano_spark import synth
from bano_spark.operators.pip_join import spatial_join
from bano_spark.session import get_session


def make_points(spark, n):
    """50% uniform over the commune grid, 50% at one hot spot."""
    base = spark.range(0, n, 1, 32).selectExpr(
        "id", "(id * 2654435761) % 2147483648 AS u")
    hot_x, hot_y = synth.PARIS0 + 5.0, synth.REGY0 + 5.0
    return base.selectExpr(
        "id AS event_id",
        f"CASE WHEN id % 2 = 0 THEN CAST({hot_x!r} + (u % 97) * 0.001 AS DOUBLE) "
        f"ELSE CAST({synth.REG0!r} + (u % 100000) + 0.5 AS DOUBLE) END AS x",
        f"CASE WHEN id % 2 = 0 THEN CAST({hot_y!r} + (u % 89) * 0.001 AS DOUBLE) "
        f"ELSE CAST({synth.REGY0!r} + ((u div 144) % 9000) + 0.25 AS DOUBLE) END AS y",
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    # simulate the large-polygon-side regime (no broadcast possible):
    # AQE would otherwise convert the tiny test cover to a runtime
    # broadcast and no cell-keyed shuffle would exist to skew
    spark = get_session("skew", cpus=cpus, shuffle_partitions=cpus * 4,
                        extra={"spark.sql.autoBroadcastJoinThreshold": "-1",
                               "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
                               "spark.sql.adaptive.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    pts = make_points(spark, n)
    polys = synth.commune_polygons_df(spark).filter(F.col("admin_level") == 8)

    # generic warmup (JIT, python workers) — NOT the measured plan;
    # re-collecting the same DataFrame would skip its completed shuffle
    # map stages and time only the final stage
    spatial_join(pts.limit(50000), polys, id_col="insee_com", zoom=12,
                 broadcast=False).groupBy("insee_com").count().collect()
    results = {}
    for label, salt in (("unsalted", None), ("salt=8", 8), ("salt=32", 32)):
        j = spatial_join(pts, polys, id_col="insee_com", zoom=12,
                         broadcast=False, salt=salt)
        agg = j.groupBy("insee_com").count()
        t0 = time.time()
        rows = {r.insee_com: r["count"] for r in agg.collect()}
        dt = time.time() - t0
        results[label] = (dt, sum(rows.values()))
        print(f"{label:10s} {dt:7.2f}s  rows={sum(rows.values())}")
    counts = {v[1] for v in results.values()}
    assert len(counts) == 1, f"salting changed the output! {counts}"
    print("output identical across salt levels:", counts.pop())
    spark.stop()


if __name__ == "__main__":
    main()
