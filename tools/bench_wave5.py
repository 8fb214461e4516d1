"""Scale evidence for the wave-5 flagship operators.

1. snap_to_segments at 1M points x 50k segments: broadcast vs forced
   shuffle path, outputs asserted IDENTICAL (the auto-probe picks
   broadcast here; the shuffle run proves the big-segment-side path
   is correct and prices it).
2. staypoints + trip_legs at 10M pings / 10k tracks: the partitioned
   window + islands pipeline, pure-shuffle-once shape.

Usage: python tools/bench_wave5.py [n_points] [n_segments] [n_pings]
Appends one JSON line to stdout; quiet-box discipline applies
(BENCH.md: check load stamps).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bano_spark.session import get_session


def main():
    n_pts = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_segs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    n_pings = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_session("bench-wave5", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out = {"metric": "wave5_operators", "cpus": cpus,
           "load_1m_before": round(os.getloadavg()[0], 1)}

    # deterministic inputs spread over a ~200 km band (same arithmetic
    # family as synth.py, no external data)
    pts = spark.range(n_pts).selectExpr(
        "id AS event_id",
        "CAST(1000003.0 + (id * 2654435761 % 2147483648) % 200000 AS DOUBLE) AS x",
        "CAST(2000003.0 + (id * 40503 % 97911) % 200000 AS DOUBLE) AS y")
    segs = spark.range(n_segs).selectExpr(
        "id AS seg_id",
        "CAST(1000003.0 + (id * 48271 % 2147483648) % 200000 AS DOUBLE) AS x1",
        "CAST(2000003.0 + (id * 16807 % 2147483648) % 200000 AS DOUBLE) AS y1")
    segs = segs.selectExpr(
        "seg_id", "x1", "y1",
        "x1 + 100 + (seg_id * 7) % 1900 AS x2",
        "y1 + 100 + (seg_id * 11) % 1900 AS y2")

    from bano_spark.operators.mapmatch import snap_to_segments

    # warmup + count (JIT, python workers)
    snap_to_segments(pts, segs, 500.0).count()
    t0 = time.time()
    n_b = snap_to_segments(pts, segs, 500.0,
                           broadcast_segments=True).count()
    t_b = time.time() - t0
    t0 = time.time()
    n_s = snap_to_segments(pts, segs, 500.0,
                           broadcast_segments=False).count()
    t_s = time.time() - t0
    assert n_b == n_s, (n_b, n_s)
    # output identity, not just counts: checksum both paths
    agg = [F.sum(F.col("seg_id")).alias("s1"),
           F.round(F.sum("dist_m"), 0).alias("s2")]
    cb = snap_to_segments(pts, segs, 500.0,
                          broadcast_segments=True).agg(*agg).first()
    cs = snap_to_segments(pts, segs, 500.0,
                          broadcast_segments=False).agg(*agg).first()
    assert tuple(cb) == tuple(cs), (tuple(cb), tuple(cs))
    out["mapmatch"] = {
        "n_points": n_pts, "n_segments": n_segs, "matched": n_b,
        "broadcast_sec": round(t_b, 2),
        "shuffle_sec": round(t_s, 2),
        "broadcast_pts_per_sec": round(n_pts / t_b, 1),
        "paths_identical": True,
    }

    from bano_spark.operators.trajectory import staypoints, trip_legs

    # 1000 pings per track, dwell decided by a NON-AFFINE double hash:
    # any single multiplicative hash is affine in id, so a fixed
    # per-track ping stride makes its mod-10 value walk a constant-
    # step orbit — and for some strides (100000, 50000...) that orbit
    # contains no 3 consecutive dwell values at all (zero stays in
    # 10M pings, found the hard way; the assert below now guards it).
    # The floor-division between the two multiplies breaks linearity;
    # verified 3-runs exist for strides 1..123457.
    n_tracks = max(n_pings // 1000, 1)
    hh = ("(((id * 2654435761 % 2147483648) div 1024) * 2654435761"
          " + id * 2654435761 % 2147483648) % 2147483648")
    traj = spark.range(n_pings).selectExpr(
        f"id % {n_tracks} AS user_id",
        "id AS ts",
        f"CAST(1000003.0 + (id % {n_tracks}) * 500 + "
        f"CASE WHEN ({hh}) % 10 < 6 THEN ({hh}) % 11 ELSE "
        f"500 + ({hh}) % 700 END AS DOUBLE) AS x",
        "CAST(2000003.0 + (id * 40503 % 2147483648) % 11 AS DOUBLE) AS y")
    staypoints(traj, order_cols=["ts"]).count()  # warmup
    t0 = time.time()
    n_stays = staypoints(traj, order_cols=["ts"]).count()
    t_stay = time.time() - t0
    t0 = time.time()
    n_legs = trip_legs(traj, order_cols=["ts"]).count()
    t_legs = time.time() - t0
    assert n_stays > 0
    out["trajectory"] = {
        "n_pings": n_pings, "n_tracks": n_tracks,
        "n_stays": n_stays, "staypoints_sec": round(t_stay, 2),
        "stay_pings_per_sec": round(n_pings / t_stay, 1),
        "n_legs": n_legs, "trip_legs_sec": round(t_legs, 2),
    }
    out["load_1m_after"] = round(os.getloadavg()[0], 1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
