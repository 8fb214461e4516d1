"""Shuffle-bytes evidence for the r3 ring-piggyback refine (VERDICT r2 #2).

Compares, on a few-polygons-with-huge-rings fixture (the Paris-coastline
shape the r2 verdict flagged), the non-broadcast refine's shuffle volume:

  old (r2) design: candidates JOIN polygons(id, verts) — the ring is
      duplicated onto EVERY boundary-candidate row in the shuffle;
  new (r3) design: one ring row per (polygon, salt) is unioned into the
      candidate stream — rings cross the wire refine_salt times total.

Both paths produce identical matches (asserted). The headline metric is
the JVM->Python Arrow transfer volume of the refine stage (accumulator
over batch nbytes): shuffle-write bytes are similar for both designs
(either join ships each ring once at the exchange) — the r2 design's
O(candidates x ring) blowup happens when the joined rows are
MATERIALIZED into the Python crossing. Total shuffle write bytes (REST
stage metrics, UI enabled) and wall time are reported too. Usage:

    python tools/bench_ring_shuffle.py [n_points] [ring_verts]
"""

from __future__ import annotations

import json
import sys
import urllib.request

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F, types as T  # noqa: E402

from bano_spark import synth  # noqa: E402
from bano_spark.operators import pip_join  # noqa: E402
from bano_spark.session import get_session  # noqa: E402

ZOOM = 13
POLY_SCHEMA = T.StructType([
    T.StructField("poly_id", T.StringType()),
    T.StructField("verts", T.ArrayType(T.ArrayType(T.DoubleType()))),
])


def fixture(spark, n_points: int, ring_verts: int):
    rows = []
    for i in range(6):
        cx = synth.REG0 + 8000.0 + 15000.0 * i
        # the synthetic point band is ~1.6km tall starting at REGY0 —
        # center the circles inside it so boundary cells carry real load
        cy = synth.REGY0 + 800.0
        r = 6000.0
        ang = 2 * np.pi * np.arange(ring_verts) / ring_verts
        verts = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)
        verts = np.vstack([verts, verts[:1]])
        rows.append((f"p{i}", verts.tolist()))
    polys = spark.createDataFrame(rows, POLY_SCHEMA)
    pts = spark.sql(synth.points_select_sql(
        "spark", f"(SELECT id AS event_id FROM range({n_points}))"))
    return pts.repartition(16), polys


def shuffle_write_bytes(spark) -> int:
    app = spark.sparkContext.applicationId
    url = (f"http://localhost:4040/api/v1/applications/{app}"
           "/stages?status=complete")
    stages = json.load(urllib.request.urlopen(url))
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def run_old(n_points: int, ring_verts: int):
    """r2 design: ring joined per candidate row."""
    spark = get_session("ring-old", cpus=8, shuffle_partitions=16,
                        extra={"spark.ui.enabled": "true"})
    acc = spark.sparkContext.accumulator(0)
    pts, polys = fixture(spark, n_points, ring_verts)
    from bano_spark.geo import geometry, tiles

    p = pts.withColumn("_tx", tiles.tile_x(F.col("x"), ZOOM)).withColumn(
        "_ty", tiles.tile_y(F.col("y"), ZOOM))
    cov = pip_join.polygon_cover(polys, ZOOM).withColumnRenamed(
        "tx", "_tx").withColumnRenamed("ty", "_ty")
    cand = p.join(cov, ["_tx", "_ty"]).drop("_tx", "_ty")
    hard = cand.filter(~F.col("interior"))
    joined = hard.join(polys.select("poly_id", "verts"), "poly_id")
    out_cols = [c for c in cand.columns if c not in ("interior", "verts")]
    schema = cand.select(*out_cols).schema

    def refine(batches):
        import pyarrow as pa
        import pyarrow.compute as pc
        for b in batches:
            acc.add(b.nbytes)
            if b.num_rows == 0:
                continue
            keep = np.zeros(b.num_rows, dtype=bool)
            px = b.column("x").to_numpy(zero_copy_only=False)
            py = b.column("y").to_numpy(zero_copy_only=False)
            ids = b.column("poly_id")
            for pid in pc.unique(ids).to_pylist():
                m = pc.equal(ids, pid).to_numpy(zero_copy_only=False)
                first = int(np.flatnonzero(m)[0])
                ring = np.array(
                    [list(v) for v in b.column("verts")[first].as_py()],
                    dtype=np.float64)
                keep[m] = geometry.points_in_polygon(px[m], py[m], ring)
            yield b.filter(pa.array(keep)).select(out_cols)

    easy = cand.filter(F.col("interior")).select(*out_cols)
    matched = easy.unionByName(joined.mapInArrow(refine, schema))
    import time
    t0 = time.time()
    ids = sorted(r.event_id for r in matched.select("event_id").collect())
    wall = time.time() - t0
    sb = shuffle_write_bytes(spark)
    spark.stop()
    return ids, sb, acc.value, wall


def run_new(n_points: int, ring_verts: int):
    spark = get_session("ring-new", cpus=8, shuffle_partitions=16,
                        extra={"spark.ui.enabled": "true"})
    pip_join._BATCH_BYTES_ACC = spark.sparkContext.accumulator(0)
    pts, polys = fixture(spark, n_points, ring_verts)
    matched = pip_join.spatial_join(
        pts, polys, id_col="poly_id", zoom=ZOOM, broadcast=False,
        split_refine=True)
    import time
    t0 = time.time()
    ids = sorted(r.event_id for r in matched.select("event_id").collect())
    wall = time.time() - t0
    sb = shuffle_write_bytes(spark)
    arrow = pip_join._BATCH_BYTES_ACC.value
    pip_join._BATCH_BYTES_ACC = None
    spark.stop()
    return ids, sb, arrow, wall


def main():
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    ring_verts = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    old_ids, old_shuf, old_arrow, old_wall = run_old(n_points, ring_verts)
    new_ids, new_shuf, new_arrow, new_wall = run_new(n_points, ring_verts)
    assert old_ids == new_ids, (
        f"output mismatch: {len(old_ids)} vs {len(new_ids)} rows")
    print(json.dumps({
        "fixture": {"points": n_points, "polys": 6, "ring_verts": ring_verts},
        "matched_rows": len(new_ids),
        "old": {"python_arrow_bytes": old_arrow,
                "shuffle_write_bytes": old_shuf,
                "wall_sec": round(old_wall, 2)},
        "new": {"python_arrow_bytes": new_arrow,
                "shuffle_write_bytes": new_shuf,
                "wall_sec": round(new_wall, 2)},
        "arrow_reduction_x": round(old_arrow / max(new_arrow, 1), 2),
    }))


if __name__ == "__main__":
    main()
