"""Stage-by-stage profile of the pages_pipeline fixed/variable cost
(VERDICT r1: ~90s unexplained fixed cost at the driver bench config).

Usage: python tools/profile_pages.py [n_pages] [cpus]
Forces full materialization with the noop sink so column pruning can't
fake a stage away.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)

    from pyspark.sql import functions as F

    from bano_spark import synth
    from bano_spark.geo import tiles
    from bano_spark.operators.pip_join import spatial_join
    from bano_spark.session import get_session
    from bano_spark.sources import pages as P

    spark = get_session("profile", cpus=cpus, shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")

    # warmup
    P.synth_pages_sql(spark, 50_000, partitions=cpus).count()

    def timed(label, fn):
        t0 = time.time()
        r = fn()
        dt = time.time() - t0
        print(f"{label:35s} {dt:8.2f}s", flush=True)
        return r

    pg = P.synth_pages_sql(spark, n, partitions=cpus * 2)
    timed("synth only (noop)", lambda: noop(pg))

    recs = P.extract_records(P.synth_pages_sql(spark, n, partitions=cpus * 2))
    timed("synth+extract (noop)", lambda: noop(recs))

    polys = (synth.commune_polygons_df(spark)
             .filter(F.col("admin_level") == 8)
             .withColumnRenamed("insee_com", "poly_insee"))

    def full(zoom, split):
        recs2 = P.extract_records(
            P.synth_pages_sql(spark, n, partitions=cpus * 2)).drop("insee_com")
        joined = spatial_join(recs2, polys, x="x", y="y", id_col="poly_insee",
                              verts_col="verts", zoom=zoom, broadcast=True,
                              split_refine=split)
        tiled = joined.select(
            "poly_insee",
            tiles.tile_x(F.col("x"), tiles.DEFAULT_ZOOM).alias("tx"),
            tiles.tile_y(F.col("y"), tiles.DEFAULT_ZOOM).alias("ty"))
        return tiled.groupBy("poly_insee").agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("tx", "ty").alias("n_tiles")).count()

    timed("full z16 single-pass (bench r1)", lambda: full(16, False))
    timed("full z16 split_refine", lambda: full(16, True))
    timed("full z18 split_refine", lambda: full(18, True))
    timed("full z19 split_refine", lambda: full(19, True))
    spark.stop()


if __name__ == "__main__":
    main()
