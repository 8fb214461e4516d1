"""Cell-bucketed point-in-polygon join — the engine's workhorse.

Replaces the reference's per-commune GIST spatial joins
(`bano/sql/hsnr_insee_nocache.sql:19-24` and friends, SURVEY.md J1-J8)
with a two-phase distributed plan:

  prune:  polygons -> exploded slippy-cell cover (interior vs boundary
          cells); points -> cell id; equi-join on the cell. The join is
          broadcast when the cover is small (the usual case: covers are
          a few cells per polygon at a well-chosen zoom), otherwise a
          shuffled hash join, optionally salted for hot cells
          (Paris-effect skew).
  refine: only candidates on *boundary* cells run the exact numpy
          ray-casting kernel inside an Arrow-batched UDF; interior-cell
          candidates are already exact.

At 100 TB this matters: the prune join shuffles only (cell, point)
pairs, the refine step touches the small boundary fraction, and no
geometry code runs on interior points at all.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F, types as T

from ..geo import geometry, tiles


def polygon_cover(polygons: DataFrame, zoom: int, id_col: str = "poly_id",
                  verts_col: str = "verts") -> DataFrame:
    """Distributed polygon -> (id, tx, ty, interior) cell cover.

    Runs the numpy rasterizer per polygon inside mapInPandas, so covers
    of millions of polygons scale horizontally.
    """
    out_schema = T.StructType([
        T.StructField(id_col, polygons.schema[id_col].dataType),
        T.StructField("tx", T.LongType()),
        T.StructField("ty", T.LongType()),
        T.StructField("interior", T.BooleanType()),
    ])

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids, txs, tys, ints = [], [], [], []
            for pid, verts in zip(pdf[id_col], pdf[verts_col]):
                v = np.array([list(p) for p in verts], dtype=np.float64)
                gx, gy, interior = geometry.cover_polygon(v, zoom)
                ids.extend([pid] * len(gx))
                txs.append(gx)
                tys.append(gy)
                ints.append(interior)
            if not txs:
                yield pd.DataFrame({id_col: [], "tx": [], "ty": [], "interior": []})
                continue
            yield pd.DataFrame({
                id_col: ids,
                "tx": np.concatenate(txs),
                "ty": np.concatenate(tys),
                "interior": np.concatenate(ints),
            })

    return polygons.select(id_col, verts_col).mapInPandas(gen, out_schema)


def spatial_join(
    points: DataFrame,
    polygons: DataFrame,
    *,
    x: str = "x",
    y: str = "y",
    id_col: str = "poly_id",
    verts_col: str = "verts",
    zoom: int = 10,
    broadcast: bool | None = None,
    salt: int | None = None,
    split_refine: bool = False,
) -> DataFrame:
    """Inner join of points to containing polygons.

    Returns the point columns plus all polygon columns except the ring.
    ``broadcast=None`` auto-chooses: broadcast the cover + a vertex dict
    when the polygon side is small (the 35k-commune case nationally),
    shuffle otherwise. ``salt`` replicates the cover N ways and spreads
    hot cells' points across N shuffle partitions — output-invariant.
    """
    spark = points.sparkSession

    pts = points.withColumn("_tx", tiles.tile_x(F.col(x), zoom)).withColumn(
        "_ty", tiles.tile_y(F.col(y), zoom)
    )

    if broadcast is None:
        # auto-probe kept cheap: column-pruned and row-capped, so the
        # extra job scans at most 100_001 ids instead of counting the
        # whole polygon table (ADVICE r1)
        broadcast = polygons.select(id_col).limit(100_001).count() <= 100_000

    vert_map: dict | None = None
    if broadcast:
        # one collect serves both the cover (computed driver-side — no
        # extra distributed job) and the refine vertex dict
        vert_map = {
            r[0]: np.array([list(p) for p in r[1]], dtype=np.float64)
            for r in polygons.select(id_col, verts_col).collect()
        }
        rows = []
        for pid, v in vert_map.items():
            gx, gy, interior = geometry.cover_polygon(v, zoom)
            rows.extend(zip([pid] * len(gx), gx.tolist(), gy.tolist(),
                            interior.tolist()))
        cover = spark.createDataFrame(
            rows, T.StructType([
                T.StructField(id_col, polygons.schema[id_col].dataType),
                T.StructField("tx", T.LongType()),
                T.StructField("ty", T.LongType()),
                T.StructField("interior", T.BooleanType()),
            ]))
    else:
        cover = polygon_cover(polygons, zoom, id_col, verts_col)

    if broadcast:
        cover_j = F.broadcast(cover.withColumnRenamed("tx", "_tx").withColumnRenamed("ty", "_ty"))
        cand = pts.join(cover_j, ["_tx", "_ty"])
    else:
        cov = cover.withColumnRenamed("tx", "_tx").withColumnRenamed("ty", "_ty")
        if salt and salt > 1:
            salts = F.array(*[F.lit(i) for i in range(salt)])
            cov = cov.withColumn("_salt", F.explode(salts))
            pts = pts.withColumn(
                "_salt", F.pmod(F.xxhash64(F.col(x), F.col(y)), F.lit(salt)).cast("int")
            )
            cand = pts.join(cov, ["_tx", "_ty", "_salt"]).drop("_salt")
        else:
            cand = pts.join(cov, ["_tx", "_ty"])

    # Single mapInArrow pass over ALL candidates: interior-cell rows pass
    # straight through (no geometry code), boundary-cell rows get the
    # exact numpy PIP. One pass — no easy/hard union, which would scan
    # the (possibly expensive) upstream twice. Arrow-native: only
    # x/y/id/interior are touched as numpy; payload columns remain Arrow
    # buffers end-to-end (pandas object-string round trips stop scaling
    # around 8 python workers; Arrow filtering doesn't).
    cand = cand.drop("_tx", "_ty")
    out_cols = [c for c in cand.columns if c not in ("interior", verts_col)]
    schema = cand.select(*out_cols).schema

    if split_refine:
        # Two-branch plan: interior-cell candidates never cross into
        # Python at all (pure JVM passthrough); only boundary-cell
        # candidates pay the Arrow round trip. The upstream is scanned
        # twice — worth it when the boundary fraction is small (raise
        # `zoom` to shrink it: each +1 quarters the boundary area) or
        # when the upstream is a cheap pushed-down scan. Callers with an
        # expensive upstream should persist() the points first.
        easy = cand.filter(F.col("interior")).select(*out_cols)
        hard = cand.filter(~F.col("interior"))
        hard_refined = _refine_exact(
            spark, hard, polygons, out_cols, schema, x, y, id_col, verts_col,
            vert_map, broadcast)
        out = easy.unionByName(hard_refined)
        return _attach_attrs(out, polygons, id_col, verts_col, broadcast)

    out = _refine_exact(spark, cand, polygons, out_cols, schema, x, y,
                        id_col, verts_col, vert_map, broadcast)
    return _attach_attrs(out, polygons, id_col, verts_col, broadcast)


def _refine_exact(spark, cand, polygons, out_cols, schema, x, y, id_col,
                  verts_col, vert_map, broadcast):
    """mapInArrow exact-PIP pass over candidate rows. Rows flagged
    interior pass straight through; the rest run the numpy kernel."""
    if broadcast:
        bc = spark.sparkContext.broadcast(vert_map)
        refine_input = cand

        def ring_of(b, pid, _first):
            return bc.value[pid]
    else:
        # large polygon side: never collect to the driver — carry the ring
        # through the shuffled join and read it per batch-group
        refine_input = cand.join(polygons.select(id_col, verts_col), id_col)

        def ring_of(b, pid, first):
            v = b.column(verts_col)[first].as_py()
            return np.array([list(p) for p in v], dtype=np.float64)

    def refine(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            if b.num_rows == 0:
                yield b.select(out_cols)
                continue
            keep = b.column("interior").to_numpy(zero_copy_only=False).copy()
            hard_m = ~keep
            if hard_m.any():
                px = b.column(x).to_numpy(zero_copy_only=False)
                py = b.column(y).to_numpy(zero_copy_only=False)
                ids = b.column(id_col)
                hard_ids = pc.unique(pc.filter(ids, pa.array(hard_m))).to_pylist()
                for pid in hard_ids:
                    m = pc.equal(ids, pid).to_numpy(zero_copy_only=False) & hard_m
                    first = int(np.flatnonzero(m)[0])
                    keep[m] = geometry.points_in_polygon(
                        px[m], py[m], ring_of(b, pid, first))
            yield b.filter(pa.array(keep)).select(out_cols)

    return refine_input.mapInArrow(refine, schema)


def _attach_attrs(out, polygons, id_col, verts_col, broadcast):
    """Re-attach non-ring polygon attributes after the refine (cover
    rows carry only the id)."""
    poly_attrs = [c for c in polygons.columns if c not in (verts_col,)]
    attrs = polygons.select(*poly_attrs)
    extra = [c for c in poly_attrs if c != id_col]
    if extra:
        out = out.join(F.broadcast(attrs) if broadcast else attrs, id_col)
    return out


def release_spatial_caches() -> None:
    """Unpersist operator caches (ADVICE r1: repeated calls in a long
    session accumulated cached blocks). Delegates to the shared
    registry, so conciliation's materialized input releases too."""
    from ..cache import release_all

    release_all()


def spatial_join_left(
    points: DataFrame,
    polygons: DataFrame,
    point_key: str,
    **kwargs,
) -> DataFrame:
    """LEFT OUTER spatial join (J5 semantics: highways LEFT JOIN suffixe
    ON ST_Intersects): matched rows come from the inner cell-bucketed
    join; points with no containing polygon are kept once with null
    polygon attributes. ``point_key`` must uniquely identify a point row.

    The matched side feeds BOTH output branches (rows + the anti-join
    key set); without a persist Spark executes the whole PIP subplan
    twice (measured 2x wall on the suffix-zone join). Persisted
    MEMORY_AND_DISK. Cache lifetime is bounded in long-lived sessions:
    each call releases the previous call's cache (unpersist is
    correctness-safe — at worst a recompute), and callers can release
    eagerly with release_spatial_caches() once the result is
    materialized."""
    from ..cache import keep

    release_spatial_caches()
    matched = keep(spatial_join(points, polygons, **kwargs))
    verts_col = kwargs.get("verts_col", "verts")
    poly_attrs = [c for c in polygons.columns if c != verts_col]
    unmatched = points.join(
        matched.select(point_key).distinct(), point_key, "left_anti")
    for c in poly_attrs:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(polygons.schema[c].dataType))
    return matched.unionByName(unmatched.select(matched.columns))
