"""Distributed Lloyd's k-means over embedding columns.

The trainable-codebook counterpart to the deterministic quantizers in
`similarity.py` (ivf_cell's axis cells, pq_encode's axis codebook):
run a few Lloyd iterations to get data-adapted centroids for IVF
cells or PQ codebooks.

Scale shape per iteration: assignment is a pure column expression
(the k centroids are literals — k*dim doubles — so no join at all),
and the centroid update is one hash aggregation over (cluster,
dimension) pairs via posexplode, O(k*dim) rows collected to the
driver. Nothing ever shuffles the vectors themselves except the
posexplode aggregation, which carries (cluster, pos, component).

Determinism (and hence oracle-exactness in plain SQL): init is the k
smallest-id vectors; updated centroid components are rounded to 6
decimals and distances to 4 before any comparison, so both engines
iterate on identical quantized state regardless of their summation
order, and argmin ties break on the lowest cluster id in both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dist_cols(vec_col: str, cents: list[list[float]], dim: int):
    """Squared distance to each centroid as ONE higher-order fold per
    centroid: aggregate(zip_with(vec, literal_centroid, diff^2)).
    aggregate folds left-to-right in element order, i.e. the exact
    floating-point association (((t1+t2)+t3)+...) of the unrolled sum
    this replaces — results are bit-identical, but the plan carries 1
    expression per centroid instead of ``dim`` chained adds (64x less
    codegen to compile per assignment pass)."""
    dists = []
    for c in cents:
        lit = "array(" + ", ".join(
            f"CAST({float(c[i])!r} AS DOUBLE)" for i in range(dim)) + ")"
        acc = F.expr(
            f"aggregate(zip_with({vec_col}, {lit},"
            " (x, c) -> (CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c)),"
            " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
        dists.append(F.round(acc, 4))
    return dists


def _assign(vecs: DataFrame, cents: list[list[float]], vec_col: str,
            dim: int) -> DataFrame:
    dists = _dist_cols(vec_col, cents, dim)
    best = F.least(*dists)
    cl = F.when(dists[0] == best, F.lit(0))
    for j in range(1, len(cents)):
        cl = cl.when(dists[j] == best, F.lit(j))
    return vecs.withColumn("cluster", cl.cast("int")) \
        .withColumn("dist", best)


def kmeans_assign(vecs: DataFrame, k: int = 4, iters: int = 2,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  dim: int = 64) -> DataFrame:
    """(id, cluster, dist) after ``iters`` Lloyd iterations from the
    deterministic init (vectors with the k smallest ids). ``dist`` is
    the squared distance to the final centroid, rounded to 4."""
    init_rows = (vecs.orderBy(id_col).limit(k)
                 .select(vec_col).collect())
    cents = [[float(x) for x in r[0]] for r in init_rows]
    for _ in range(iters):
        assigned = _assign(vecs, cents, vec_col, dim)
        upd = (assigned
               .select("cluster", F.posexplode(F.col(vec_col))
                       .alias("pos", "comp"))
               .groupBy("cluster", "pos")
               .agg(F.round(F.avg(F.col("comp").cast("double")), 6)
                    .alias("c"))
               .collect())
        new = {j: list(cents[j]) for j in range(k)}
        for r in upd:
            new[r["cluster"]][r["pos"]] = float(r["c"])
        cents = [new[j] for j in range(k)]
    return _assign(vecs, cents, vec_col, dim).select(
        id_col, "cluster", "dist")
