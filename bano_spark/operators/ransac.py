"""RANSAC line fitting (Fischler & Bolles 1981) with DETERMINISTIC
hash-seeded minimal samples — the consensus-based robust regressor
completing huber_regression / theil_sen_slope: where Huber
down-weights and Theil-Sen medians, RANSAC votes, which survives the
gross-outlier regimes (20%+ wild points) that still bias both.

Determinism contract (no RNG anywhere in the engine): candidate s
picks the two points whose 0-based per-group row_number equals
(s * 2654435761 + 101) % n and (s * 1103515245 + 57) % n — a fixed
multiplicative hash of the candidate index against the group size, so
engine and oracle select identical samples on any topology.

Scale shape: THREE scans, all aggregates — (1) one window pass tags
row numbers and one conditional aggregate extracts the 2*S sample
points per group (S agg columns, no explode of the data); (2) the
O(groups x S) line table is broadcast back and ONE aggregate counts
inliers per candidate (integer counts — no double sums); (3) the
argmax line (ties to the lowest candidate id) is broadcast back and
ONE aggregate refits exact-integer OLS on its inliers and the naive
OLS on all rows. Every float is a fixed chain on exact integers
(line params from two integer points; |residual| <= tol compares are
per-row deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["ransac_line", "ransac_candidates"]

_A1, _B1 = 2654435761, 101
_A2, _B2 = 1103515245, 57


def _tagged(df: DataFrame, grp: str, x: str, y: str,
            id_col: str) -> DataFrame:
    w = Window.partitionBy(grp).orderBy(id_col)
    wc = Window.partitionBy(grp)
    return df.select(
        F.col(grp).alias("g"), F.col(x).cast("bigint").alias("x"),
        F.col(y).cast("bigint").alias("y"),
        (F.row_number().over(w) - 1).alias("r"),
        F.count(F.lit(1)).over(wc).alias("n"))


def _lines(pts: DataFrame, n_cand: int) -> DataFrame:
    aggs = [F.max("n").alias("n")]
    for s in range(n_cand):
        c1 = F.col("r") == (s * _A1 + _B1) % F.col("n")
        c2 = F.col("r") == (s * _A2 + _B2) % F.col("n")
        aggs += [F.max(F.when(c1, F.col("x"))).alias(f"x1_{s}"),
                 F.max(F.when(c1, F.col("y"))).alias(f"y1_{s}"),
                 F.max(F.when(c2, F.col("x"))).alias(f"x2_{s}"),
                 F.max(F.when(c2, F.col("y"))).alias(f"y2_{s}")]
    cand = pts.groupBy("g").agg(*aggs)
    cols = [F.col("g"), F.col("n")]
    for s in range(n_cand):
        b = ((F.col(f"y2_{s}") - F.col(f"y1_{s}")).cast("double")
             / (F.col(f"x2_{s}") - F.col(f"x1_{s}")).cast("double"))
        cols += [
            F.when(F.col(f"x2_{s}") != F.col(f"x1_{s}"), b)
            .alias(f"b_{s}"),
            F.when(F.col(f"x2_{s}") != F.col(f"x1_{s}"),
                   F.col(f"y1_{s}").cast("double")
                   - b * F.col(f"x1_{s}").cast("double"))
            .alias(f"a_{s}")]
    return cand.select(*cols)


def ransac_candidates(df: DataFrame, grp: str, x: str, y: str,
                      id_col: str, *, n_cand: int = 16,
                      tol: float = 2.5) -> DataFrame:
    """Per (group, candidate): the sampled line and its inlier count
    (-1 for degenerate verticals). Returns (grp, cand, slope, icept,
    inliers)."""
    pts = _tagged(df, grp, x, y, id_col)
    lines = _lines(pts, n_cand)
    j = pts.join(F.broadcast(lines.drop("n")), "g")
    aggs = []
    for s in range(n_cand):
        resid = (F.col("y").cast("double")
                 - (F.col(f"a_{s}")
                    + F.col(f"b_{s}") * F.col("x").cast("double")))
        aggs.append(F.sum(F.when(F.col(f"a_{s}").isNotNull()
                                 & (F.abs(resid) <= tol), 1)
                          .otherwise(0)).cast("bigint")
                    .alias(f"inl_{s}"))
    cnt = j.groupBy("g").agg(*aggs).join(F.broadcast(lines), "g")
    structs = ", ".join(
        f"named_struct('cand', {s}, 'slope', b_{s}, 'icept', a_{s}, "
        f"'inliers', IF(a_{s} IS NULL, CAST(-1 AS BIGINT), inl_{s}))"
        for s in range(n_cand))
    return (cnt.select("g", F.explode(F.expr(f"array({structs})"))
                       .alias("c"))
            .select(F.col("g").alias(grp), "c.cand",
                    F.round("c.slope", 6).alias("slope"),
                    F.round("c.icept", 6).alias("icept"),
                    F.col("c.inliers").alias("inliers")))


def ransac_line(df: DataFrame, grp: str, x: str, y: str,
                id_col: str, *, n_cand: int = 16,
                tol: float = 2.5) -> DataFrame:
    """Full RANSAC: best candidate by inliers (ties to lowest cand),
    exact-integer OLS refit on its inliers, naive OLS comparison.
    Returns (grp, n, best_cand, inliers, slope_ransac, icept_ransac,
    slope_ols, icept_ols)."""
    pts = _tagged(df, grp, x, y, id_col)
    lines = _lines(pts, n_cand)
    j = pts.join(F.broadcast(lines.drop("n")), "g")
    aggs = []
    for s in range(n_cand):
        resid = (F.col("y").cast("double")
                 - (F.col(f"a_{s}")
                    + F.col(f"b_{s}") * F.col("x").cast("double")))
        aggs.append(F.sum(F.when(F.col(f"a_{s}").isNotNull()
                                 & (F.abs(resid) <= tol), 1)
                          .otherwise(0)).cast("bigint")
                    .alias(f"inl_{s}"))
    cnt = j.groupBy("g").agg(*aggs).join(F.broadcast(lines), "g")
    structs = ", ".join(
        f"named_struct('cand', {s}, 'b', b_{s}, 'a', a_{s}, "
        f"'inl', IF(a_{s} IS NULL, CAST(-1 AS BIGINT), inl_{s}))"
        for s in range(n_cand))
    w = Window.partitionBy("g").orderBy(F.col("c.inl").desc(), "c.cand")
    best = (cnt.select("g", F.explode(F.expr(f"array({structs})"))
                       .alias("c"))
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("g", F.col("c.cand").alias("best_cand"),
                    F.col("c.b").alias("bb"), F.col("c.a").alias("ba"),
                    F.col("c.inl").alias("inliers")))
    j2 = pts.join(F.broadcast(best), "g")
    inl = (F.abs(F.col("y").cast("double")
                 - (F.col("ba") + F.col("bb")
                    * F.col("x").cast("double"))) <= tol)
    fit = j2.groupBy("g").agg(
        F.max("n").cast("bigint").alias("n"),
        F.max("best_cand").alias("best_cand"),
        F.max("inliers").alias("inliers"),
        F.sum(F.when(inl, 1).otherwise(0)).cast("bigint").alias("ni"),
        F.sum(F.when(inl, F.col("x")).otherwise(0)).cast("bigint")
        .alias("sx"),
        F.sum(F.when(inl, F.col("y")).otherwise(0)).cast("bigint")
        .alias("sy"),
        F.sum(F.when(inl, F.col("x") * F.col("y")).otherwise(0))
        .cast("bigint").alias("sxy"),
        F.sum(F.when(inl, F.col("x") * F.col("x")).otherwise(0))
        .cast("bigint").alias("sxx"),
        F.sum(F.col("x")).cast("bigint").alias("tx"),
        F.sum(F.col("y")).cast("bigint").alias("ty"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("txy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("txx"))

    def _ols(n, sx, sy, sxy, sxx):
        nd = F.col(n).cast("double")
        b = ((nd * F.col(sxy).cast("double")
              - F.col(sx).cast("double") * F.col(sy).cast("double"))
             / (nd * F.col(sxx).cast("double")
                - F.col(sx).cast("double") * F.col(sx).cast("double")))
        a = (F.col(sy).cast("double") - b * F.col(sx).cast("double")) / nd
        return b, a

    br, ar = _ols("ni", "sx", "sy", "sxy", "sxx")
    bo, ao = _ols("n", "tx", "ty", "txy", "txx")
    return fit.select(
        F.col("g").alias(grp), "n", "best_cand", "inliers",
        F.round(br, 6).alias("slope_ransac"),
        F.round(ar, 6).alias("icept_ransac"),
        F.round(bo, 6).alias("slope_ols"),
        F.round(ao, 6).alias("icept_ols"))
