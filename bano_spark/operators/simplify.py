"""Douglas-Peucker polyline simplification as an Arrow-batched kernel.

The missing line-geometry member next to ``geodesy.py``'s length/
crossing ops (PostGIS ``ST_Simplify``; BANO draws street geometries
whose vertex counts this op bounds before export). One polyline per
row; the kernel is an explicit-stack DP over numpy arrays — no
recursion limits, no Python per-vertex loop beyond the stack rounds.

Determinism contract (what makes the op oracle-exact in ANY engine):
- distance measure: squared perpendicular distance to the infinite
  chord line, computed as num^2 / den with
  num = (bx-ax)*(ay-y) - (ax-x)*(by-ay), den = chord length^2 —
  three IEEE-exact ops any engine reproduces bit-for-bit;
- split rule: strict ``d2 > eps^2``;
- tie rule: FIRST index attains the max (numpy argmax order ==
  ``ORDER BY d2 DESC, idx ASC``).

Scale shape: rows (polylines) are independent — the operator is
embarrassingly parallel over whatever partitioning the input already
has, zero shuffle. Arrow moves only the vertex arrays of each batch;
output is (line_id, idx) kept pairs, never the coordinates twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T


def _dp_keep(xs, ys, eps2: float):
    """Indices kept by DP on one polyline (numpy arrays)."""
    import numpy as np

    n = len(xs)
    if n <= 2:
        return list(range(n))
    keep = [0, n - 1]
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        ax, ay, bx, by = xs[lo], ys[lo], xs[hi], ys[hi]
        px, py = xs[lo + 1:hi], ys[lo + 1:hi]
        num = (bx - ax) * (ay - py) - (ax - px) * (by - ay)
        den = (bx - ax) * (bx - ax) + (by - ay) * (by - ay)
        if den == 0.0:
            d2 = (px - ax) * (px - ax) + (py - ay) * (py - ay)
        else:
            d2 = (num * num) / den
        m = int(np.argmax(d2))  # first max, == ORDER BY d2 DESC, idx ASC
        if d2[m] > eps2:
            mid = lo + 1 + m
            keep.append(mid)
            stack.append((lo, mid))
            stack.append((mid, hi))
    return sorted(keep)


def simplify_polylines(lines: DataFrame, eps: float, *,
                       id_col: str = "line_id",
                       xs_col: str = "xs", ys_col: str = "ys",
                       idx_col: str | None = None) -> DataFrame:
    """(line_id, xs, ys[, idxs]) -> kept (line_id, idx) pairs under DP
    with tolerance ``eps``. Arrays must be in vertex order; ``idx``
    reports positions, or the caller's original vertex ids when
    ``idx_col`` names a parallel id array."""
    eps2 = float(eps) * float(eps)
    out_schema = T.StructType([
        lines.schema[id_col],
        T.StructField("idx", T.LongType()),
    ])
    cols = [id_col, xs_col, ys_col] + ([idx_col] if idx_col else [])

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, idxs = [], []
            orig = pdf[idx_col] if idx_col else None
            for i, (lid, xs, ys) in enumerate(
                    zip(pdf[id_col], pdf[xs_col], pdf[ys_col])):
                xs = np.asarray(xs, dtype=np.float64)
                ys = np.asarray(ys, dtype=np.float64)
                for k in _dp_keep(xs, ys, eps2):
                    ids.append(lid)
                    idxs.append(int(orig.iloc[i][k]) if idx_col else k)
            yield pd.DataFrame({id_col: ids, "idx": idxs})

    return lines.select(*cols).mapInPandas(gen, out_schema)


def chaikin_smooth(pts, *, group_col: str = "user_id",
                   seq_col: str = "seq", x_col: str = "x",
                   y_col: str = "y", iters: int = 2):
    """Chaikin corner-cutting polyline smoothing (the cartographic
    complement of Douglas-Peucker simplification), in EXPLODED row
    form — each vertex is a row, so a polyline of any length streams
    through lag windows instead of living in one array cell: per
    adjacent pair P, Q the round emits 3/4·P + 1/4·Q at seq + 1/4 and
    1/4·P + 3/4·Q at seq + 3/4 (open-curve variant: endpoints kept).
    With integer-valued input coordinates every smoothed coordinate
    after k rounds is an exact multiple of 4^-k — bit-identical
    across engines, no rounding needed.

    Scale shape: per round one lag window partitioned by group plus
    two cheap unions for the kept endpoints — the sessionization
    exchange, repeated ``iters`` times with localCheckpoint."""
    from pyspark.sql import Window, functions as F

    cur = pts.select(F.col(group_col).alias("_g"),
                     F.col(seq_col).cast("double").alias("_s"),
                     F.col(x_col).cast("double").alias("_x"),
                     F.col(y_col).cast("double").alias("_y"))
    for _ in range(iters):
        w = Window.partitionBy("_g").orderBy("_s")
        lagged = (cur
                  .withColumn("_ps", F.lag("_s").over(w))
                  .withColumn("_px", F.lag("_x").over(w))
                  .withColumn("_py", F.lag("_y").over(w)))
        segs = lagged.filter(F.col("_ps").isNotNull())
        # sequence keys are parameterized WITHIN the segment
        # (ps + t*(s-ps)), not offset by a constant: constant offsets
        # collide with neighboring keys from round 2 on, which would
        # make the vertex order ambiguous
        q = segs.select(
            "_g",
            (F.col("_ps") + (F.col("_s") - F.col("_ps")) * 0.25)
            .alias("_s"),
            (F.col("_px") * 0.75 + F.col("_x") * 0.25).alias("_x"),
            (F.col("_py") * 0.75 + F.col("_y") * 0.25).alias("_y"))
        r = segs.select(
            "_g",
            (F.col("_ps") + (F.col("_s") - F.col("_ps")) * 0.75)
            .alias("_s"),
            (F.col("_px") * 0.25 + F.col("_x") * 0.75).alias("_x"),
            (F.col("_py") * 0.25 + F.col("_y") * 0.75).alias("_y"))
        first = (cur.groupBy("_g")
                 .agg(F.min(F.struct("_s", "_x", "_y")).alias("_p"))
                 .select("_g", F.col("_p._s").alias("_s"),
                         F.col("_p._x").alias("_x"),
                         F.col("_p._y").alias("_y")))
        last = (cur.groupBy("_g")
                .agg(F.max(F.struct("_s", "_x", "_y")).alias("_p"))
                .select("_g", F.col("_p._s").alias("_s"),
                        F.col("_p._x").alias("_x"),
                        F.col("_p._y").alias("_y")))
        cur = (first.unionByName(q).unionByName(r).unionByName(last)
               .localCheckpoint(eager=False))
    return cur.select(F.col("_g").alias(group_col),
                      F.col("_s").alias(seq_col),
                      F.col("_x").alias(x_col),
                      F.col("_y").alias(y_col))


def chaikin_length_stats(pts, *, group_col: str = "user_id",
                         seq_col: str = "seq", x_col: str = "x",
                         y_col: str = "y", iters: int = 2,
                         round_to: int = 2):
    """Chaikin smoothing followed by the per-group length audit:
    (group, n_verts_in, n_verts_out, smoothed_length) — corner
    cutting strictly shortens a non-degenerate open polyline, which
    is the property a generalization pipeline checks before
    publishing. Lengths round to ``round_to`` (cm on metre fixtures;
    the per-group sum of irrational segment lengths is the only
    aggregation-order-sensitive term)."""
    from pyspark.sql import Window, functions as F

    n_in = (pts.groupBy(F.col(group_col).alias("_g"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_verts_in")))
    sm = chaikin_smooth(pts, group_col=group_col, seq_col=seq_col,
                        x_col=x_col, y_col=y_col, iters=iters)
    w = Window.partitionBy(group_col).orderBy(seq_col)
    legs = (sm
            .withColumn("_px", F.lag(x_col).over(w))
            .withColumn("_py", F.lag(y_col).over(w)))
    d = F.sqrt((F.col(x_col) - F.col("_px"))
               * (F.col(x_col) - F.col("_px"))
               + (F.col(y_col) - F.col("_py"))
               * (F.col(y_col) - F.col("_py")))
    out = (legs.groupBy(F.col(group_col).alias("_g"))
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_verts_out"),
                F.round(F.sum(d), round_to).alias("smoothed_length")))
    return (n_in.join(out, "_g")
            .withColumnRenamed("_g", group_col)
            .orderBy(group_col))
