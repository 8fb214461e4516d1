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
