"""Douglas-Peucker simplification: kernel vs a brute-force recursive
reference on random polylines, plus the documented edge rules
(degenerate chord, first-index tie, idx_col passthrough)."""

import random

import numpy as np

from bano_spark.operators.simplify import simplify_polylines
from bano_spark.operators.simplify import _dp_keep as _dp_keep_np


def _dp_keep(xs, ys, eps2):
    return _dp_keep_np(np.asarray(xs, dtype=np.float64),
                       np.asarray(ys, dtype=np.float64), eps2)


def _ref_dp(pts, eps):
    """Independent recursive reference (same distance + tie contract)."""
    n = len(pts)
    if n <= 2:
        return set(range(n))

    def seg(lo, hi):
        ax, ay = pts[lo]
        bx, by = pts[hi]
        best, bd = None, -1.0
        for i in range(lo + 1, hi):
            x, y = pts[i]
            den = (bx - ax) ** 2 + (by - ay) ** 2
            if den == 0.0:
                d2 = (x - ax) ** 2 + (y - ay) ** 2
            else:
                num = (bx - ax) * (ay - y) - (ax - x) * (by - ay)
                d2 = num * num / den
            if d2 > bd:
                best, bd = i, d2
        if best is not None and bd > eps * eps:
            return seg(lo, best) | {best} | seg(best, hi)
        return set()

    return {0, n - 1} | seg(0, n - 1)


def test_kernel_matches_recursive_reference():
    rng = random.Random(7)
    for _ in range(200):
        n = rng.randint(2, 40)
        pts = [(rng.uniform(-100, 100), rng.uniform(-100, 100))
               for _ in range(n)]
        eps = rng.choice([0.0, 0.5, 5.0, 50.0])
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        assert set(_dp_keep(xs, ys, eps * eps)) == _ref_dp(pts, eps)


def test_degenerate_chord_uses_point_distance():
    # closed ring: endpoints coincide, so den == 0; farthest-from-start
    # vertex must still split.
    xs = [0.0, 10.0, 10.0, 0.0, 0.0]
    ys = [0.0, 0.0, 10.0, 10.0, 0.0]
    kept = _dp_keep(xs, ys, 1.0)
    assert 0 in kept and 4 in kept and len(kept) > 2


def test_first_index_wins_ties():
    # two interior vertices at identical distance; the first splits
    # first, which determines the kept set under a tight eps.
    xs = [0.0, 1.0, 2.0, 3.0]
    ys = [0.0, 5.0, -5.0, 0.0]
    # indices 1 and 2 are both 5.0 from the base chord; the FIRST (1)
    # must split, after which 2 sits ~2.79 from the (1,3) chord and is
    # dropped at eps=4 — a mirror-image run would keep {0,2,3} instead,
    # so the kept set observably encodes the tie rule.
    kept = _dp_keep(xs, ys, 4.0 * 4.0)
    assert kept == [0, 1, 3]
    # tight eps keeps both tie vertices regardless of order
    assert _dp_keep(xs, ys, 1.0) == [0, 1, 2, 3]


def test_dataframe_op_and_idx_col(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 1000.0, 2000.0], [0.0, 30.0, 0.0], [10, 20, 30]),
         (2, [0.0, 1000.0], [0.0, 0.0], [7, 8])],
        "line_id bigint, xs array<double>, ys array<double>, "
        "vids array<bigint>")
    out = (simplify_polylines(df, 15.0, idx_col="vids")
           .orderBy("line_id", "idx").collect())
    assert [(r.line_id, r.idx) for r in out] == [
        (1, 10), (1, 20), (1, 30), (2, 7), (2, 8)]
    pos = (simplify_polylines(df.drop("vids"), 15.0)
           .orderBy("line_id", "idx").collect())
    assert [(r.line_id, r.idx) for r in pos] == [
        (1, 0), (1, 1), (1, 2), (2, 0), (2, 1)]
