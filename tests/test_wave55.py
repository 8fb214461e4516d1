"""Hand-computed checks for the wave-55 operators: k-truss peeling
and the Weiszfeld geometric median."""

from bano_spark.operators.graph import k_truss
from bano_spark.operators.trajectory import geometric_median


def test_k_truss_triangle_with_tail(spark):
    # triangle 0-1-2 plus a tail 2-3: the tail edge has support 0 and
    # peels; the triangle survives as the 3-truss with support 1.
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3)], "s bigint, d bigint")
    rows = {(r["u"], r["v"]): r["support"] for r in
            k_truss(edges, 3, src="s", dst="d").collect()}
    assert rows == {(0, 1): 1, (0, 2): 1, (1, 2): 1}


def test_k_truss_cascade(spark):
    # two triangles sharing edge 1-2, plus a pendant triangle hanging
    # off node 3 via a bridge: k=4 requires support >= 2 — only the
    # shared edge has it initially, so everything peels (cascade to
    # empty), exercising multi-round convergence.
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)],
        "s bigint, d bigint")
    out = k_truss(edges, 4, src="s", dst="d").collect()
    assert out == []


def test_k_truss_k4_clique(spark):
    # K4: every edge in exactly 2 triangles -> the whole clique is a
    # 4-truss
    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)],
        "s bigint, d bigint")
    rows = k_truss(edges, 4, src="s", dst="d").collect()
    assert len(rows) == 6 and all(r["support"] == 2 for r in rows)


def test_geometric_median_collinear(spark):
    # 3 collinear points: the geometric median is the middle point
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (1, 10.0, 0.0), (1, 100.0, 0.0)],
        "user_id bigint, x double, y double")
    out = geometric_median(pts, iters=25).collect()[0]
    assert abs(out["median_x"] - 10.0) < 0.5
    assert out["median_y"] == 0.0


def test_geometric_median_square_center(spark):
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (1, 0.0, 10.0), (1, 10.0, 0.0), (1, 10.0, 10.0)],
        "user_id bigint, x double, y double")
    out = geometric_median(pts, iters=10).collect()[0]
    assert out["median_x"] == 5.0 and out["median_y"] == 5.0
    # mean distance to center = half diagonal
    assert abs(out["mean_dist_m"] - 7.07) < 0.02
