"""Kernel tests for wave 117: 2-D rectangle union vs a brute-force
unit-grid rasterization — overlap, nesting, disjoint, touching edges,
and the depth/island profile."""

from __future__ import annotations

import pytest

from bano_spark.operators.rectunion import union_area, union_profile


def _grid_union(rects):
    cells = set()
    for _, x0, y0, x1, y1 in rects:
        for x in range(x0, x1):
            for y in range(y0, y1):
                cells.add((x, y))
    return len(cells)


LAYERS = {
    # two overlapping squares
    0: [(1, 0, 0, 10, 10), (2, 5, 5, 15, 15)],
    # nested
    1: [(1, 0, 0, 20, 20), (2, 5, 5, 10, 10)],
    # disjoint
    2: [(1, 0, 0, 5, 5), (2, 10, 10, 15, 15)],
    # touching edge (half-open: no double count, no gap)
    3: [(1, 0, 0, 5, 10), (2, 5, 0, 10, 10)],
    # cross / plus sign
    4: [(1, 0, 4, 12, 8), (2, 4, 0, 8, 12)],
    # triple stack
    5: [(1, 0, 0, 6, 6), (2, 2, 2, 8, 8), (3, 4, 4, 10, 10)],
}


@pytest.fixture(scope="module")
def results(spark):
    rows = [(g, rid, x0, y0, x1, y1) for g, rs in LAYERS.items()
            for rid, x0, y0, x1, y1 in rs]
    df = spark.createDataFrame(
        rows, "grp long, rid long, x0 long, y0 long, x1 long, y1 long")
    ua = {r["grp"]: r for r in union_area(df).collect()}
    up = {r["grp"]: r for r in union_profile(df).collect()}
    return ua, up


def test_union_matches_grid_rasterization(results):
    ua, _ = results
    for g, rects in LAYERS.items():
        assert ua[g]["union_area"] == _grid_union(rects), g


def test_sums_and_bounds(results):
    ua, _ = results
    for g, rects in LAYERS.items():
        s = sum((x1 - x0) * (y1 - y0) for _, x0, y0, x1, y1 in rects)
        assert ua[g]["sum_area"] == s
        assert ua[g]["union_area"] <= s
        assert ua[g]["union_area"] <= ua[g]["bbox_area"]


def test_depth_profile(results):
    _, up = results
    assert up[5]["max_depth"] == 3          # triple stack overlap
    assert up[2]["max_depth"] == 1          # disjoint
    assert up[0]["max_depth"] == 2
    # disjoint-by-y squares sharing a slab -> 2 islands somewhere
    assert up[2]["max_islands"] == 1
    assert up[4]["max_islands"] == 1


def test_touching_edges_exact(results):
    ua, _ = results
    # [0,5)x[0,10) + [5,10)x[0,10) tile exactly: union == sum == 100
    assert ua[3]["union_area"] == 100
    assert ua[3]["sum_area"] == 100
