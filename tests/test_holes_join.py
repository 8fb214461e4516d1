"""spatial_join_with_holes: rotated donut vs an even-odd ray-cast
reference, identical output on the broadcast and shuffle paths."""

import math
import random

from bano_spark.operators.pip_join import spatial_join_with_holes


def _ray_cast(px, py, ring):
    inside = False
    for i in range(len(ring) - 1):
        (x1, y1), (x2, y2) = ring[i], ring[i + 1]
        if (y1 > py) != (y2 > py):
            xi = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            if px < xi:
                inside = not inside
    return inside


def _rot(pts, a):
    c, s = math.cos(a), math.sin(a)
    return [(c * x - s * y, s * x + c * y) for x, y in pts]


def _donut(cx, cy, r_out, r_in, a):
    sq = [(-1, -1), (1, -1), (1, 1), (-1, 1), (-1, -1)]
    outer = [(cx + x, cy + y) for x, y in _rot([(r_out * x, r_out * y)
                                                for x, y in sq], a)]
    hole = [(cx + x, cy + y) for x, y in _rot([(r_in * x, r_in * y)
                                               for x, y in sq], a + 0.3)]
    return outer, hole


def test_holes_join_matches_raycast_both_paths(spark):
    rng = random.Random(5)
    zones = []
    for i in range(4):
        cx, cy = rng.uniform(-3e4, 3e4), rng.uniform(-3e4, 3e4)
        zones.append((f"z{i}", *_donut(cx, cy, 8000.0, 3500.0,
                                       rng.uniform(0, 1.5))))
    pts = [(i, rng.uniform(-5e4, 5e4), rng.uniform(-5e4, 5e4))
           for i in range(800)]

    expected = set()
    for pid, px, py in pts:
        for zid, outer, hole in zones:
            if _ray_cast(px, py, outer) and not _ray_cast(px, py, hole):
                expected.add((pid, zid))

    pdf = spark.createDataFrame(pts, "pt_id int, x double, y double")
    polys = spark.createDataFrame(
        [(z, [[a, b] for a, b in outer]) for z, outer, _ in zones],
        "zone_id string, verts array<array<double>>")
    holes = spark.createDataFrame(
        [(z + "_h", z, [[a, b] for a, b in hole]) for z, _, hole in zones],
        "hole_id string, zone_id string, verts array<array<double>>")

    for bc in (True, False):
        got = {(r.pt_id, r.zone_id)
               for r in spatial_join_with_holes(
                   pdf, polys, holes, point_key="pt_id",
                   id_col="zone_id", zoom=12, broadcast=bc).collect()}
        assert got == expected, f"broadcast={bc}"
    # sanity: the holes actually exclude something
    only_outer = set()
    for pid, px, py in pts:
        for zid, outer, _ in zones:
            if _ray_cast(px, py, outer):
                only_outer.add((pid, zid))
    assert expected < only_outer
