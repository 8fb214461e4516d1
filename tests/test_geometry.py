"""Numpy geometry kernels + tile math.

Tile-box property (SURVEY §5): the reference's z/x/y box arithmetic
(bano/models.py:309-313) must tile the plane exactly — adjacent boxes
share edges bit-for-bit.
"""

import numpy as np

from bano_spark.geo import geometry, tiles


def test_tile_boxes_tile_the_plane():
    z = 16
    for x, y in [(0, 0), (12345, 54321), (65535, 65535), (32768, 32767)]:
        xmin, ymin, xmax, ymax = tiles.py_tile_bounds(z, x, y)
        nxmin, _, _, _ = tiles.py_tile_bounds(z, x + 1, y)
        _, _, _, pymax = tiles.py_tile_bounds(z, x, y + 1)
        assert xmax == nxmin
        assert ymin == pymax
        assert xmin < xmax and ymin < ymax


def test_tile_roundtrip():
    z = 16
    for x, y in [(100, 200), (40000, 30000)]:
        xmin, ymin, xmax, ymax = tiles.py_tile_bounds(z, x, y)
        cx, cy = (xmin + xmax) / 2, (ymin + ymax) / 2
        assert tiles.py_tile_x(cx, z) == x
        assert tiles.py_tile_y(cy, z) == y


def test_pip_square():
    verts = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    px = np.array([5.0, 15.0, -1.0, 9.99, 5.0])
    py = np.array([5.0, 5.0, 5.0, 9.99, 10.5])
    assert geometry.points_in_polygon(px, py, verts).tolist() == [
        True, False, False, True, False]


def test_pip_concave():
    # L-shape: (0,0)-(4,0)-(4,2)-(2,2)-(2,4)-(0,4)
    verts = np.array([[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4]], float)
    px = np.array([1.0, 3.0, 3.0, 1.0])
    py = np.array([1.0, 1.0, 3.0, 3.0])
    assert geometry.points_in_polygon(px, py, verts).tolist() == [
        True, True, False, True]


def test_cover_classifies_interior_and_boundary():
    # big square spanning many z16 tiles
    s = tiles.cell_size(16)
    x0, y0 = 1000003.0, 2000003.0
    verts = np.array([[x0, y0], [x0 + 20 * s, y0], [x0 + 20 * s, y0 + 20 * s],
                      [x0, y0 + 20 * s], [x0, y0]])
    gx, gy, interior = geometry.cover_polygon(verts, 16)
    assert interior.sum() > 0 and (~interior).sum() > 0
    # every interior tile's center must be inside
    bx = tiles.ORIGIN + s * (gx[interior] + 0.5)
    by = -tiles.ORIGIN - s * (gy[interior] + 0.5)
    assert geometry.points_in_polygon(bx, by, verts).all()
    # the cover must contain the tile of every interior point
    rng = np.random.default_rng(42)
    px = x0 + rng.uniform(0.01, 20 * s - 0.01, 500)
    py = y0 + rng.uniform(0.01, 20 * s - 0.01, 500)
    tx = np.floor((px - tiles.ORIGIN) / s).astype(np.int64)
    ty = np.floor((-tiles.ORIGIN - py) / s).astype(np.int64)
    cover = set(zip(gx.tolist(), gy.tolist()))
    assert all((a, b) in cover for a, b in zip(tx.tolist(), ty.tolist()))


def test_convex_hull_and_longest_line():
    pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5], [0.2, 0.8]])
    h = geometry.convex_hull(pts)
    assert len(h) == 4
    d = geometry.hull_longest_line_m(np.array([2.0, 2.01]), np.array([48.0, 48.0]))
    assert 600 < d < 900  # ~0.01 deg lon at lat 48 ≈ 744 m


def test_line_merge_chains_and_components():
    import numpy as np

    from bano_spark.geo.geometry import line_merge

    # two chains: A(0,0)-(1,0)-(2,0) and B(5,5)-(5,6); order shuffled
    segs = np.array([
        [1, 0, 2, 0],
        [5, 5, 5, 6],
        [0, 0, 1, 0],
    ], dtype=float)
    lines = sorted(line_merge(segs), key=len, reverse=True)
    assert len(lines) == 2
    assert len(lines[0]) == 3  # merged 2-segment chain has 3 vertices
    xs = {tuple(p) for p in lines[0]}
    assert xs == {(0.0, 0.0), (1.0, 0.0), (2.0, 0.0)}
    assert len(lines[1]) == 2


def test_merge_overlapping_boxes():
    import numpy as np

    from bano_spark.geo.geometry import merge_overlapping_boxes

    boxes = np.array([
        [0, 0, 2, 2],
        [1, 1, 3, 3],   # overlaps first
        [10, 10, 11, 11],  # isolated
        [2.5, 2.5, 4, 4],  # overlaps second -> transitively first
    ], dtype=float)
    merged = merge_overlapping_boxes(boxes)
    assert len(merged) == 2
    big = merged[np.lexsort(merged.T[::-1])][0]
    assert list(big) == [0.0, 0.0, 4.0, 4.0]


def test_line_merge_breaks_at_junctions():
    import numpy as np

    from bano_spark.geo.geometry import line_merge

    # T junction at (1,0): three segments meet -> no merge through it
    segs = np.array([
        [0, 0, 1, 0],
        [1, 0, 2, 0],
        [1, 0, 1, 1],
    ], dtype=float)
    lines = line_merge(segs)
    assert sorted(len(l) for l in lines) == [2, 2, 2]


def test_cells_to_rings_hole_and_pinch():
    """Raster->vector boundary trace: 3x3 block minus center plus an
    arm yields one CCW outer ring (area 11) and one CW hole (area -1);
    diagonally-touching cells split into two simple rings."""
    import numpy as np

    from bano_spark.geo.geometry import cells_to_rings

    cells = [(x, y) for x in range(3) for y in range(3) if (x, y) != (1, 1)]
    cells += [(3, 0), (4, 0)]
    rings = cells_to_rings(np.array(cells))

    def signed_area(r):
        v = r[:-1]
        return 0.5 * float(np.sum(
            v[:, 0] * np.roll(v[:, 1], -1) - np.roll(v[:, 0], -1) * v[:, 1]))

    areas = sorted(round(signed_area(r), 6) for r in rings)
    assert areas == [-1.0, 11.0]           # hole CW, outer CCW
    assert sum(areas) == len(cells)        # net = cell count (10)
    per = sum(float(np.abs(np.diff(r, axis=0)).sum()) for r in rings)
    assert per == 20.0
    for r in rings:                        # closed, axis-aligned, simple
        assert (r[0] == r[-1]).all()
        steps = np.diff(r, axis=0)
        assert ((steps[:, 0] == 0) | (steps[:, 1] == 0)).all()
        interior = [tuple(p) for p in r[:-1]]
        assert len(interior) == len(set(interior))

    pinch = cells_to_rings(np.array([(0, 0), (1, 1)]))
    assert len(pinch) == 2 and all(len(r) == 5 for r in pinch)
    assert sorted(round(signed_area(r), 6) for r in pinch) == [1.0, 1.0]
