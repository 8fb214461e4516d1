"""Property-based tests (hypothesis): the tile grid must tile the
plane exactly (SURVEY.md §5 — models.py:310-313 is pure arithmetic),
and scalar kernels must be total/idempotent on arbitrary input."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from bano_spark.geo import tiles

FINITE = st.floats(min_value=-2.0037e7, max_value=2.0037e7,
                   allow_nan=False, allow_infinity=False)
ZOOMS = st.integers(min_value=0, max_value=18)


@given(x=FINITE, y=FINITE, z=ZOOMS)
@settings(max_examples=300, deadline=None)
def test_point_lands_inside_its_tile(x, y, z):
    """A point maps into its tile's box up to 1-ULP quotient rounding at
    the shared edges (the formula is float; what matters for correctness
    is that EVERY component — engine, oracle, reference — evaluates the
    identical expression, so assignments always agree bit-for-bit)."""
    tx, ty = tiles.py_tile_x(x, z), tiles.py_tile_y(y, z)
    xmin, ymin, xmax, ymax = tiles.py_tile_bounds(z, tx, ty)
    tol = max(abs(x - tiles.ORIGIN), abs(tiles.ORIGIN - y), 1.0) * 2**-50
    assert xmin - tol <= x < xmax + tol
    assert ymin - tol < y <= ymax + tol


@given(z=st.integers(min_value=0, max_value=16),
       tx=st.integers(min_value=0, max_value=2**16 - 2),
       ty=st.integers(min_value=0, max_value=2**16 - 2))
@settings(max_examples=300, deadline=None)
def test_adjacent_tiles_share_edges_exactly(z, tx, ty):
    """The boxes of (tx, ty) and (tx+1, ty) / (tx, ty+1) must abut with
    no gap and no overlap — the plane is tiled exactly."""
    tx %= 2**z if z else 1
    ty %= 2**z if z else 1
    a = tiles.py_tile_bounds(z, tx, ty)
    right = tiles.py_tile_bounds(z, tx + 1, ty)
    below = tiles.py_tile_bounds(z, tx, ty + 1)
    assert a[2] == right[0]  # xmax == neighbour xmin
    assert a[1] == below[3]  # ymin == neighbour ymax


@given(z=ZOOMS, n=st.integers(min_value=0, max_value=10**6))
@settings(max_examples=200, deadline=None)
def test_tile_roundtrip(z, n):
    """Center of tile n's box maps back to tile n."""
    tx = n % (2**z)
    xmin, ymin, xmax, ymax = tiles.py_tile_bounds(z, tx, tx)
    cx, cy = (xmin + xmax) / 2, (ymin + ymax) / 2
    assert tiles.py_tile_x(cx, z) == tx
    assert tiles.py_tile_y(cy, z) == tx


@given(s=st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_normalize_total_and_idempotent(s):
    """normalize() never raises on arbitrary unicode and is idempotent
    (normalizing a normalized name is a no-op) — required for the
    conciliation keys to be stable across pipeline stages."""
    import pandas as pd

    from bano_spark.functions.normalize import normalize_series

    once = normalize_series(pd.Series([s]))[0]
    twice = normalize_series(pd.Series([once]))[0]
    assert isinstance(once, str) and len(once) <= 30
    assert twice == normalize_series(pd.Series([twice]))[0]


@given(data=st.data())
@settings(max_examples=60, deadline=None)
def test_cover_contains_every_inside_point(data):
    """Engine invariant behind the two-phase spatial join: any point
    inside the polygon MUST fall in a cover cell (else the prune join
    drops it silently), and points in interior cells must pass PIP."""
    import numpy as np

    from bano_spark.geo import geometry, tiles

    # random triangle within the synthetic band
    xs = data.draw(st.lists(st.floats(1_000_100, 1_090_000, allow_nan=False),
                            min_size=3, max_size=3))
    ys = data.draw(st.lists(st.floats(2_000_100, 2_009_000, allow_nan=False),
                            min_size=3, max_size=3))
    tri = np.array(list(zip(xs, ys)) + [(xs[0], ys[0])])
    # degenerate triangles have no interior — skip via area check
    area = abs((xs[1] - xs[0]) * (ys[2] - ys[0])
               - (xs[2] - xs[0]) * (ys[1] - ys[0])) / 2
    if area < 1.0:
        return
    z = data.draw(st.integers(min_value=11, max_value=15))
    gx, gy, interior = geometry.cover_polygon(tri, z)
    cells = set(zip(gx.tolist(), gy.tolist()))
    interior_cells = set(zip(gx[interior].tolist(), gy[interior].tolist()))

    # sample points from the triangle via barycentric coordinates
    n = 40
    r1 = np.linspace(0.05, 0.95, n)
    r2 = np.linspace(0.9, 0.02, n)
    u = 1 - np.sqrt(r1)
    v = np.sqrt(r1) * (1 - r2)
    w = np.sqrt(r1) * r2
    px = u * xs[0] + v * xs[1] + w * xs[2]
    py = u * ys[0] + v * ys[1] + w * ys[2]
    inside = geometry.points_in_polygon(px, py, tri)
    for x, y, isin in zip(px, py, inside):
        cell = (tiles.py_tile_x(x, z), tiles.py_tile_y(y, z))
        if isin:
            assert cell in cells, f"inside point lost by cover at z{z}"
        if cell in interior_cells:
            assert isin, "interior cell contains an outside point"


@given(data=st.data())
@settings(max_examples=40, deadline=None)
def test_cells_to_rings_invariants(data):
    """Random cell sets: traced rings must reproduce the exact area
    (net shoelace == cell count) and perimeter (4n - 2*adjacent pairs)
    of the raster, with every ring closed, axis-aligned and simple."""
    import numpy as np

    from bano_spark.geo.geometry import cells_to_rings

    cells = data.draw(st.sets(
        st.tuples(st.integers(0, 7), st.integers(0, 7)),
        min_size=1, max_size=30))
    rings = cells_to_rings(np.array(sorted(cells)))

    net = 0.0
    per = 0.0
    for r in rings:
        assert (r[0] == r[-1]).all()
        steps = np.diff(r, axis=0)
        assert ((steps[:, 0] == 0) | (steps[:, 1] == 0)).all()
        verts = [tuple(p) for p in r[:-1]]
        assert len(verts) == len(set(verts))
        v = r[:-1]
        net += 0.5 * float(np.sum(
            v[:, 0] * np.roll(v[:, 1], -1) - np.roll(v[:, 0], -1) * v[:, 1]))
        per += float(np.abs(steps).sum())
    adj = sum(1 for (x, y) in cells if (x + 1, y) in cells) \
        + sum(1 for (x, y) in cells if (x, y + 1) in cells)
    assert round(net, 6) == len(cells)
    assert per == 4 * len(cells) - 2 * adj


# ---------------------------------------------------------------------------
# wave-5 kernels
# ---------------------------------------------------------------------------

_TAN225 = 0.41421356237309503


def _sector_cascade(dx: float, dy: float) -> str:
    """Python twin of trajectory.sector_expr's comparison cascade."""
    adx, ady = abs(dx), abs(dy)
    if adx <= _TAN225 * ady:
        return "N" if dy > 0 else "S"
    if ady <= _TAN225 * adx:
        return "E" if dx > 0 else "W"
    if dx > 0 and dy > 0:
        return "NE"
    if dx > 0 and dy < 0:
        return "SE"
    if dx < 0 and dy < 0:
        return "SW"
    return "NW"


@given(dx=st.integers(min_value=-10**6, max_value=10**6),
       dy=st.integers(min_value=-10**6, max_value=10**6))
@settings(max_examples=500, deadline=None)
def test_sector_cascade_matches_atan2(dx, dy):
    """The transcendental-free comparison cascade must agree with the
    atan2 ground truth for every nonzero integer step vector (exact
    ties with tan(22.5 deg) are impossible on integers)."""
    import math

    if dx == 0 and dy == 0:
        return
    ang = math.degrees(math.atan2(dx, dy)) % 360.0  # 0 = North, cw
    idx = int(((ang + 22.5) % 360.0) // 45.0)
    want = ["N", "NE", "E", "SE", "S", "SW", "W", "NW"][idx]
    assert _sector_cascade(float(dx), float(dy)) == want


@given(k=st.integers(min_value=0, max_value=6))
@settings(max_examples=20, deadline=None)
def test_hex_kring_disk_size_and_distance(k):
    from bano_spark.geo.hexgrid import hex_kring_offsets

    offs = hex_kring_offsets(k)
    assert len(offs) == 3 * k * (k + 1) + 1
    assert len(set(offs)) == len(offs)
    for dq, dr in offs:
        assert max(abs(dq), abs(dr), abs(dq + dr)) <= k
    # symmetry: the disk is closed under negation
    assert set(offs) == {(-dq, -dr) for dq, dr in offs}


@given(px=st.integers(-1000, 1000), py=st.integers(-1000, 1000),
       x1=st.integers(-1000, 1000), y1=st.integers(-1000, 1000),
       x2=st.integers(-1000, 1000), y2=st.integers(-1000, 1000))
@settings(max_examples=300, deadline=None)
def test_clamped_projection_is_optimal(px, py, x1, y1, x2, y2):
    """The closed-form clamped projection (mapmatch/w31 kernel) must
    never be beaten by any sampled point on the segment."""
    dx, dy = x2 - x1, y2 - y1
    d2seg = dx * dx + dy * dy
    t = ((px - x1) * dx + (py - y1) * dy) / d2seg if d2seg > 0 else 0.0
    tc = min(max(t, 0.0), 1.0)
    best = (px - (x1 + tc * dx)) ** 2 + (py - (y1 + tc * dy)) ** 2
    for i in range(21):
        ts = i / 20.0
        d2 = (px - (x1 + ts * dx)) ** 2 + (py - (y1 + ts * dy)) ** 2
        assert best <= d2 + 1e-6 * max(1.0, d2)
