"""Kernel tests for wave 90: 1-D Wasserstein vs the optimal-transport
definition, matrix profile vs a brute-force Python replay."""

from __future__ import annotations

import pytest

from bano_spark.operators.quantiles import wasserstein_1d
from bano_spark.operators.temporal import matrix_profile_ed


def emd_1d(a, b):
    """W1 via the quantile-coupling definition on the lcm grid."""
    import math
    n, m = len(a), len(b)
    lcm = n * m // math.gcd(n, m)
    aa = sorted(a * (lcm // n))
    bb = sorted(b * (lcm // m))
    return sum(abs(x - y) for x, y in zip(aa, bb)) / lcm


def test_wasserstein_matches_ot_definition(spark):
    cases = [
        ("g1", [0, 10], [5]),
        ("g2", [1, 2, 3], [1, 2, 3]),
        ("g3", [0, 0, 0, 12], [3, 3]),
        ("g4", list(range(10)), [4] * 7),
    ]
    rows = []
    for g, a, b in cases:
        rows += [(g, "a", x) for x in a] + [(g, "b", x) for x in b]
    df = spark.createDataFrame(rows, "g string, side string, x long")
    got = {r["g"]: r for r in
           wasserstein_1d(df, "g", "side", "x").collect()}
    for g, a, b in cases:
        want = emd_1d(a, b)
        r = got[g]
        assert r["n_a"] == len(a) and r["n_b"] == len(b)
        assert r["w1"] == round(want, 6), g
        # exact integer numerator identity
        assert r["w1_num"] / (len(a) * len(b)) == pytest.approx(want)


def brute_mp(ys, m=4):
    n = len(ys) - m + 1
    subs = [tuple(ys[i:i + m]) for i in range(n)]

    def d2(i, j):
        return sum((subs[i][k] - subs[j][k]) ** 2 for k in range(m))

    prof = {}
    for i in range(n):
        cands = [d2(i, j) for j in range(n) if abs(i - j) >= m]
        if cands:
            prof[i] = min(cands)
    motif = min((d2(i, j), i, j) for i in range(n)
                for j in range(i + 1, n) if j - i >= m)
    discord = max((pd, -i) for i, pd in prof.items())
    return n, motif, (-discord[1], discord[0])


def test_matrix_profile_matches_bruteforce(spark):
    import hashlib
    rows = []
    for u in range(6):
        n = 12 + u * 3
        for t in range(n):
            h = int(hashlib.md5(f"{u}|{t}".encode()).hexdigest()[:8], 16)
            rows.append((u, t, h % 15 - 7))
    df = spark.createDataFrame(rows, "g long, t long, y long")
    got = {r["g"]: r for r in
           matrix_profile_ed(df, "g", "t", "y", m=4).collect()}
    for u in range(6):
        ys = [y for g, t, y in sorted(rows) if g == u]
        n, (md2, mi, mj), (di, dd2) = brute_mp(ys)
        r = got[u]
        assert r["n_subs"] == n
        # brute force is 0-indexed; operator rows are 1-indexed
        assert (r["motif_d2"], r["motif_i"], r["motif_j"]) \
            == (md2, mi + 1, mj + 1), u
        assert (r["discord_i"], r["discord_d2"]) == (di + 1, dd2), u


def test_matrix_profile_exclusion_zone(spark):
    # constant series: every pair distance 0; motif must respect
    # |i-j| >= m (so j - i == m exactly for the smallest valid pair)
    rows = [(1, t, 5) for t in range(12)]
    df = spark.createDataFrame(rows, "g long, t long, y long")
    r = matrix_profile_ed(df, "g", "t", "y", m=4).collect()[0]
    assert r["motif_d2"] == 0 and r["motif_j"] - r["motif_i"] == 4
    assert r["discord_d2"] == 0
