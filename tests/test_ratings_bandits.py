"""Kernel tests for wave 93: Elo vs a Python replay (with the same
in-fold quantization) and UCB1 replay vs brute force."""

from __future__ import annotations

import math

import pytest

from bano_spark.operators.ratings import elo_ratings, ucb1_replay


def py_elo(matches, n_players, k=16, init=1000):
    r = [float(init)] * n_players
    for a, b, sa in matches:
        ea = 1.0 / (1.0 + math.exp((r[b] - r[a]) * math.log(10.0) / 400))
        ra = round(r[a] + k * (sa - ea), 6)
        rb = round(r[b] + k * ((1 - sa) - (1 - ea)), 6)
        r[a], r[b] = ra, rb
    return r


@pytest.fixture(scope="module")
def matches(spark):
    import hashlib
    rows = []
    for lg in range(3):
        for t in range(200):
            h = int(hashlib.md5(f"{lg}|{t}".encode()).hexdigest()[:12],
                    16)
            a = h % 6
            b = (a + 1 + (h // 6) % 5) % 6
            sa = 1 if (h // 30) % 100 < 50 + 8 * (a - b) else 0
            rows.append((lg, t, a, b, sa))
    return rows, spark.createDataFrame(
        rows, "league long, seq long, a long, b long, sa long")


def test_elo_matches_python(matches):
    rows, df = matches
    got = {(r["league"], r["player"]): r for r in
           elo_ratings(df, "league", "seq", "a", "b", "sa",
                       n_players=6).collect()}
    for lg in range(3):
        ms = [(a, b, sa) for l, t, a, b, sa in sorted(rows) if l == lg]
        want = py_elo(ms, 6)
        for p in range(6):
            assert got[(lg, p)]["rating"] == want[p], (lg, p)
            n = sum(1 for a, b, _ in ms if p in (a, b))
            assert got[(lg, p)]["n_matches"] == n


def test_elo_zero_sum(matches):
    # K-factor updates are antisymmetric: total rating is conserved
    # up to the 1e-6 quantization per update.
    rows, df = matches
    out = elo_ratings(df, "league", "seq", "a", "b", "sa",
                      n_players=6).collect()
    for lg in range(3):
        total = sum(r["rating"] for r in out if r["league"] == lg)
        assert abs(total - 6000.0) < 0.01


def py_ucb(events, n_arms=3):
    n = [0] * n_arms
    s = [0] * n_arms
    matched = reward = 0
    for arm, rw in events:
        if 0 in n:
            ch = n.index(0)
        else:
            best, ch = -1e18, -1
            for i in range(n_arms):
                u = s[i] / n[i] + math.sqrt(2 * math.log(sum(n)) / n[i])
                if u > best:
                    best, ch = u, i
        if ch == arm:
            n[ch] += 1
            s[ch] += rw
            matched += 1
            reward += rw
    return n, s, matched, reward


def test_ucb1_replay_matches_python(spark):
    import hashlib
    rows = []
    for sh in range(3):
        for t in range(400):
            h = int(hashlib.md5(f"{sh}|{t}".encode()).hexdigest()[:12],
                    16)
            arm = (h // 64) % 3
            rw = 1 if (h // 4096) % 100 < 20 + 25 * arm else 0
            rows.append((sh, t, arm, rw))
    df = spark.createDataFrame(rows,
                               "shard long, seq long, arm long, rw long")
    got = {r["shard"]: r for r in
           ucb1_replay(df, "shard", "seq", "arm", "rw",
                       n_arms=3).collect()}
    for sh in range(3):
        ev = [(a, rw) for s_, t, a, rw in sorted(rows) if s_ == sh]
        n, s, matched, reward = py_ucb(ev)
        r = got[sh]
        assert [r[f"pulls_{i}"] for i in range(3)] == n, sh
        assert r["n_matched"] == matched and r["total_reward"] == reward
        # the best arm (highest CTR) must get the most pulls
        assert max(range(3), key=lambda i: n[i]) == 2
