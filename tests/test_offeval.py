"""Kernel tests for wave 97: team-draft interleaving vs a Python
simulation (including coin parity) and IPS/SNIPS identities."""

from __future__ import annotations

import hashlib

import pytest

from bano_spark.operators.offeval import (ips_policy_value,
                                          team_draft_interleave)


def coin(q, t):
    return int(hashlib.md5(f"{q}|{t}".encode()).hexdigest()[:8],
               16) % 2


def py_team_draft(rows, q, depth):
    docs = [(ra, rb, d, c) for qq, d, ra, rb, c in rows if qq == q]
    taken, ca, cb = set(), 0, 0
    for t in range(1, depth + 1):
        a_first = coin(q, t) == 0
        order = [(0, True), (1, False)] if a_first else [(1, False),
                                                         (0, True)]
        for rk_idx, is_a in order:
            cands = [x for x in docs if x[2] not in taken]
            best = min(cands, key=lambda x: x[rk_idx])
            taken.add(best[2])
            if is_a:
                ca += best[3]
            else:
                cb += best[3]
    return ca, cb


@pytest.fixture(scope="module")
def rankings(spark):
    rows = []
    for q in range(12):
        perm_a, perm_b = [], []
        for d in range(8):
            h = int(hashlib.md5(f"r{q}|{d}".encode()).hexdigest()[:12],
                    16)
            perm_a.append((h % 97, d))
            perm_b.append(((h // 97) % 89, d))
        ra = {d: i + 1 for i, (_, d) in enumerate(sorted(perm_a))}
        rb = {d: i + 1 for i, (_, d) in enumerate(sorted(perm_b))}
        for d in range(8):
            h = int(hashlib.md5(f"c{q}|{d}".encode()).hexdigest()[:8],
                    16)
            rows.append((q, d, ra[d], rb[d], h % 3 == 0))
    rows = [(q, d, a, b, int(c)) for q, d, a, b, c in rows]
    return rows, spark.createDataFrame(
        rows, "q long, d long, ra long, rb long, c long")


def test_team_draft_matches_python(rankings):
    rows, df = rankings
    got = {r["q"]: r for r in
           team_draft_interleave(df, "q", "d", "ra", "rb", "c",
                                 depth=3).collect()}
    for q in range(12):
        ca, cb = py_team_draft(rows, q, 3)
        assert (got[q]["clicks_a"], got[q]["clicks_b"]) == (ca, cb), q
        want_v = 1 if ca > cb else (-1 if cb > ca else 0)
        assert got[q]["verdict"] == want_v


def test_ips_identities(spark):
    # uniform logging over k=4; target always arm 2
    rows = []
    for i in range(800):
        h = int(hashlib.md5(f"i{i}".encode()).hexdigest()[:12], 16)
        arm = (h // 16) % 4
        rw = 1 if (h // 256) % 10 < 2 + 2 * arm else 0
        rows.append((arm, rw, 2))
    df = spark.createDataFrame(rows, "arm long, rw long, target long")
    r = ips_policy_value(df, "arm", "rw", "target", k=4).collect()[0]
    matched = [(a, rw) for a, rw, _ in rows if a == 2]
    mr = sum(rw for _, rw in matched)
    assert r["n"] == 800 and r["n_matched"] == len(matched)
    assert r["matched_reward"] == mr
    assert r["ips"] == mr * 4 / 800
    assert r["snips"] == mr / len(matched)
    # SNIPS approximates the true matched-arm CTR (0.6)
    assert abs(r["snips"] - 0.6) < 0.1
