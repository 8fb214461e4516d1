"""Kernel tests for wave 88: Shapley attribution vs a permutation
brute force, and U-shaped position weights."""

from __future__ import annotations

from datetime import datetime, timedelta
from itertools import permutations

import pytest

from bano_spark.operators.eventflow import (position_attribution,
                                            shapley_attribution)

CH = ["click", "error", "signup", "view"]


def brute_shapley(mask_counts, n=4):
    """phi via averaging marginal contributions over all n! orders."""

    def v(s_bits):
        return sum(c for m, c in mask_counts.items() if m & s_bits == m)

    phi = [0.0] * n
    perms = list(permutations(range(n)))
    for order in perms:
        s = 0
        for i in order:
            phi[i] += v(s | (1 << i)) - v(s)
            s |= 1 << i
    return [p / len(perms) for p in phi]


@pytest.fixture(scope="module")
def journeys(spark):
    # deterministic journeys: user u performs a prefix of channels then
    # converts; user u+100 converts with no touches.
    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(16):
        touched = [c for i, c in enumerate(CH) if u & (1 << i)]
        t = base + timedelta(hours=u)
        for j, c in enumerate(touched):
            rows.append((eid, t + timedelta(minutes=j), u, c))
            eid += 1
        rows.append((eid, t + timedelta(minutes=30), u, "purchase"))
        eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string")


def test_shapley_matches_permutation_bruteforce(journeys):
    got = {r["channel"]: r for r in
           shapley_attribution(journeys, CH, "purchase", 7200)
           .collect()}
    # each mask 0..15 occurs exactly once
    mask_counts = {m: 1 for m in range(16)}
    want = brute_shapley(mask_counts)
    for i, c in enumerate(CH):
        assert got[c]["shapley_credit"] == round(want[i], 6), c
        assert got[c]["n_conversions"] == 16
        # exact integer numerator / 24
        assert got[c]["shapley_num"] == round(want[i] * 24)


def test_shapley_efficiency_axiom(journeys):
    rows = shapley_attribution(journeys, CH, "purchase", 7200).collect()
    total = sum(r["shapley_num"] for r in rows)
    # v(full)=16 (all masks contained), v(empty)=1 (the no-touch mask)
    assert total == (16 - 1) * 24


def test_position_weights_sum_to_one_per_conversion(journeys):
    rows = position_attribution(journeys, CH, "purchase", 7200).collect()
    # total credit over channels == number of conversions WITH >=1 touch
    assert round(sum(r["credit"] for r in rows), 6) == 15.0
    n_touches = sum(r["n_touches"] for r in rows)
    # sum over masks of popcount = 32 touches
    assert n_touches == 32


def test_position_u_shape(spark):
    # one user, 4 touches then conversion: weights 0.4/0.2/0.2... no:
    # k=4 -> first 0.4, last 0.4, two middles 0.1 each.
    base = datetime(2024, 1, 1)
    rows = [(i, base + timedelta(minutes=i), 1, c)
            for i, c in enumerate(CH)]
    rows.append((9, base + timedelta(minutes=30), 1, "purchase"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string")
    got = {r["channel"]: r["credit"] for r in
           position_attribution(df, CH, "purchase", 7200).collect()}
    assert got == {"click": 0.4, "error": 0.1, "signup": 0.1,
                   "view": 0.4}
