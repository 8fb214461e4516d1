"""Kernel tests for wave 114: Johnson F2 scheduling — closed-form
makespan vs the sequential Lindley simulation, Johnson optimality vs
brute-force permutations (n <= 6), class/tie ordering."""

from __future__ import annotations

from itertools import permutations

import pytest

from bano_spark.operators.flowshop import johnson_sequence, sequence_makespan


def _simulate(seq):
    """Sequential two-machine simulation: c1 += a; c2 = max(c2,c1)+b."""
    c1 = c2 = 0
    for a, b in seq:
        c1 += a
        c2 = max(c2, c1) + b
    return c2


def _johnson_py(jobs):
    front = sorted([j for j in jobs if j[1] < j[2]],
                   key=lambda j: (j[1], j[0]))
    back = sorted([j for j in jobs if j[1] >= j[2]],
                  key=lambda j: (-j[2], j[0]))
    return front + back


SHOPS = {
    0: [(1, 3, 7), (2, 9, 2), (3, 5, 5), (4, 2, 6), (5, 8, 1)],
    1: [(10, 4, 4), (11, 4, 4), (12, 1, 9)],          # ties
    2: [(20, 6, 2), (21, 7, 3), (22, 9, 1)],          # all back class
    3: [(30, 1, 2)],                                   # single job
    4: [(40, 2, 5), (41, 3, 6), (42, 1, 8), (43, 4, 4), (44, 7, 2),
        (45, 5, 5)],
}


@pytest.fixture(scope="module")
def sched(spark):
    rows = [(s, j, a, b) for s, jobs in SHOPS.items()
            for j, a, b in jobs]
    df = spark.createDataFrame(rows, "shop long, job_id long, a long, b long")
    seqd = johnson_sequence(df)
    ms = {r["shop"]: r for r in sequence_makespan(seqd).collect()}
    order = {}
    for r in seqd.collect():
        order.setdefault(r["shop"], []).append((r["seq"], r["job_id"],
                                                r["a"], r["b"]))
    return ms, {s: [x[1:] for x in sorted(v)] for s, v in order.items()}


def test_sequence_matches_python_johnson(sched):
    _, order = sched
    for s, jobs in SHOPS.items():
        assert order[s] == _johnson_py(jobs), s


def test_closed_form_equals_simulation(sched):
    ms, order = sched
    for s in SHOPS:
        sim = _simulate([(a, b) for _, a, b in order[s]])
        assert ms[s]["makespan"] == sim, s


def test_johnson_is_optimal_bruteforce(sched):
    ms, _ = sched
    for s, jobs in SHOPS.items():
        best = min(_simulate([(a, b) for _, a, b in perm])
                   for perm in permutations(jobs))
        assert ms[s]["makespan"] == best, s


def test_totals(sched):
    ms, _ = sched
    for s, jobs in SHOPS.items():
        assert ms[s]["sum_a"] == sum(a for _, a, _ in jobs)
        assert ms[s]["sum_b"] == sum(b for _, _, b in jobs)
        assert ms[s]["n_jobs"] == len(jobs)
