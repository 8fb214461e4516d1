"""Kernel tests for wave 128: cache_replay vs a step-by-step python
simulator (OPT and LRU, including the cyclic-scan LRU worst case and
OPT dominance), and ring_rebalance invariants (conservation, moves
only to the new server, ~1/(N+1) moved fraction)."""

from __future__ import annotations

import pytest

from bano_spark.operators.cachesim import cache_replay
from bano_spark.operators.hashring import ring_rebalance, ring_tokens

_M31 = 2147483648


def _sim(accesses, policy, C=4):
    nxt, nu = {}, [0.0] * len(accesses)
    for i in range(len(accesses) - 1, -1, -1):
        t, k = accesses[i]
        nu[i] = nxt.get(k, 1.0e18)
        nxt[k] = t
    slots = [(-1.0, 1.0e19)] * C          # (key, prio), first-max evict
    hits = 0
    for i, (t, k) in enumerate(accesses):
        prio = nu[i] if policy == "opt" else -float(t)
        held = [j for j, (sk, _) in enumerate(slots) if sk == k]
        if held:
            hits += 1
            slots[held[0]] = (float(k), prio)
        else:
            mx = max(p for _, p in slots)
            j = next(j for j, (_, p) in enumerate(slots) if p == mx)
            slots[j] = (float(k), prio)
    return hits


def _trace(n):
    # skewed: mostly 5 hot keys, some cold
    out = []
    for i in range(n):
        u = (i * 2654435761 + 13) % _M31
        k = u % 5 if u % 4 < 3 else 5 + u % 15
        out.append((i, k))
    return out


def test_opt_and_lru_vs_simulator(spark):
    acc = _trace(400)
    df = spark.createDataFrame([("g", t, k) for t, k in acc],
                               "grp: string, t: bigint, k: bigint")
    for pol in ("opt", "lru"):
        row = cache_replay(df, "grp", "t", "k", capacity=4,
                           policy=pol).collect()[0]
        assert row["hits"] == _sim(acc, pol)
    opt = cache_replay(df, "grp", "t", "k", policy="opt").collect()[0]
    lru = cache_replay(df, "grp", "t", "k", policy="lru").collect()[0]
    assert opt["hits"] >= lru["hits"] > 0


def test_lru_cyclic_scan_worst_case(spark):
    # round-robin over C+1 keys: LRU gets 0, OPT gets C-1 per cycle-ish
    acc = [(i, i % 5) for i in range(100)]
    df = spark.createDataFrame([("g", t, k) for t, k in acc],
                               "grp: string, t: bigint, k: bigint")
    lru = cache_replay(df, "grp", "t", "k", capacity=4,
                       policy="lru").collect()[0]
    opt = cache_replay(df, "grp", "t", "k", capacity=4,
                       policy="opt").collect()[0]
    assert lru["hits"] == 0
    assert opt["hits"] == _sim(acc, "opt") > 50


def test_cache_replay_validation(spark):
    df = spark.createDataFrame([("g", 1, 1)],
                               "grp: string, t: bigint, k: bigint")
    with pytest.raises(ValueError):
        cache_replay(df, "grp", "t", "k", policy="fifo")
    with pytest.raises(ValueError):
        cache_replay(df, "grp", "t", "k", capacity=0)


def test_ring_rebalance_invariants(spark):
    n = 4000
    df = spark.range(n).selectExpr(
        "(id * 2654435761 + 29) % 2147483648 AS h")
    rows = {r["server"]: r for r in
            ring_rebalance(df, "h", n_before=5, n_after=6).collect()}
    assert sum(r["n_before"] for r in rows.values()) == n
    assert sum(r["n_after"] for r in rows.values()) == n
    moved = sum(r["moved_in"] for r in rows.values())
    assert moved == sum(r["moved_out"] for r in rows.values())
    # consistent hashing: every move lands on the NEW server
    for s in range(5):
        assert rows[s]["moved_in"] == 0
    assert rows[5]["moved_in"] == rows[5]["n_after"] == moved
    # moved fraction near 1/6 (vnode variance allowed)
    assert 0.05 < moved / n < 0.35


def test_ring_tokens_deterministic():
    assert ring_tokens(3) == ring_tokens(3)
    assert len(ring_tokens(5, 8)) == 40
    assert all(0 <= p < _M31 for p, _ in ring_tokens(5, 8))


def test_key_domain_guard_raises(spark):
    # a key of -1 would alias the empty-slot sentinel; the domain
    # guard must fail loudly instead of silently mis-replaying
    # (ADVICE r4, cachesim.py)
    import pytest
    from pyspark.errors import PySparkException
    df = spark.createDataFrame([("g", 0, -1), ("g", 1, 2)],
                               "grp: string, t: bigint, k: bigint")
    with pytest.raises(PySparkException):
        cache_replay(df, "grp", "t", "k").collect()
