"""Kernel tests for wave 142: alias_table vs a python Vose with the
same FIFO discipline, the mass-reconstruction invariant on skewed
weights, and the uniform edge case."""

from __future__ import annotations

from collections import Counter

import pytest

from bano_spark.operators.alias_table import alias_mass_audit, alias_table

_M31 = 2147483648


def _vose(weights):
    ks = sorted(weights)
    ws = [float(weights[k]) for k in ks]
    W, n = sum(ws), len(ws)
    q = [n * w / W for w in ws]
    sm = [i for i in range(1, n + 1) if q[i - 1] < 1.0]
    lg = [i for i in range(1, n + 1) if not q[i - 1] < 1.0]
    out = []
    for _ in range(n):
        if sm and lg:
            s = sm.pop(0)
            l = lg.pop(0)
            qs = q[s - 1]
            qlp = (q[l - 1] + qs) - 1.0
            out.append((s, qs, l))
            q[l - 1] = qlp
            (sm if qlp < 1.0 else lg).append(l)
    for i in sm + lg:
        out.append((i, 1.0, i))
    return {ks[i - 1]: (p, ks[a - 1]) for i, p, a in out}


def _df(spark, draws):
    return spark.createDataFrame([("g", k) for k in draws],
                                 "g: string, k: bigint")


def test_table_vs_python_vose(spark):
    draws = [((i * 2654435761 + 13) % _M31) % 8 for i in range(900)]
    ref = _vose(Counter(draws))
    got = {r["key"]: (r["prob"], r["alias_key"]) for r in
           alias_table(_df(spark, draws), "g", "k").collect()}
    assert set(got) == set(ref)
    for k, (p, a) in ref.items():
        assert got[k][0] == pytest.approx(p, abs=1e-6)
        assert got[k][1] == a


def test_mass_reconstruction_skewed(spark):
    # heavy skew: one dominant category
    draws = [0] * 500 + [1] * 40 + [2] * 30 + [3] * 20 + [4] * 10
    rows = alias_mass_audit(_df(spark, draws), "g", "k").collect()
    assert all(r["ok"] for r in rows)
    tot = len(draws)
    for r in rows:
        true = {0: 500, 1: 40, 2: 30, 3: 20, 4: 10}[r["key"]] / tot
        assert r["mass"] == pytest.approx(true, abs=1e-6)


def test_uniform_all_prob_one(spark):
    draws = [k for k in range(6)] * 10
    rows = alias_table(_df(spark, draws), "g", "k").collect()
    for r in rows:
        assert r["prob"] == pytest.approx(1.0, abs=1e-9)
        assert r["alias_key"] == r["key"]
