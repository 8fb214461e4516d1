"""Kernel tests for wave 130: adaboost_stumps vs a step-by-step
python AdaBoost (pattern-weight formulation), margin-rule error
equivalence with the sign-of-sum-of-alphas rule, and validation."""

from __future__ import annotations

import math

import pytest

from bano_spark.operators.boosting import (CAND, adaboost_margin_errors,
                                           adaboost_stumps)

_M31 = 2147483648


def _data(n=1500):
    out = []
    for i in range(n):
        u1 = (i * 2654435761 + 13) % _M31
        u2 = (i * 1103515245 + 12345) % _M31
        x1, x2 = u1 % 40, u2 % 40
        out.append((x1, x2, 1 if (x1 <= 22 and x2 <= 30) else -1))
    return out


def _ref_fit(data, T=3):
    model = []
    for _ in range(T):
        npat = 1 << len(model)
        cnt = [0] * npat
        mi = [[0] * npat for _ in range(16)]
        for x1, x2, y in data:
            pid = 0
            for i, (fi, th, pol, *_r) in enumerate(model):
                h = pol if (x1 if fi == 1 else x2) <= th else -pol
                if h != y:
                    pid |= 1 << i
            cnt[pid] += 1
            for cid, (fi, th, pol) in enumerate(CAND):
                h = pol if (x1 if fi == 1 else x2) <= th else -pol
                if h != y:
                    mi[cid][pid] += 1
        w = []
        for pid in range(npat):
            t = 1.0
            for i, (*_s, fct) in enumerate(model):
                t *= fct if (pid >> i) & 1 else 1.0 / fct
            w.append(t)
        best = None
        for cid in range(16):
            num = sum(mi[cid][p] * w[p] for p in range(npat))
            den = sum(cnt[p] * w[p] for p in range(npat))
            if best is None or (num / den, cid) < best[:2]:
                best = (num / den, cid)
        eps, cid = best
        fi, th, pol = CAND[cid]
        g = (1.0 - eps) / eps
        model.append((fi, th, pol, eps, g, math.sqrt(g)))
    return model


def test_adaboost_vs_reference(spark):
    data = _data()
    df = spark.createDataFrame(data, "x1: bigint, x2: bigint, y: bigint")
    picks = adaboost_stumps(df, rounds=3)
    ref = _ref_fit(data)
    for r, (p, m) in enumerate(zip(picks, ref), 1):
        row = p.collect()[0]
        fi, th, pol, eps, g, _ = m
        assert (row[f"feat{r}"], row[f"th{r}"], row[f"pol{r}"]) == \
            (fi, th, pol)
        assert row[f"eps{r}"] == pytest.approx(eps, rel=1e-12)
        assert row[f"alpha{r}"] == pytest.approx(0.5 * math.log(g),
                                                 rel=1e-9)


def test_margin_errors_match_alpha_rule(spark):
    data = _data()
    df = spark.createDataFrame(data, "x1: bigint, x2: bigint, y: bigint")
    picks = adaboost_stumps(df, rounds=3)
    row = adaboost_margin_errors(df, picks).collect()[0]
    model = _ref_fit(data)
    errs = s1 = 0
    for x1, x2, y in data:
        margin = 0.0
        for i, (fi, th, pol, eps, g, _) in enumerate(model):
            h = pol if (x1 if fi == 1 else x2) <= th else -pol
            a = 0.5 * math.log(g)
            margin += a if h == y else -a
            if i == 0 and h != y:
                s1 += 1
        if margin <= 1e-12:
            errs += 1
    assert row["stump1_errors"] == s1
    assert row["ensemble_errors"] == errs
    assert row["boosted_improves"]
    # the conjunction is unlearnable solo: boosting must cut errors
    assert row["ensemble_errors"] < 0.5 * row["stump1_errors"]


def test_rounds_validation(spark):
    df = spark.createDataFrame([(1, 1, 1)],
                               "x1: bigint, x2: bigint, y: bigint")
    with pytest.raises(ValueError):
        adaboost_stumps(df, rounds=0)
