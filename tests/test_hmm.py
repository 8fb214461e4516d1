"""Kernel tests for wave 123: scaled forward / forward-backward vs an
independent numpy implementation — exact ll, posterior normalization,
occupancy mass conservation, single-observation closed form."""

from __future__ import annotations

import math

import numpy as np
import pytest

from bano_spark.operators.hmm import (EMIT_P, INIT_P, TRANS_P,
                                      hmm_forward, hmm_posteriors)


def _np_fb(obs):
    I, T, E = map(np.array, (INIT_P, TRANS_P, EMIT_P))
    alphas, ll = [], 0.0
    a = I * E[:, obs[0]]
    c = a.sum(); a = a / c; ll += math.log(c); alphas.append(a)
    for o in obs[1:]:
        a = (a @ T) * E[:, o]
        c = a.sum(); a = a / c; ll += math.log(c); alphas.append(a)
    betas = [np.ones(3) / 3]
    for o in reversed(obs[1:]):
        b = T @ (E[:, o] * betas[-1])
        betas.append(b / b.sum())
    betas = betas[::-1]
    g = np.array([af * bf / (af * bf).sum()
                  for af, bf in zip(alphas, betas)])
    return ll, alphas[-1], g


OBS = [0, 4, 2, 1, 1, 3, 4, 0, 2, 4, 1, 0]


def _df(spark, obs=OBS):
    return spark.createDataFrame([("u", i, o) for i, o in enumerate(obs)],
                                 "k: string, t: bigint, x: int")


def test_forward_matches_numpy(spark):
    r = hmm_forward(_df(spark), "k", "t", "x").collect()[0]
    ll, a, _ = _np_fb(OBS)
    assert r["ll"] == pytest.approx(ll, rel=1e-14)
    assert [r["a0"], r["a1"], r["a2"]] == pytest.approx(list(a), rel=1e-14)


def test_occupancy_matches_numpy_and_conserves_mass(spark):
    r = hmm_posteriors(_df(spark), "k", "t", "x").collect()[0]
    _, _, g = _np_fb(OBS)
    occ = g.sum(axis=0)
    got = [r["occ0"], r["occ1"], r["occ2"]]
    assert got == pytest.approx(list(occ), rel=1e-12)
    # posteriors at each t sum to 1 => occupancies sum to T
    assert sum(got) == pytest.approx(len(OBS), rel=1e-12)


def test_single_observation_closed_form(spark):
    # T=1: posterior = init*emit normalized; ll = ln(sum)
    r = hmm_forward(_df(spark, [2]), "k", "t", "x").collect()[0]
    un = [INIT_P[j] * EMIT_P[j][2] for j in range(3)]
    s = sum(un)
    assert r["ll"] == pytest.approx(math.log(s), rel=1e-15)
    assert [r["a0"], r["a1"], r["a2"]] == pytest.approx(
        [u / s for u in un], rel=1e-15)
    r2 = hmm_posteriors(_df(spark, [2]), "k", "t", "x").collect()[0]
    assert [r2["occ0"], r2["occ1"], r2["occ2"]] == pytest.approx(
        [u / s for u in un], rel=1e-15)


def test_posterior_favors_frustrated_on_error_burst(spark):
    # state 2 dominates emission of 'error' (obs 1): a long error run
    # must put most occupancy mass on state 2
    r = hmm_posteriors(_df(spark, [1] * 10), "k", "t", "x").collect()[0]
    assert r["occ2"] > r["occ0"] + r["occ1"]
