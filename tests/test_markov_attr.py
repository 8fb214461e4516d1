"""Kernel tests for wave 98: the chain solve vs an exact NumPy-free
linear-algebra fixpoint, removal-effect structure, and convergence of
the horizon truncation."""

from __future__ import annotations

from fractions import Fraction

import pytest

from bano_spark.operators.markov_attr import (chain_conversion_prob,
                                              markov_removal_attribution)

# toy chain: 0=START 1=A 2=B 3=CONV 4=NULL
TRANS = [(0, 1, 6), (0, 2, 4), (1, 2, 5), (1, 3, 3), (1, 4, 2),
         (2, 3, 4), (2, 4, 6)]


def exact_fixpoint():
    """Solve p = T p exactly with fractions (absorbing CONV/NULL)."""
    # p4 = 0, p3 = 1; p2 = 0.4; p1 = (5*p2 + 3) / 10; p0 = ...
    p2 = Fraction(4, 10)
    p1 = (Fraction(5, 10) * p2 + Fraction(3, 10))
    p0 = Fraction(6, 10) * p1 + Fraction(4, 10) * p2
    return p0, p1, p2


@pytest.fixture(scope="module")
def trans_df(spark):
    return spark.createDataFrame(TRANS, "src long, dst long, cnt long")


def test_chain_value_converges_to_fixpoint(trans_df):
    # this DAG chain converges EXACTLY after 3 steps
    p0, _, _ = exact_fixpoint()
    got = chain_conversion_prob(trans_df, n_states=5, start=0, conv=3,
                                null=4, horizon=12).collect()[0]
    assert got["p_start"] == pytest.approx(float(p0), abs=1e-15)


def test_removal_effect_structure(trans_df):
    out = {r["channel"]: r for r in markov_removal_attribution(
        trans_df, [1, 2], ["A", "B"], n_states=5, start=0, conv=3,
        null=4, horizon=12).collect()}
    p0, p1, p2 = exact_fixpoint()
    # removing A: START->A goes NULL; p = 0.4 * p2' with p2' = 0.4
    pA = Fraction(4, 10) * Fraction(4, 10)
    # removing B: A loses its B continuation; p0 = .6 * (3/10)
    pB = Fraction(6, 10) * Fraction(3, 10)
    assert out["A"]["p_removed"] == pytest.approx(float(pA), abs=1e-15)
    assert out["B"]["p_removed"] == pytest.approx(float(pB), abs=1e-15)
    reA = 1 - float(pA / p0)
    reB = 1 - float(pB / p0)
    assert out["A"]["removal_effect"] == pytest.approx(reA, abs=1e-12)
    assert out["B"]["removal_effect"] == pytest.approx(reB, abs=1e-12)
    assert (out["A"]["share"] + out["B"]["share"]
            == pytest.approx(1.0, abs=1e-12))
    # A carries more conversions than B in this chain
    assert out["A"]["removal_effect"] > out["B"]["removal_effect"]


def test_cyclic_chain_horizon_truncation(spark):
    # A <-> B cycle with leak to CONV: p converges geometrically; at
    # horizon 12 the truncation error is < (cycle mass)^6 ~ 1e-4 of
    # the fixpoint.
    trans = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 5), (1, 3, 5), (2, 1, 5), (2, 4, 5)],
        "src long, dst long, cnt long")
    got = chain_conversion_prob(trans, n_states=5, start=0, conv=3,
                                null=4, horizon=12).collect()[0]
    # exact fixpoint: p1 = .5 + .5 p2 ; p2 = .5 p1 -> p1 = 2/3
    assert got["p_start"] == pytest.approx(2 / 3, abs=1e-3)
