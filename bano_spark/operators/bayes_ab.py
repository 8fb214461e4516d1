"""Exact Bayesian A/B evaluation with Beta-Binomial posteriors —
the closed-form P(p_B > p_A) for INTEGER posterior parameters
(Evan Miller's "Formulas for Bayesian A/B Testing", public):

    h(aA,bA,aB,bB) = sum_{i=0}^{aB-1}
        exp( lbeta(aA+i, bA+bB) - ln(bB+i)
             - lbeta(1+i, bB) - lbeta(aA, bA) )

and the expected-loss decision rule built from shifted-parameter h
calls. With a Beta(1,1) prior all parameters are integers, so
lgamma(n) = sum_{k=2}^{n-1} ln k — computed as an ORDERED fold
(ascending k), giving both engines the identical float-operation
sequence; the only residual divergence is libm ulps, absorbed by the
final round-6 (the bm25 precedent).

Scale shape: counts are one map-side-combinable aggregate per
experiment; the probability is a per-group fold whose cost is
O(aB * n) ln calls — bounded by the experiment subsample, and the
disclosed scale path is a broadcast lgamma table (one ln per integer,
shared) replacing the inner fold.

Ref parity: decision layer over the same keyed-aggregate shape as the
reference's per-commune quality counts (bano/sql batch stats).
"""

from __future__ import annotations

__all__ = ["lgamma_int", "lbeta_int", "prob_b_beats_a", "duck_lgamma",
           "duck_lbeta", "duck_prob"]


# ---------------------------------------------------------------------------
# Spark SQL expression builders (integer-argument lgamma via ordered
# fold; sequence(2, 1) descent guarded).
# ---------------------------------------------------------------------------

def lgamma_int(n: str) -> str:
    return (f"(CASE WHEN ({n}) <= 2 THEN CAST(0 AS DOUBLE) ELSE "
            f"aggregate(sequence(2, ({n}) - 1), CAST(0 AS DOUBLE), "
            f"(acc, k) -> acc + ln(CAST(k AS DOUBLE))) END)")


def lbeta_int(x: str, y: str) -> str:
    return (f"({lgamma_int(x)} + {lgamma_int(y)}"
            f" - {lgamma_int(f'(({x}) + ({y}))')})")


def prob_b_beats_a(aa: str, ba: str, ab: str, bb: str) -> str:
    """P(p_B > p_A) as a Spark SQL expression over integer posterior
    parameter columns/expressions."""
    term = (f"exp({lbeta_int(f'(({aa}) + i)', f'(({ba}) + ({bb}))')}"
            f" - ln(CAST(({bb}) + i AS DOUBLE))"
            f" - {lbeta_int('(1 + i)', bb)}"
            f" - {lbeta_int(aa, ba)})")
    return (f"aggregate(sequence(0, ({ab}) - 1), CAST(0 AS DOUBLE), "
            f"(acc, i) -> acc + {term})")


# ---------------------------------------------------------------------------
# DuckDB twins — identical float-op order (transform pre-lists the
# terms; the fold adds them in the same ascending order).
# ---------------------------------------------------------------------------

def duck_lgamma(n: str) -> str:
    return (f"(CASE WHEN ({n}) <= 2 THEN CAST(0 AS DOUBLE) ELSE "
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(generate_series(2, ({n}) - 1), "
            f"k -> ln(CAST(k AS DOUBLE)))), (acc, x) -> acc + x) END)")


def duck_lbeta(x: str, y: str) -> str:
    return (f"({duck_lgamma(x)} + {duck_lgamma(y)}"
            f" - {duck_lgamma(f'(({x}) + ({y}))')})")


def duck_prob(aa: str, ba: str, ab: str, bb: str) -> str:
    term = (f"exp({duck_lbeta(f'(({aa}) + i)', f'(({ba}) + ({bb}))')}"
            f" - ln(CAST(({bb}) + i AS DOUBLE))"
            f" - {duck_lbeta('(1 + i)', bb)}"
            f" - {duck_lbeta(aa, ba)})")
    return (f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(generate_series(0, ({ab}) - 1), "
            f"i -> {term})), (acc, x) -> acc + x)")
