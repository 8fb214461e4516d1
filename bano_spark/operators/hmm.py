"""HMM sum-product inference — the forward algorithm (marginal
log-likelihood) and forward-backward posterior state marginals — as
JVM aggregate folds over per-group bounded sequences: the sum-product
twin of operators/decoding.py's max-product Viterbi (same collect_list
+ fold shape, same scale contract: one shuffle on the sequence key,
O(K) / O(T*K) fold state, no Python, no global window).

Exactness: the model is DYADIC probabilities (x/16 grids), and every
alpha/beta/gamma value is a fixed chain of IEEE multiplications,
additions (literal left-to-right order) and divisions on those — so
normalized forward/backward vectors and posterior marginals are
BIT-IDENTICAL across engines; only the log-likelihood touches libm
ln() (once per step, summed), so ll is rounded to 6 while posteriors
can ship unrounded.

Numerics: per-step normalization (scaled forward/backward) keeps all
state in [0, 1] — no underflow at any sequence length; ll accumulates
the log scale factors (Rabiner 1989 eq. 91-103 scaling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["INIT_P", "TRANS_P", "EMIT_P", "hmm_forward",
           "hmm_posteriors"]

# 3 hidden states x 5 observation symbols, every row an exact /16 grid
INIT_P = [0.625, 0.25, 0.125]
TRANS_P = [[0.625, 0.25, 0.125],
           [0.25, 0.625, 0.125],
           [0.125, 0.375, 0.5]]
EMIT_P = [[0.375, 0.0625, 0.0625, 0.125, 0.375],
          [0.1875, 0.0625, 0.375, 0.125, 0.25],
          [0.1875, 0.4375, 0.0625, 0.125, 0.1875]]
K = 3


def _da(vals) -> str:
    return "array(" + ", ".join(f"CAST({v!r} AS DOUBLE)"
                                for v in vals) + ")"


def _da2(mat) -> str:
    return "array(" + ", ".join(_da(r) for r in mat) + ")"


def _seq(df: DataFrame, grp: str, order: str, obs: str) -> DataFrame:
    row = F.struct(F.col(order).cast("bigint").alias("o"),
                   F.col(obs).cast("int").alias("x"))
    return (df.groupBy(F.col(grp).alias("k"))
            .agg(F.array_sort(F.collect_list(row)).alias("seq")))


def _ap_expr(prev: str) -> str:
    """Unnormalized next alpha vector given `prev` (an array expr for
    the previous normalized alpha, or '' for the init step)."""
    ini, tra, emi = _da(INIT_P), _da2(TRANS_P), _da2(EMIT_P)
    if not prev:
        return (f"transform(sequence(0, {K - 1}), "
                f"j -> {ini}[j] * {emi}[j][r.x])")
    dot = " + ".join(f"{prev}[{i}] * {tra}[{i}][j]" for i in range(K))
    return (f"transform(sequence(0, {K - 1}), "
            f"j -> ({dot}) * {emi}[j][r.x])")


def hmm_forward(df: DataFrame, grp: str, order: str, obs: str) -> DataFrame:
    """Scaled forward pass per group: (k, n_obs, ll, a0, a1, a2) with
    ll the total log-likelihood and a* the final posterior
    P(state_T | obs_1..T) (= normalized alpha_T)."""
    norm = ("aggregate(array(ap[0] + ap[1] + ap[2]), a0, (a1, c) -> "
            "named_struct('ll', a1.ll + ln(c), "
            "'a', transform(ap, v -> v / c)))")
    fold = F.expr(f"""
        aggregate(seq,
          named_struct('ll', CAST(0 AS DOUBLE),
                       'a', CAST(array() AS array<double>)),
          (acc, r) -> aggregate(
            array(IF(size(acc.a) = 0, {_ap_expr('')},
                     {_ap_expr('acc.a')})),
            acc, (a0, ap) -> {norm}))""")
    return (_seq(df, grp, order, obs)
            .select("k", F.size("seq").cast("bigint").alias("n_obs"),
                    fold.alias("st"))
            .select("k", "n_obs", F.col("st.ll").alias("ll"),
                    F.col("st.a")[0].alias("a0"),
                    F.col("st.a")[1].alias("a1"),
                    F.col("st.a")[2].alias("a2")))


def hmm_posteriors(df: DataFrame, grp: str, order: str,
                   obs: str) -> DataFrame:
    """Forward-backward posterior occupancy per group: (k, n_obs,
    occ0, occ1, occ2) — the expected number of steps spent in each
    state, sum_t P(state_t = j | obs_1..T). Bit-exact (no ln in the
    posterior path)."""
    tra, emi = _da2(TRANS_P), _da2(EMIT_P)
    # forward with history: struct(h: array<array<double>>)
    fwd = F.expr(f"""
        aggregate(seq,
          CAST(array() AS array<array<double>>),
          (h, r) -> aggregate(
            array(IF(size(h) = 0, {_ap_expr('')},
                     {_ap_expr('element_at(h, -1)')})),
            h, (h0, ap) -> aggregate(
              array(ap[0] + ap[1] + ap[2]), h0,
              (h1, c) -> h1 || array(transform(ap, v -> v / c)))))""")
    # backward with history over the reversed sequence:
    # struct(px: int, h: array<array<double>>); h in reverse time order
    bdot = " + ".join(
        f"{tra}[i][{j}] * {emi}[{j}][acc.px] "
        f"* element_at(acc.h, -1)[{j}]" for j in range(K))
    bwd = F.expr(f"""
        aggregate(reverse(seq),
          named_struct('px', -1,
                       'h', CAST(array() AS array<array<double>>)),
          (acc, r) -> IF(acc.px = -1,
            named_struct('px', r.x, 'h',
              array(transform(sequence(0, {K - 1}),
                              j -> CAST({(1.0 / 3.0)!r} AS DOUBLE)))),
            aggregate(
              array(transform(sequence(0, {K - 1}), i -> {bdot})),
              acc, (a0, bp) -> aggregate(
                array(bp[0] + bp[1] + bp[2]), a0,
                (a1, c) -> named_struct('px', r.x,
                  'h', a1.h || array(transform(bp, v -> v / c)))))))
        .h""")
    den = " + ".join(f"fh[t][{j}] * bh[size(fh) - 1 - t][{j}]"
                     for j in range(K))
    occ = [F.expr(f"""
        aggregate(sequence(0, size(fh) - 1), CAST(0 AS DOUBLE),
          (s, t) -> s + aggregate(array({den}), CAST(0 AS DOUBLE),
            (z, dn) -> fh[t][{j}] * bh[size(fh) - 1 - t][{j}] / dn))
        """).alias(f"occ{j}") for j in range(K)]
    return (_seq(df, grp, order, obs)
            .select("k", F.size("seq").cast("bigint").alias("n_obs"),
                    fwd.alias("fh"), bwd.alias("bh"))
            .select("k", "n_obs", *occ))
