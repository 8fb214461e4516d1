"""Join-order chain advisor — the matrix-chain DP (Godbole's
algorithm, the core of System-R-style join ordering on a linear
chain) applied to relation-size chains: what does the OPTIMAL
parenthesization of a chain join cost vs the left-deep /
right-deep defaults a naive planner picks?

This is the engine reflecting on its own craft: with intermediate
cardinality p_{i-1} x p_i for the i-th relation, joining the span
(i..j) costs C(i,j) = min_r C(i,r) + C(r+1,j) +
p_{i-1} * p_r * p_j — exactly matrix-chain multiplication. The DP
runs as ONE Catalyst expression per group (the wave-138 discipline):
state is the list of DP rows indexed by span length, appended by a
fold over L = 2..n, each row a transform with an inner min-fold over
the split point; the dims array is LET-BOUND once so project
collapse cannot duplicate its constructor into the O(n^3) cell
references.

Exactness: dims are integers; every cell is sums/products of exact
integer-valued doubles folded over a fixed traversal — bit-identical
across engines (the DuckDB oracle replays with nested list-of-lists
accumulators).

Scale shape: two groupBys to build the per-group dims vector, then
O(groups) rows of O(n^3) expression work — no shuffles beyond that,
n (chain length) is model-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["chain_dp_sql", "join_chain_advisor", "join_chain_curve"]

INF = "CAST(1e+18 AS DOUBLE)"


def chain_dp_sql(dialect: str, p: str) -> str:
    """Full DP table (list of rows; row L holds C[L][i] for
    i = 1..n-L+1) over the dims array named `p` (length n+1,
    1-based); n = len(p) - 1."""
    if dialect == "spark":
        n = f"(size({p}) - 1)"
        cell = (f"element_at(element_at(C, CAST(r AS INT)), "
                f"CAST(i AS INT)) "
                f"+ element_at(element_at(C, CAST(L - r AS INT)), "
                f"CAST(i + r AS INT)) "
                f"+ element_at({p}, CAST(i AS INT)) "
                f"* element_at({p}, CAST(i + r AS INT)) "
                f"* element_at({p}, CAST(i + L AS INT))")
        # p is 1-based: p[i] = p_{i-1} of the chain (dims index off
        # by one handled here: cost term p_{i-1} p_r p_j reads
        # p[i], p[i+r], p[i+L])
        row = (f"transform(sequence(1, {n} - L + 1), i -> "
               f"aggregate(sequence(1, L - 1), {INF}, "
               f"(m, r) -> least(m, {cell})))")
        return (f"aggregate(sequence(2, {n}), "
                f"array(transform(sequence(1, {n}), "
                f"z -> CAST(0 AS DOUBLE))), "
                f"(C, L) -> concat(C, array({row})))")
    # the folded list's elements must share the accumulator's type
    # DOUBLE[][]: the init element is the 1-row table, each length
    # marker is double-wrapped [[L]] and read as vL[1][1]
    n = f"(len({p}) - 1)"
    L = "vL[1][1]"
    cell = (f"C[CAST(vr[1] AS INT)][CAST(i AS INT)] "
            f"+ C[CAST({L} - vr[1] AS INT)]"
            f"[CAST(i + vr[1] AS INT)] "
            f"+ {p}[CAST(i AS INT)] "
            f"* {p}[CAST(i + vr[1] AS INT)] "
            f"* {p}[CAST(i + {L} AS INT)]")
    row = (f"list_transform(generate_series(1, {n} - CAST({L} AS BIGINT)"
           f" + 1), i -> "
           f"list_reduce(list_prepend([{INF}], "
           f"list_transform(generate_series(1, CAST({L} AS BIGINT) - 1),"
           f" r -> [CAST(r AS DOUBLE)])), "
           f"(m, vr) -> [least(m[1], {cell})])[1])")
    return (f"list_reduce(list_prepend("
            f"[list_transform(generate_series(1, {n}), "
            f"z -> CAST(0 AS DOUBLE))], "
            f"list_transform(generate_series(2, {n}), "
            f"LL -> [[CAST(LL AS DOUBLE)]])), "
            f"(C, vL) -> list_append(C, {row}))")


def _left_deep(dialect: str, p: str) -> str:
    """Sum over k = 2..n of p1 * p_k * p_{k+1} (1-based array)."""
    if dialect == "spark":
        return (f"aggregate(sequence(2, size({p}) - 1), "
                f"CAST(0 AS DOUBLE), (t, k) -> "
                f"t + element_at({p}, 1) "
                f"* element_at({p}, CAST(k AS INT)) "
                f"* element_at({p}, CAST(k + 1 AS INT)))")
    return (f"list_reduce(list_prepend([CAST(0 AS DOUBLE)], "
            f"list_transform(generate_series(2, len({p}) - 1), "
            f"k -> [CAST(k AS DOUBLE)])), "
            f"(t, v) -> [t[1] + {p}[1] * {p}[CAST(v[1] AS INT)] "
            f"* {p}[CAST(v[1] AS INT) + 1]])[1]")


def _right_deep(dialect: str, p: str) -> str:
    """Sum over k = 2..n of p_{k-1}... mirrored: cost of folding from
    the right: sum over k = n-1..1 of p_k * p_{k+1} * p_{n+1} pattern
    — equivalently sum_{k=2..n} p_{k-1} * p_k * p_last (1-based:
    p[k-1] * p[k] * p[n+1])."""
    if dialect == "spark":
        last = f"element_at({p}, CAST(size({p}) AS INT))"
        return (f"aggregate(sequence(2, size({p}) - 1), "
                f"CAST(0 AS DOUBLE), (t, k) -> "
                f"t + element_at({p}, CAST(k - 1 AS INT)) "
                f"* element_at({p}, CAST(k AS INT)) * {last})")
    last = f"{p}[CAST(len({p}) AS INT)]"
    return (f"list_reduce(list_prepend([CAST(0 AS DOUBLE)], "
            f"list_transform(generate_series(2, len({p}) - 1), "
            f"k -> [CAST(k AS DOUBLE)])), "
            f"(t, v) -> [t[1] + {p}[CAST(v[1] AS INT) - 1] "
            f"* {p}[CAST(v[1] AS INT)] * {last}])[1]")


def _bound(expr_fn) -> str:
    """Let-bind the dims array once (wave-138 anti-inlining shell)."""
    dims = "transform(vc, x -> CAST(x.s AS DOUBLE))"
    return (f"element_at(transform(array(named_struct('p', {dims})), "
            f"bnd -> {expr_fn('bnd.p')}), 1)")


def _base(df: DataFrame, grp: str, order: str, size_col: str,
          min_dims: int) -> DataFrame:
    row = F.struct(F.col(order).cast("bigint").alias("o"),
                   F.col(size_col).cast("bigint").alias("s"))
    return (df.groupBy(F.col(grp).alias("g"))
            .agg(F.array_sort(F.collect_list(row)).alias("vc"))
            .filter(F.size("vc") >= min_dims))


def join_chain_advisor(df: DataFrame, grp: str, order: str,
                       size_col: str, *, min_dims: int = 4) -> DataFrame:
    """Per group: optimal chain-join cost vs left-deep / right-deep.
    Returns (grp, n_rel, cost_optimal, cost_left_deep,
    cost_right_deep, left_deep_penalty)."""
    d = _base(df, grp, order, size_col, min_dims)
    opt = F.expr(_bound(
        lambda p: f"element_at(element_at({chain_dp_sql('spark', p)}, "
                  f"CAST(size({p}) - 1 AS INT)), 1)"))
    ld = F.expr(_bound(lambda p: _left_deep("spark", p)))
    rd = F.expr(_bound(lambda p: _right_deep("spark", p)))
    return d.select(
        F.col("g").alias(grp),
        (F.size("vc") - 1).cast("bigint").alias("n_rel"),
        opt.cast("bigint").alias("cost_optimal"),
        ld.cast("bigint").alias("cost_left_deep"),
        rd.cast("bigint").alias("cost_right_deep"),
        F.round(ld / opt, 6).alias("left_deep_penalty"))


def join_chain_curve(df: DataFrame, grp: str, order: str,
                     size_col: str, *, min_dims: int = 4,
                     max_l: int = 6) -> DataFrame:
    """Per (group, L): optimal cost of joining the FIRST L relations
    (C[L][1]) for L = 2..max_l — the prefix-growth curve. Returns
    (grp, L, cost)."""
    d = _base(df, grp, order, size_col, min_dims)
    structs = ", ".join(
        "named_struct('L', {L}, 'cost', {e})".format(
            L=L, e=_bound(lambda p, L=L:
                          f"element_at(element_at("
                          f"{chain_dp_sql('spark', p)}, {L}), 1)"))
        for L in range(2, max_l + 1))
    return (d.filter(F.size("vc") >= max_l + 1)
            .select("g", F.explode(F.expr(f"array({structs})"))
                    .alias("c"))
            .select(F.col("g").alias(grp), F.col("c.L").alias("L"),
                    F.col("c.cost").cast("bigint").alias("cost")))
