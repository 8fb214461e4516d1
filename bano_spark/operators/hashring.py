"""Consistent-hash ring placement + rebalance audit — the classic
token ring (Karger et al. 1997; virtual nodes per Dynamo) next to the
engine's rendezvous_sharding: answers "if I add a server, which keys
move?" with the ring's defining guarantee that keys only move TO the
new server (~1/(N+1) of them), never between survivors.

Mechanics: the token table (n_servers * vnodes entries) is computed
in PYTHON at plan-build time from a fixed multiplicative hash and
embedded as a sorted ARRAY LITERAL in the expression, so assignment
is a pure O(tokens) JVM scan per row — no join, no shuffle, no UDF;
the oracle embeds the IDENTICAL literal. Successor rule: first token
with pos >= key hash, wrapping to the globally smallest token.

Scale shape: assignment is map-only; the rebalance audit shuffles
once into the O(N^2) (before, after) transition matrix and derives
per-server stats from that tiny table (broadcast-sized from the
first aggregate on).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["ring_tokens", "ring_assign_expr", "ring_rebalance"]

_M31 = 2147483648


def ring_tokens(n_servers: int, vnodes: int = 8) -> list[tuple[int, int]]:
    """Sorted (position, server) token list; deterministic
    multiplicative hash, no RNG."""
    return sorted(
        (((s * 131 + r) * 2654435761 + 17) % _M31, s)
        for s in range(n_servers) for r in range(vnodes))


def ring_assign_expr(hash_col: str,
                     tokens: list[tuple[int, int]]) -> Column:
    """Column: the ring successor's server id for `hash_col`."""
    lit = ", ".join(f"named_struct('pos', CAST({p} AS BIGINT), "
                    f"'srv', CAST({s} AS INT))" for p, s in tokens)
    first_srv = tokens[0][1]
    # get() (not [0]) so an empty successor set yields NULL under
    # ANSI mode and wraps to the smallest token via coalesce
    return F.expr(
        f"coalesce(get(filter(array({lit}), "
        f"e -> e.pos >= {hash_col}), 0).srv, CAST({first_srv} AS INT))")


def ring_rebalance(df: DataFrame, hash_col: str, *, n_before: int,
                   n_after: int, vnodes: int = 8) -> DataFrame:
    """Per-server placement audit across a ring resize: returns
    (server, n_before, n_after, moved_in, moved_out); consistent
    hashing guarantees moved_in == 0 for surviving servers' keys
    arriving from other survivors (all moves target new servers) —
    visible in the output."""
    ta = ring_tokens(n_before, vnodes)
    tb = ring_tokens(n_after, vnodes)
    m = (df.select(ring_assign_expr(hash_col, ta).alias("sa"),
                   ring_assign_expr(hash_col, tb).alias("sb"))
         .groupBy("sa", "sb").agg(F.count(F.lit(1)).alias("c")))
    servers = df.sparkSession.range(max(n_before, n_after)) \
        .select(F.col("id").cast("int").alias("server"))
    before = m.groupBy(F.col("sa").alias("server")) \
        .agg(F.sum("c").alias("n_before"))
    after = m.groupBy(F.col("sb").alias("server")) \
        .agg(F.sum("c").alias("n_after"))
    moved = m.filter(F.col("sa") != F.col("sb"))
    m_in = moved.groupBy(F.col("sb").alias("server")) \
        .agg(F.sum("c").alias("moved_in"))
    m_out = moved.groupBy(F.col("sa").alias("server")) \
        .agg(F.sum("c").alias("moved_out"))
    out = servers
    for piece, col in [(before, "n_before"), (after, "n_after"),
                       (m_in, "moved_in"), (m_out, "moved_out")]:
        out = out.join(F.broadcast(piece), "server", "left")
    return out.select(
        "server",
        *[F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
          for c in ("n_before", "n_after", "moved_in", "moved_out")])
