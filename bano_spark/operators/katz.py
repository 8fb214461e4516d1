"""Truncated Katz centrality with exact dyadic arithmetic.

Katz (1953) scores a node by its attenuated path count:
score(v) = sum_{k>=1} beta^k * |paths of length k ending at v|.
The infinite series needs beta < 1/lambda_max; the TRUNCATED form
(sum to K) is what web-graph practice uses, and with beta = 1/4 it
admits an EXACT integer formulation: katz_num(v) = sum_{k=1..K}
4^(K-k) * p_k(v) is an integer (p_k = path counts), and
score = katz_num / 4^K is a single division by a power of two —
bit-identical across engines, no float accumulation anywhere.

Distributed shape: p_k propagates by one equi-join (edges x p_{k-1}
on the source) + one groupBy sum per round — the PageRank shape
without the dangling-mass correction; K rounds, each
localCheckpoint()ed.  At web scale the join is a hash exchange on
the node key; hub skew is the usual salting candidate but the
aggregation is map-side combinable (counts, not lists).

Ref parity: the reference ranks OSM street importance by incoming
reference counts (bano/sql/importance.sql one-hop); Katz is the
k-hop attenuated generalization of that same signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["path_counts", "katz_truncated"]


def path_counts(edges: DataFrame, nodes: DataFrame, k: int,
                src: str = "src", dst: str = "dst",
                init: DataFrame | None = None) -> DataFrame:
    """p_j(v) for j = 1..k: rows (node, j, paths) — exact integer
    path counts of length j ending at v (walks; revisits count).
    `init` overrides the all-ones start mass with (node, paths) —
    the personalized / seeded variant."""
    if init is None:
        cur = nodes.select(F.col("node"), F.lit(1).cast("bigint")
                           .alias("paths"))
    else:
        cur = init.select("node", F.col("paths").cast("bigint")
                          .alias("paths"))
    out = None
    for j in range(1, k + 1):
        cur = (edges
               .join(cur.withColumnRenamed("node", src), src)
               .groupBy(F.col(dst).alias("node"))
               .agg(F.sum("paths").cast("bigint").alias("paths"))
               .localCheckpoint(eager=False))
        lay = cur.withColumn("j", F.lit(j).cast("bigint"))
        out = lay if out is None else out.unionByName(lay)
    return out.select("node", "j", "paths")


def katz_truncated(edges: DataFrame, nodes: DataFrame, k: int = 4,
                   src: str = "src", dst: str = "dst",
                   init: DataFrame | None = None) -> DataFrame:
    """(node, katz_num, katz_score) with beta = 1/4:
    katz_num = sum_j 4^(k-j) p_j(v)  (exact bigint);
    katz_score = katz_num / 4^k      (exact dyadic double).
    Unreached nodes score 0."""
    pc = path_counts(edges, nodes, k, src, dst, init=init)
    # 4^(k-j) = 1 << (2*(k-j)): pure integer, no libm
    num = pc.select(
        "node",
        (F.col("paths")
         * F.expr(f"shiftleft(1, 2 * ({k} - j))")).alias("w"))
    agg = num.groupBy("node").agg(F.sum("w").cast("bigint")
                                  .alias("katz_num"))
    return (nodes.join(agg, "node", "left")
            .select("node",
                    F.coalesce("katz_num", F.lit(0)).cast("bigint")
                    .alias("katz_num"))
            .withColumn("katz_score",
                        F.col("katz_num") / F.lit(float(4 ** k))))
