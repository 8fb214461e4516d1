"""Set reconciliation via an invertible Bloom lookup table (IBLT).

Eppstein et al., SIGCOMM 2011 ("What's the Difference?"): to sync two
replicas without shipping either set, each side aggregates its keys
into m cells of (count, keySum, hashSum) under 3 hash functions; the
CELL-WISE DIFFERENCE of the two tables encodes the symmetric
difference, and peeling "pure" cells (|count| = 1 and hashSum =
count * h(count * keySum)) recovers every differing key with high
probability when m >= ~1.5|diff|.

Everything is integer sums, so the sketch (and therefore the decode)
is bit-identical on any engine/topology; peeling runs as FIXED
synchronous rounds — the decoded set after round r is independent of
intra-round order.

Ref parity: this IS the reference's nightly diff problem
(cron_osm.sh imposm diff + expire_tiles): find which addresses
changed between snapshots without rescanning France.  The IBLT does
it with O(|diff|) communication instead of O(|table|).

Scale shape: encoding is ONE hash aggregate over keys x 3 hash
functions (map-side combinable; the shuffle carries m cells, not
rows); each peel round joins the O(m)-cell table with the O(|diff|)
decoded set — broadcast-sized by construction.  Rounds are bounded
(default 10); an undecodable residue is REPORTED, never silently
dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

IB_A = [2654435761, 2246822519, 3266489917]
IB_B = [101, 1013904223, 374761393]
IB_P = 2147483647
CHECK_MUL = 40503
CHECK_MOD = 1000003


def _hcell(key, j: int, m: int):
    return ((key * IB_A[j] + IB_B[j]) % IB_P) % m


def _hcheck(key):
    return (key * CHECK_MUL + 7919) % CHECK_MOD


def iblt_cells(keys: DataFrame, key_col: str, side_col: str,
               m: int) -> DataFrame:
    """Cell table of the signed key multiset: side is +1 (set A) or
    -1 (set B); A's cells minus B's cells come out directly."""
    k = F.col(key_col).cast("bigint")
    s = F.col(side_col).cast("bigint")
    rows = None
    for j in range(3):
        r = keys.select(F.lit(j).alias("j"),
                        _hcell(k, j, m).alias("cell"),
                        s.alias("cnt"), (s * k).alias("ks"),
                        (s * _hcheck(k)).alias("hs"))
        rows = r if rows is None else rows.unionByName(r)
    return (rows.groupBy("j", "cell")
            .agg(F.sum("cnt").cast("bigint").alias("cnt"),
                 F.sum("ks").cast("bigint").alias("ks"),
                 F.sum("hs").cast("bigint").alias("hs")))


def iblt_decode(cells: DataFrame, m: int, *,
                rounds: int = 10) -> DataFrame:
    """Synchronous peeling: each round decodes every currently-pure
    cell, then subtracts ALL decoded keys' contributions from the
    base cells.  Returns (key, side) for the decoded symmetric
    difference (side +1 = only in A, -1 = only in B)."""
    spark = cells.sparkSession
    base = cells.localCheckpoint(eager=False)
    decoded = spark.createDataFrame([], "key bigint, side bigint")
    for _ in range(rounds):
        contrib = None
        k = F.col("key")
        for j in range(3):
            r = decoded.select(F.lit(j).alias("j"),
                               _hcell(k, j, m).alias("cell"),
                               F.col("side").alias("dcnt"),
                               (F.col("side") * k).alias("dks"),
                               (F.col("side") * _hcheck(k)).alias("dhs"))
            contrib = r if contrib is None else contrib.unionByName(r)
        agg = (contrib.groupBy("j", "cell")
               .agg(F.sum("dcnt").alias("dcnt"),
                    F.sum("dks").alias("dks"),
                    F.sum("dhs").alias("dhs")))
        cur = (base.join(F.broadcast(agg), ["j", "cell"], "left")
               .fillna(0, ["dcnt", "dks", "dhs"])
               .select("j", "cell",
                       (F.col("cnt") - F.col("dcnt")).alias("cnt"),
                       (F.col("ks") - F.col("dks")).alias("ks"),
                       (F.col("hs") - F.col("dhs")).alias("hs")))
        pure = (cur.filter(
            F.col("cnt").isin(1, -1)
            & (F.col("hs") == F.col("cnt")
               * ((F.col("cnt") * F.col("ks") * CHECK_MUL + 7919)
                  % CHECK_MOD)))
            .select((F.col("cnt") * F.col("ks")).alias("key"),
                    F.col("cnt").alias("side"))
            .distinct())
        decoded = (decoded.unionByName(pure).distinct()
                   .localCheckpoint(eager=False))
    return decoded


def iblt_residue(cells: DataFrame, decoded: DataFrame,
                 m: int) -> DataFrame:
    """Cells left non-empty after subtracting the decoded keys — a
    nonzero count means the decode is incomplete (reported loudly)."""
    contrib = None
    k = F.col("key")
    for j in range(3):
        r = decoded.select(F.lit(j).alias("j"),
                           _hcell(k, j, m).alias("cell"),
                           F.col("side").alias("dcnt"),
                           (F.col("side") * k).alias("dks"),
                           (F.col("side") * _hcheck(k)).alias("dhs"))
        contrib = r if contrib is None else contrib.unionByName(r)
    agg = (contrib.groupBy("j", "cell")
           .agg(F.sum("dcnt").alias("dcnt"),
                F.sum("dks").alias("dks"),
                F.sum("dhs").alias("dhs")))
    return (cells.join(F.broadcast(agg), ["j", "cell"], "left")
            .fillna(0, ["dcnt", "dks", "dhs"])
            .select("j", "cell",
                    (F.col("cnt") - F.col("dcnt")).alias("cnt"),
                    (F.col("ks") - F.col("dks")).alias("ks"))
            .filter((F.col("cnt") != 0) | (F.col("ks") != 0)))
