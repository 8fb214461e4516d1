"""Spatial statistics over cell lattices: global Moran's I.

BANO's batch stats (bano/sql/batch_stats) stop at per-commune counts;
a web-scale geo corpus also wants to KNOW whether a per-cell metric
clusters spatially (hot spots) or scatters — Moran's I is the
standard global test (public formulation: Moran 1950; rook-adjacency
weights on the hex lattice, the 6 equidistant neighbors).

    I = (N / W) * sum_ij w_ij (x_i - m)(x_j - m) / sum_i (x_i - m)^2

with w_ij = 1 for occupied ring-1 neighbors, W = count of directed
neighbor pairs, m the mean over occupied cells.

Scale shape: per-cell values come from the caller's aggregation
(counts are exact integers); the neighbor term is a 6-way offset
explode + equi-join on the cell key (bounded, never a cross product);
the three sums are single aggregates with map-side partials. The mean
is computed exactly (integer sum / count) and shipped as a literal
into the second pass — an O(1) driver value, same discipline as
clustering.py's centroid literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# the 6 axial ring-1 neighbors of a pointy-top hex cell
HEX_NEIGHBORS = [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)]


def moran_i_hex(cells: DataFrame, *, val_col: str = "val",
                round_to: int = 6) -> DataFrame:
    """Global Moran's I of ``val_col`` over occupied hex cells
    (columns hq, hr) with ring-1 adjacency. Returns ONE row:
    (n_cells, w_pairs, moran_i).

    Two-pass: (1) exact mean over occupied cells; (2) deviation
    products over the neighbor join + the deviation-square sum. Both
    passes are plain aggregates; the join is equi on (hq, hr)."""
    stats = cells.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(val_col) / F.count(F.lit(1))).alias("m")).collect()[0]
    n, m = int(stats["n"]), float(stats["m"])

    dev = cells.select("hq", "hr",
                       (F.col(val_col) - F.lit(m)).alias("dev"))
    offs = F.array(*[F.struct(F.lit(dq).alias("dq"), F.lit(dr).alias("dr"))
                     for dq, dr in HEX_NEIGHBORS])
    shifted = (dev.select(F.explode(offs).alias("o"), "hq", "hr", "dev")
               .select((F.col("hq") + F.col("o.dq")).alias("hq"),
                       (F.col("hr") + F.col("o.dr")).alias("hr"),
                       F.col("dev").alias("dev_nbr")))
    pairs = dev.join(shifted, ["hq", "hr"])

    num = pairs.agg(F.count(F.lit(1)).alias("w_pairs"),
                    F.sum(F.col("dev") * F.col("dev_nbr")).alias("cross"))
    den = dev.agg(F.sum(F.col("dev") ** 2).alias("ss"))
    return (num.crossJoin(den)  # two 1-row frames — O(1) by design
            .select(F.lit(n).alias("n_cells"),
                    F.col("w_pairs"),
                    F.round((F.lit(float(n)) / F.col("w_pairs"))
                            * F.col("cross") / F.col("ss"), round_to)
                    .alias("moran_i")))


def getis_ord_hex(cells: DataFrame, k: int = 1, *, val_col: str = "val",
                  round_to: int = 6) -> DataFrame:
    """Getis-Ord Gi* hot-spot z-score per occupied hex cell over the
    k-ring disk (weights 1, self included — the * variant; public
    formulation: Getis & Ord 1992):

        Gi* = (S_i - mean * m_i)
              / (s * sqrt((n * m_i - m_i^2) / (n - 1)))

    with S_i the ring sum, m_i the OCCUPIED ring size (sparse-lattice
    convention, matching hexgrid.hex_kring_smooth), mean/s the global
    moments. Global moments come from one exact aggregate (integer
    sums) shipped as literals; ring sums from the bounded offset
    explode — the same two-pass shape as :func:`moran_i_hex`."""
    from ..geo.hexgrid import hex_kring_offsets

    g = cells.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(val_col) / F.count(F.lit(1))).alias("mean"),
        (F.sum(F.col(val_col) ** 2) / F.count(F.lit(1))).alias("msq"),
    ).collect()[0]
    n, mean = int(g["n"]), float(g["mean"])
    import math

    s = math.sqrt(float(g["msq"]) - mean * mean)

    offs = F.array(*[F.struct(F.lit(dq).alias("dq"), F.lit(dr).alias("dr"))
                     for dq, dr in hex_kring_offsets(k)])
    contrib = (cells.select("hq", "hr", val_col,
                            F.explode(offs).alias("o"))
               .select((F.col("hq") + F.col("o.dq")).alias("hq"),
                       (F.col("hr") + F.col("o.dr")).alias("hr"),
                       F.col(val_col)))
    rings = (contrib.groupBy("hq", "hr")
             .agg(F.sum(val_col).alias("s_i"),
                  F.count(F.lit(1)).alias("m_i")))
    out = rings.join(cells.select("hq", "hr").distinct(), ["hq", "hr"])
    m_i = F.col("m_i").cast("double")
    denom = F.lit(s) * F.sqrt((F.lit(float(n)) * m_i - m_i * m_i)
                              / F.lit(float(n - 1)))
    return out.select(
        "hq", "hr", F.col("m_i").cast("bigint").alias("ring_size"),
        F.round((F.col("s_i") - F.lit(mean) * m_i) / denom, round_to)
        .alias("gi_z"))
