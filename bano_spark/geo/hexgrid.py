"""Hexagonal cell binning — the H3-style index next to tiles.py.

The slippy-tile grid (geo/tiles.py) is the engine's workhorse cell
index; hex grids are the other half of the H3/S2 story: equidistant
neighbors (all 6 at the same center distance, vs 4+4 on squares), so
k-ring density analytics don't carry the square grid's diagonal bias.
This module bins EPSG:3857 points to pointy-top hexagons of a given
circumradius via the classic axial/cube-rounding construction (the
same cell-assignment math H3 uses per face, minus the icosahedron).

Everything is generated ONCE as SQL text (`hex_steps`) and consumed by
both engines — Spark via chained `F.expr` projections (whole-stage
codegen), DuckDB verbatim as chained CTE selects — so cell ids agree
bit-for-bit: the inputs are doubles, every literal is CAST to DOUBLE
(DuckDB would otherwise read them as DECIMAL), and round() is
half-away-from-zero in both engines.

Scale shape: pure column arithmetic, no UDF, no shuffle; the (q, r)
pair hashes well as a join/groupBy key and composes with the salting
machinery exactly like tile ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SQRT3_3 = 0.5773502691896258  # sqrt(3)/3
_THIRD = 0.3333333333333333
_TWO_THIRDS = 0.6666666666666666


def hex_steps(x: str, y: str, size: float) -> list[tuple[str, str]]:
    """Ordered (name, sql_expr) steps from point columns to the axial
    hex cell (hq, hr). Each expression may reference earlier names —
    valid in both Spark SQL and DuckDB."""
    s = repr(float(size))
    return [
        ("fq", f"(CAST({_SQRT3_3!r} AS DOUBLE) * {x} "
               f"- CAST({_THIRD!r} AS DOUBLE) * {y}) / CAST({s} AS DOUBLE)"),
        ("fr", f"(CAST({_TWO_THIRDS!r} AS DOUBLE) * {y}) / CAST({s} AS DOUBLE)"),
        ("rx", "round(fq)"),
        ("ry", "round(-fq - fr)"),
        ("rz", "round(fr)"),
        ("dx", "abs(rx - fq)"),
        ("dy", "abs(ry - (-fq - fr))"),
        ("dz", "abs(rz - fr)"),
        ("hq", "CAST(CASE WHEN dx > dy AND dx > dz THEN -ry - rz "
               "ELSE rx END AS BIGINT)"),
        ("hr", "CAST(CASE WHEN NOT (dx > dy AND dx > dz) AND NOT (dy > dz) "
               "THEN -rx - ry ELSE rz END AS BIGINT)"),
    ]


def hex_cells_cte(src: str, size: float, *, x: str = "x", y: str = "y",
                  keep: str = "*") -> str:
    """DuckDB/Spark-SQL CTE chain binning ``src`` rows to hex cells;
    exposes relation ``hexed`` with ``keep`` columns plus (hq, hr)."""
    parts, prev = [], src
    for i, (name, expr) in enumerate(hex_steps(x, y, size)):
        rel = "hexed" if i == len(hex_steps(x, y, size)) - 1 else f"h{i}"
        parts.append(f"{rel} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = rel
    cleanup = (f"hexed_out AS (SELECT {keep}, hq, hr FROM hexed)")
    return ",\n".join(parts) + ",\n" + cleanup


def hex_bin(df: DataFrame, size: float, *, x: str = "x",
            y: str = "y") -> DataFrame:
    """Append axial hex cell columns (hq, hr) for EPSG:3857 points."""
    out = df
    for name, expr in hex_steps(x, y, size):
        out = out.withColumn(name, F.expr(expr))
    return out.drop("fq", "fr", "rx", "ry", "rz", "dx", "dy", "dz")


def hex_kring_offsets(k: int) -> list[tuple[int, int]]:
    """Axial offsets of the radius-k hex ring disk: all (dq, dr) with
    hex distance max(|dq|, |dr|, |dq+dr|) <= k — 3k(k+1)+1 cells."""
    return [(dq, dr)
            for dq in range(-k, k + 1)
            for dr in range(-k, k + 1)
            if max(abs(dq), abs(dr), abs(dq + dr)) <= k]


def hex_kring_smooth(cells: DataFrame, k: int = 1, *,
                     val_col: str = "val") -> DataFrame:
    """Mean of ``val_col`` over each OCCUPIED cell's k-ring disk,
    counting only occupied neighbors (the sparse-raster convention of
    operators/raster.focal_mean, on the hex lattice where all 6
    immediate neighbors are equidistant — no diagonal bias).

    Scale shape: one (3k(k+1)+1)-way offset explode + map-side partial
    agg + semi-join back to the occupied DISTINCT cell set (duplicate
    (hq, hr) input rows still contribute each value to the ring means,
    but the join-back never duplicates output rows — the same
    dedup contract as raster.focal_mean; ADVICE r3); shuffle volume
    scales with occupied cells only, never the lattice extent."""
    offs = F.array(*[F.struct(F.lit(dq).alias("dq"), F.lit(dr).alias("dr"))
                     for dq, dr in hex_kring_offsets(k)])
    contrib = (cells.select("hq", "hr", val_col,
                            F.explode(offs).alias("o"))
               .select((F.col("hq") + F.col("o.dq")).alias("hq"),
                       (F.col("hr") + F.col("o.dr")).alias("hr"),
                       F.col(val_col)))
    agg = (contrib.groupBy("hq", "hr")
           .agg(F.count("*").alias("n_neighbors"),
                F.round(F.avg(val_col), 6).alias("ring_mean")))
    return agg.join(cells.select("hq", "hr").distinct(), ["hq", "hr"])


def hex_kring_weighted(cells: DataFrame, k: int = 2, *,
                       val_col: str = "val") -> DataFrame:
    """Distance-decay smoothing (discrete KDE) over each occupied
    cell's k-ring disk: weight (k + 1 - ring) per neighbor — integer
    numerators, so the weighted sums are exact in doubles regardless
    of aggregation order, and ONE final division per cell is
    IEEE-identical across engines (the hex_kring_smooth discipline,
    plus triangular distance decay).

    Same scale shape as hex_kring_smooth: bounded offset explode,
    map-side partial agg, distinct join-back."""
    terms = []
    for dq, dr in hex_kring_offsets(k):
        ring = max(abs(dq), abs(dr), abs(dq + dr))
        terms.append((dq, dr, k + 1 - ring))
    offs = F.array(*[F.struct(F.lit(dq).alias("dq"), F.lit(dr).alias("dr"),
                              F.lit(w).alias("w"))
                     for dq, dr, w in terms])
    contrib = (cells.select("hq", "hr", val_col,
                            F.explode(offs).alias("o"))
               .select((F.col("hq") + F.col("o.dq")).alias("hq"),
                       (F.col("hr") + F.col("o.dr")).alias("hr"),
                       (F.col(val_col) * F.col("o.w")).alias("wv"),
                       F.col("o.w").alias("w")))
    agg = (contrib.groupBy("hq", "hr")
           .agg(F.sum("wv").alias("_swv"), F.sum("w").alias("_sw")))
    return (agg.join(cells.select("hq", "hr").distinct(), ["hq", "hr"])
            .select("hq", "hr",
                    F.col("_sw").cast("bigint").alias("w_total"),
                    F.round(F.col("_swv") / F.col("_sw"), 6).alias("kde")))


def hex_morphology(cells: DataFrame) -> DataFrame:
    """Morphological classification of an occupied hex-cell set:

    - ``interior``: occupied, all 6 ring-1 neighbors occupied (the
      erosion of the set);
    - ``boundary``: occupied, at least one neighbor missing
      (set minus erosion);
    - ``halo``: NOT occupied but adjacent to an occupied cell
      (dilation minus the set).

    The raster-algebra dilate/erode pair on the hex lattice — commune
    rasterization's edge detector (SURVEY §2 raster->vector) without
    a dense raster: shuffle scales with occupied cells (6-way offset
    explode + one groupBy + anti/semi joins on the cell key), never
    the lattice extent."""
    occ = cells.select("hq", "hr").distinct()
    offs = F.array(*[F.struct(F.lit(dq).alias("dq"), F.lit(dr).alias("dr"))
                     for dq, dr in [(1, 0), (-1, 0), (0, 1),
                                    (0, -1), (1, -1), (-1, 1)]])
    shifted = (occ.select(F.explode(offs).alias("o"), "hq", "hr")
               .select((F.col("hq") + F.col("o.dq")).alias("hq"),
                       (F.col("hr") + F.col("o.dr")).alias("hr")))
    nbr_counts = shifted.groupBy("hq", "hr").agg(
        F.count(F.lit(1)).alias("n_occ_nbrs"))
    occupied = (occ.join(nbr_counts, ["hq", "hr"], "left")
                .withColumn("n_occ_nbrs",
                            F.coalesce("n_occ_nbrs", F.lit(0)))
                .withColumn("cls", F.when(F.col("n_occ_nbrs") == 6,
                                          "interior").otherwise("boundary")))
    halo = (nbr_counts.join(occ, ["hq", "hr"], "left_anti")
            .withColumn("cls", F.lit("halo")))
    return occupied.unionByName(halo).select("hq", "hr", "cls", "n_occ_nbrs")
