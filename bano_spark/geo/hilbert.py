"""Hilbert space-filling-curve index — the locality-preserving sort
key for spatial bucketing/partitioning (Z-order's sibling with
strictly better locality: consecutive d are always grid neighbors).

Formulation: the top-down local-quadrant recursion — per level s the
quadrant id is (3*rx) XOR ry and coordinates reduce to the quadrant-
local frame ((x%s, y%s) rotated/reflected), so every intermediate
stays in [0, s) and the whole chain is non-negative integer
arithmetic. tests/test_wave9.py proves it equal to the canonical
bit-twiddling xy2d (Wikipedia/Hamilton) on the full order-4 grid.

Scale shape: ``hilbert_index`` is a pure column-expression chain
(``order`` levels of CASE/div/mod — whole-stage codegen, no UDF, no
shuffle); range-partitioning 10^12 points by ``hilbert_d`` gives each
partition a spatially compact tile, which is the point: co-located
spatial joins and cache-friendly scans without a geometry library.

``hilbert_cte_sql`` renders the SAME step table as a chained-CTE SQL
string for any dialect (the DuckDB oracle) — one source of truth for
the math, two execution engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _quad_case(rx: str, ry: str) -> str:
    """(3*rx) XOR ry for rx, ry in {0,1} as a CASE table (DuckDB's ^
    is exponentiation, so no portable XOR operator exists)."""
    return (f"CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
            f"WHEN {rx} = 0 THEN 1 WHEN {ry} = 0 THEN 3 ELSE 2 END")


def hilbert_index(df: DataFrame, order: int, x_col: str, y_col: str,
                  out_col: str = "hilbert_d") -> DataFrame:
    """Append the Hilbert curve index of integer grid coordinates
    (x_col, y_col) in [0, 2^order). Pure column expressions."""
    out = (df.withColumn("_hx", F.col(x_col).cast("bigint"))
             .withColumn("_hy", F.col(y_col).cast("bigint"))
             .withColumn("_hd", F.lit(0).cast("bigint")))
    for lvl in range(order - 1, -1, -1):
        s = 1 << lvl
        out = (out.withColumn("_rx", F.expr(f"(_hx div {s}) % 2"))
               .withColumn("_ry", F.expr(f"(_hy div {s}) % 2"))
               .withColumn("_hd", F.col("_hd") + F.lit(s * s)
                           * F.expr(_quad_case("_rx", "_ry")))
               .withColumn("_nx", F.when(F.col("_ry") == 1,
                                         F.expr(f"_hx % {s}"))
                           .when(F.col("_rx") == 0, F.expr(f"_hy % {s}"))
                           .otherwise(F.lit(s - 1) - F.expr(f"_hy % {s}")))
               .withColumn("_ny", F.when(F.col("_ry") == 1,
                                         F.expr(f"_hy % {s}"))
                           .when(F.col("_rx") == 0, F.expr(f"_hx % {s}"))
                           .otherwise(F.lit(s - 1) - F.expr(f"_hx % {s}")))
               .withColumn("_hx", F.col("_nx"))
               .withColumn("_hy", F.col("_ny")))
    return (out.withColumn(out_col, F.col("_hd"))
            .drop("_hx", "_hy", "_hd", "_rx", "_ry", "_nx", "_ny"))


def hilbert_cte_sql(base_select: str, order: int, dialect: str,
                    id_cols: str = "event_id") -> str:
    """Chained-CTE SQL computing the same index over ``base_select``
    (which must yield columns ``{id_cols}, hx, hy``). Returns a full
    WITH ... SELECT {id_cols}, hilbert_d statement."""
    d = " div " if dialect == "spark" else " // "
    parts = [f"WITH h{order} AS (SELECT {id_cols}, hx AS x, hy AS y, "
             f"CAST(0 AS BIGINT) AS dd FROM ({base_select}))"]
    for lvl in range(order - 1, -1, -1):
        s = 1 << lvl
        quad = _quad_case("rx", "ry")
        parts.append(f""",
h{lvl} AS (
  SELECT {id_cols},
         CASE WHEN ry = 1 THEN x % {s}
              WHEN rx = 0 THEN y % {s}
              ELSE {s - 1} - (y % {s}) END AS x,
         CASE WHEN ry = 1 THEN y % {s}
              WHEN rx = 0 THEN x % {s}
              ELSE {s - 1} - (x % {s}) END AS y,
         dd + {s * s} * ({quad}) AS dd
  FROM (SELECT {id_cols}, x, y, dd,
               (x{d}{s}) % 2 AS rx, (y{d}{s}) % 2 AS ry
        FROM h{lvl + 1}))""")
    parts.append(f"""
SELECT {id_cols}, dd AS hilbert_d FROM h0""")
    return "".join(parts)


def morton_expr_sql(x: str, y: str, order: int, dialect: str) -> str:
    """Morton (Z-order) index as a single integer expression over
    integer grid coordinates in [0, 2^order) — bit interleave spelled
    with div/mod so the identical text runs in Spark SQL and DuckDB.
    The comparison partner for the Hilbert index: Z-order is cheaper
    to compute but jumps 2^k cells at quadrant seams, which the
    wave-78 locality audit quantifies."""
    d = " div " if dialect == "spark" else " // "
    terms = []
    for i in range(order):
        s = 1 << i
        terms.append(f"(({x}{d}{s}) % 2) * {4 ** i}")
        terms.append(f"(({y}{d}{s}) % 2) * {2 * 4 ** i}")
    return "(" + " + ".join(terms) + ")"
