"""Inverted-index posting-list compression advisor.

Given postings (term -> sorted doc ids), estimate the cost of the
three standard physical encodings and pick parameters — the storage
planner a web-scale index build runs BEFORE writing its index shards:

- **varint (VByte) delta coding**: per-gap byte count is a closed-form
  CASE ladder on the gap magnitude (1 byte per started 7-bit group),
  summed map-side.  Exact integers; compares against the raw 4-byte
  encoding.
- **Rice/Golomb parameter selection**: the cost of Rice(b) over gaps g
  is sum((g-1) >> b) + n*(b+1) bits (unary quotient + stop bit + b
  remainder bits).  The advisor evaluates ALL b in [0, bmax] with a
  constant-factor explode (x bmax rows), aggregates per (term, b)
  map-side, and argmins with one keyed window — never a per-term loop.
- **Roaring container classification**: ids partition by high bits
  (container = id div 65536); a container of cardinality c with r
  ascending runs costs min(2c [array], 8192 [bitmap], 2 + 4r [run])
  bytes.  Run counting is a keyed lag scan (gap > 1 opens a run).

Scale design: everything is groupBy/window over (term[, container]) —
one hash exchange each; the b-explode multiplies rows by a constant
(<= 16), not by data; per-gap costs fold map-side into partial sums
before any shuffle.  Skewed stopword terms are single hot keys whose
per-container sub-aggregation (roaring) already splits them; the
varint/rice pass over a stopword posting is a partial-agg scan, not a
blowup.

Ref parity: the reference materializes per-department CSV/json exports
sized for static hosting (bano/sql/export_*.sql); this operator is the
same "estimate the physical encoding before writing" planning step
applied to index shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["varint_size", "rice_optimal", "roaring_advisor", "gaps"]


def gaps(postings: DataFrame, term: str = "term",
         id_col: str = "gid") -> DataFrame:
    """Delta-code the posting list: gap from the previous id (the
    first id gaps from -1 so every gap >= 1).  One keyed window."""
    w = Window.partitionBy(term).orderBy(id_col)
    return postings.withColumn(
        "gap", (F.col(id_col) - F.coalesce(F.lag(id_col).over(w),
                                           F.lit(-1))).cast("bigint"))


def _varint_bytes(gap):
    return (F.when(gap < 128, 1).when(gap < 16384, 2)
            .when(gap < 2097152, 3).when(gap < 268435456, 4)
            .otherwise(5))


def varint_size(postings: DataFrame, term: str = "term",
                id_col: str = "gid") -> DataFrame:
    """Per-term VByte cost of the delta-coded posting list vs the raw
    fixed 4-byte encoding.  Exact integer bytes."""
    g = gaps(postings, term, id_col)
    return (g.groupBy(term).agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.max("gap").cast("bigint").alias("max_gap"),
        F.sum(_varint_bytes(F.col("gap"))).cast("bigint")
        .alias("varint_bytes"),
        (F.count(F.lit(1)) * 4).cast("bigint").alias("raw_bytes")))


def rice_optimal(postings: DataFrame, term: str = "term",
                 id_col: str = "gid", bmax: int = 14) -> DataFrame:
    """Optimal Rice parameter per posting list.

    cost_bits(b) = sum((g-1) >> b) + n * (b + 1); ties break to the
    smallest b.  Returns (term, best_b, best_bits, df).
    """
    g = gaps(postings, term, id_col)
    per_b = (g.withColumn("b", F.explode(F.sequence(F.lit(0),
                                                    F.lit(bmax))))
             .groupBy(term, "b")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.expr("shiftright(gap - 1, b)"))
                  .alias("q_bits"))
             .withColumn("bits", (F.col("q_bits")
                                  + F.col("n") * (F.col("b") + 1))
                         .cast("bigint")))
    w = Window.partitionBy(term).orderBy(F.col("bits").asc(),
                                         F.col("b").asc())
    return (per_b.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(term, F.col("b").cast("bigint").alias("best_b"),
                    F.col("bits").alias("best_bits"),
                    F.col("n").cast("bigint").alias("df")))


def roaring_advisor(postings: DataFrame, term: str = "term",
                    id_col: str = "gid") -> DataFrame:
    """Classify each (term, container) into its cheapest roaring
    encoding and roll the byte totals up per term.

    container = id div 65536; array = 2c bytes, bitmap = 8192 bytes,
    run = 2 + 4r bytes (r = number of maximal ascending runs).  Tie
    order: array, then run, then bitmap.
    """
    c = postings.withColumn("container",
                            (F.col(id_col) / 65536).cast("bigint"))
    w = Window.partitionBy(term, "container").orderBy(id_col)
    runs = c.withColumn(
        "new_run",
        F.when(F.col(id_col) - F.coalesce(F.lag(id_col).over(w),
                                          F.lit(-(2 ** 40))) > 1,
               1).otherwise(0))
    per_c = (runs.groupBy(term, "container")
             .agg(F.count(F.lit(1)).alias("c"),
                  F.sum("new_run").alias("r"))
             .withColumn("array_b", 2 * F.col("c"))
             .withColumn("run_b", 2 + 4 * F.col("r"))
             .withColumn("bitmap_b", F.lit(8192)))
    best_b = F.least("array_b", "run_b", "bitmap_b")
    ctype = (F.when(F.col("array_b") == best_b, "array")
             .when(F.col("run_b") == best_b, "run")
             .otherwise("bitmap"))
    typed = per_c.withColumn("bytes", best_b.cast("bigint")).withColumn(
        "ctype", ctype)
    return (typed.groupBy(term).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_containers"),
        F.sum(F.when(F.col("ctype") == "array", 1).otherwise(0))
        .cast("bigint").alias("n_array"),
        F.sum(F.when(F.col("ctype") == "run", 1).otherwise(0))
        .cast("bigint").alias("n_run"),
        F.sum(F.when(F.col("ctype") == "bitmap", 1).otherwise(0))
        .cast("bigint").alias("n_bitmap"),
        F.sum("bytes").cast("bigint").alias("total_bytes")))
