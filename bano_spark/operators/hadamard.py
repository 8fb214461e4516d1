"""Walsh-Hadamard rotation audit over embedding vectors — the
preconditioning rotation quantization pipelines apply before int
quantization (a Hadamard rotation spreads outlier coordinates across
the whole vector, shrinking max|x| toward the incoherence bound
sqrt(sum x^2 / n); cf. the randomized-Hadamard step in fast JL
transforms and recent LLM weight/activation-quantization systems).
Complements operators/sq8.py: SQ8 measures the damage per-dim affine
codes do; this measures how much a rotation would reduce it.

Mechanics: X = H_n x with H_n the +-1 Hadamard matrix (Sylvester
order), embedded as ONE literal matrix in both engines — every entry
is exactly +-1.0, so each coefficient is a fixed index-order
sum/difference chain of the inputs, bit-identical across engines.
Parseval for the unnormalized transform, sum_k X_k^2 = n * sum_i
x_i^2, is emitted as an in-row self-check (1e-9 relative), the same
discipline as operators/spectral.py. The flatness audit compares
max|x| against max|X|/n (the rotated vector rescaled back to the
input's norm): ratio > 1 means the rotation flattened the vector's
worst coordinate — exactly why quantizers precondition.

Scale shape: bounded-subset select (qmod), then pure column
expressions over n-element arrays — no shuffle beyond the scan, no
Python. The independent replay (tools/check_kernels.py) computes the
transform via the RECURSIVE BUTTERFLY (O(n log n) in-place passes),
a different algorithm from the literal matrix product entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["hadamard_matrix", "fwht_rotation_audit"]


def hadamard_matrix(n: int) -> list[list[int]]:
    """Sylvester-construction H_n (n a power of two), entries +-1."""
    if n & (n - 1):
        raise ValueError("hadamard_matrix: n must be a power of two")
    H = [[1]]
    while len(H) < n:
        H = [row + row for row in H] + [row + [-v for v in row]
                                        for row in H]
    return H


def _h_sql(n: int) -> str:
    rows = ", ".join(
        "array(" + ", ".join(f"{v}.0" for v in row) + ")"
        for row in hadamard_matrix(n))
    return f"array({rows})"


def fwht_rotation_audit(emb: DataFrame, *, dim: int = 64,
                        qmod: int = 25,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Per selected vector (id % qmod == 0): energy, Parseval
    self-check of X = H x, and the outlier-flattening ratio
    max|x| / (max|X| / n). Returns (vec_id, n, energy, linf_input,
    linf_rotated, flatten_ratio, parseval_ok)."""
    d = (emb.filter(F.col(id_col) % qmod == 0)
         .select(F.col(id_col),
                 F.expr(f"transform({vec_col}, "
                        "v -> CAST(v AS DOUBLE))").alias("xs"))
         .filter(F.size("xs") == dim))
    H = _h_sql(dim)
    d = d.withColumn("hx", F.expr(
        f"transform({H}, hrow -> "
        f"aggregate(sequence(1, {dim}), CAST(0 AS DOUBLE), "
        f"(s, i) -> s + element_at(xs, i) * element_at(hrow, i)))"))
    d = d.withColumn("et", F.expr(
        f"aggregate(sequence(1, {dim}), CAST(0 AS DOUBLE), "
        f"(s, i) -> s + element_at(xs, i) * element_at(xs, i))"))
    d = d.withColumn("ef", F.expr(
        f"aggregate(sequence(1, {dim}), CAST(0 AS DOUBLE), "
        f"(s, i) -> s + element_at(hx, i) * element_at(hx, i))"))
    d = d.withColumn("li", F.expr(
        "array_max(transform(xs, v -> abs(v)))"))
    d = d.withColumn("lr", F.expr(
        f"array_max(transform(hx, v -> abs(v))) / {float(dim)!r}"))
    return (d.select(
        id_col, F.lit(dim).cast("bigint").alias("n"),
        F.round("et", 6).alias("energy"),
        F.round("li", 6).alias("linf_input"),
        F.round("lr", 6).alias("linf_rotated"),
        F.round(F.col("li") / F.col("lr"), 6).alias("flatten_ratio"),
        (F.abs(F.col("ef") - F.lit(float(dim)) * F.col("et"))
         <= 1e-9 * F.lit(float(dim)) * F.col("et")).alias("parseval_ok"))
        .orderBy(id_col))
