"""Post-hoc multiple comparisons — Tukey-Kramer HSD and
Bonferroni-corrected pairwise Welch z — the "which groups differ"
follow-up that anova_f_oneway leaves open (and the multiplicity
discipline bh_fdr_selection applies to p-values, applied here to
pairwise mean contrasts).

One conditional aggregate pivots the k known groups' (n, sum,
sum-of-squares) into a single row (exact bigints); every pairwise
statistic is then a fixed double chain on that row, exploded into
k(k-1)/2 pair rows — no joins, no second scan, bit-identical across
engines. Critical values are literals for the asymptotic (df -> inf)
case, disclosed in the output columns: Tukey's studentized-range
q(0.05, k=5)/sqrt(2) comparison uses 3.858 / sqrt(2) on the
standard-error scale; Bonferroni uses the normal 0.005-two-sided
2.807 (m = 10 contrasts).

MSE is the pooled within-group variance sum((ss_g - s_g^2/n_g)) /
(N - k) — numerators exact integers over doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pairwise_moments", "tukey_hsd", "bonferroni_pairs"]

Q_TUKEY_5_INF = 3.858
Z_BONF_10 = 2.8070337683438042


def pairwise_moments(df: DataFrame, grp: str, y: str,
                     groups: list[str]) -> DataFrame:
    gc, yc = F.col(grp), F.col(y)
    aggs = []
    for i, g in enumerate(groups):
        aggs += [
            F.sum(F.when(gc == g, 1).otherwise(0)).cast("bigint")
            .alias(f"n{i}"),
            F.sum(F.when(gc == g, yc).otherwise(0)).cast("bigint")
            .alias(f"s{i}"),
            F.sum(F.when(gc == g, yc * yc).otherwise(0)).cast("bigint")
            .alias(f"ss{i}")]
    return df.agg(*aggs)


def _mse(kg: int) -> str:
    num = " + ".join(
        f"(CAST(ss{i} AS DOUBLE) - CAST(s{i} AS DOUBLE) "
        f"* CAST(s{i} AS DOUBLE) / CAST(n{i} AS DOUBLE))"
        for i in range(kg))
    nt = " + ".join(f"n{i}" for i in range(kg))
    return f"(({num}) / CAST(({nt}) - {kg} AS DOUBLE))"


def _pairs_sql(groups: list[str], crit: float, se_half: bool) -> str:
    kg = len(groups)
    structs = []
    for i in range(kg):
        for j in range(i + 1, kg):
            diff = (f"(CAST(s{i} AS DOUBLE) / CAST(n{i} AS DOUBLE) "
                    f"- CAST(s{j} AS DOUBLE) / CAST(n{j} AS DOUBLE))")
            half = "0.5 * " if se_half else ""
            se = (f"sqrt({half}{_mse(kg)} "
                  f"* (1.0 / CAST(n{i} AS DOUBLE) "
                  f"+ 1.0 / CAST(n{j} AS DOUBLE)))")
            structs.append(
                f"named_struct('g1', '{groups[i]}', "
                f"'g2', '{groups[j]}', "
                f"'diff', {diff}, 'se', {se}, "
                f"'stat', abs({diff}) / {se}, "
                f"'sig', abs({diff}) / {se} > {crit!r})")
    return "array(" + ", ".join(structs) + ")"


def tukey_hsd(df: DataFrame, grp: str, y: str,
              groups: list[str]) -> DataFrame:
    """Tukey-Kramer: q = |mean diff| / sqrt(MSE/2 (1/n1 + 1/n2)) vs
    the k=5, df=inf studentized-range 5% point. Returns one row per
    pair (g1, g2, mean_diff, se, q_stat, significant)."""
    one = pairwise_moments(df, grp, y, groups)
    arr = _pairs_sql(groups, Q_TUKEY_5_INF, se_half=True)
    return (one.select(F.explode(F.expr(arr)).alias("p"))
            .select(F.col("p.g1").alias("g1"),
                    F.col("p.g2").alias("g2"),
                    F.round("p.diff", 6).alias("mean_diff"),
                    F.round("p.se", 6).alias("se"),
                    F.round("p.stat", 6).alias("q_stat"),
                    F.col("p.sig").alias("significant"))
            .orderBy("g1", "g2"))


def bonferroni_pairs(df: DataFrame, grp: str, y: str,
                     groups: list[str]) -> DataFrame:
    """Pooled-variance pairwise z with Bonferroni m = k(k-1)/2
    correction (asymptotic). Returns (g1, g2, mean_diff, se, z_stat,
    significant)."""
    one = pairwise_moments(df, grp, y, groups)
    arr = _pairs_sql(groups, Z_BONF_10, se_half=False)
    return (one.select(F.explode(F.expr(arr)).alias("p"))
            .select(F.col("p.g1").alias("g1"),
                    F.col("p.g2").alias("g2"),
                    F.round("p.diff", 6).alias("mean_diff"),
                    F.round("p.se", 6).alias("se"),
                    F.round("p.stat", 6).alias("z_stat"),
                    F.col("p.sig").alias("significant"))
            .orderBy("g1", "g2"))
