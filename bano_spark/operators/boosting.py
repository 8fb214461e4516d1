"""AdaBoost over decision stumps as pure aggregation — the boosting
sibling of operators/glm.py's IRLS and nbayes: T rounds, each ONE
map-side-combinable integer aggregate over the data, with the chosen
stump carried as a 1-row broadcast frame (no driver-side math beyond
the plan, exactly the glm beta-carry discipline).

The exactness trick: after r-1 rounds every row's boosting weight
w_i = exp(-y_i F(x_i)) takes one of only 2^(r-1) values — it depends
ONLY on the row's mistake pattern under the chosen stumps (factor
fct_k = sqrt((1-eps_k)/eps_k) per mistake, 1/fct_k per correct). So
each round aggregates EXACT INTEGER pattern x candidate counts and
applies the weights afterwards in a FIXED textual order on the
one-row aggregate — never summing raw per-row doubles, which is what
makes eps bit-identical across engines and topologies (the wave-126
Ljung-Box expansion argument, applied to boosting).

The ensemble decision avoids ln() entirely: sign(sum s_k * alpha_k)
= [prod g_k^(s_k) <= 1] with g_k = (1-eps_k)/eps_k — an IEEE product
chain, so the error count is an exact integer; alpha = 0.5*ln(g) is
computed only for the reported (rounded) coefficient.

Candidate space: axis-aligned stumps h(x) = pol * sign(th - x_f) over
a fixed (feature, threshold, polarity) grid; selection is argmin
weighted error with (eps, cid) tie-break via TakeOrderedAndProject
(16 rows — no SinglePartition exchange).

Scale shape: per round, one scan + one hash aggregate producing
O(2^r * |grid|) integer cells; every join is a broadcast of a 1-row
frame. T and the grid are model-sized constants.

cite: Freund & Schapire 1997; stump grid per gini_stump_split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["CAND", "adaboost_stumps", "adaboost_margin_errors"]

# cid -> (feature index 1/2, threshold, polarity)
CAND = [(fi, th, pol)
        for fi in (1, 2) for th in (5, 12, 22, 30) for pol in (1, -1)]


def _h(feat_sql: str, th_sql: str, pol_sql: str) -> str:
    return (f"IF((CASE WHEN {feat_sql} = 1 THEN x1 ELSE x2 END) "
            f"<= {th_sql}, {pol_sql}, -({pol_sql}))")


def _mist(feat_sql, th_sql, pol_sql) -> F.Column:
    return F.expr(f"IF({_h(feat_sql, th_sql, pol_sql)} <> y, 1, 0)")


def _pick_cols(r: int) -> list[str]:
    return [f"{c}{r}" for c in
            ("feat", "th", "pol", "eps", "g", "fct", "alpha")]


def adaboost_stumps(df: DataFrame, *, rounds: int = 3) -> list[DataFrame]:
    """Fit `rounds` stumps on columns (x1, x2, y in {-1,+1}); returns
    one 1-row DataFrame per round with columns feat{r}, th{r},
    pol{r}, eps{r}, g{r}, fct{r}, alpha{r}."""
    if not 1 <= rounds <= 4:
        raise ValueError("adaboost_stumps: rounds must be 1..4")
    picks: list[DataFrame] = []
    for r in range(1, rounds + 1):
        j = df
        for p in picks:
            j = j.crossJoin(F.broadcast(p))
        mprev = [F.expr(
            f"IF({_h(f'feat{i}', f'th{i}', f'pol{i}')} <> y, 1, 0)")
            for i in range(1, r)]
        npat = 1 << (r - 1)
        aggs = []
        for pid in range(npat):
            cond = F.lit(True)
            for i in range(r - 1):
                cond = cond & (mprev[i] == ((pid >> i) & 1))
            aggs.append(F.sum(F.when(cond, 1).otherwise(0))
                        .cast("bigint").alias(f"cnt_{pid}"))
            for cid, (fi, th, pol) in enumerate(CAND):
                mc = _mist(str(fi), str(th), str(pol)) == 1
                aggs.append(F.sum(F.when(cond & mc, 1).otherwise(0))
                            .cast("bigint").alias(f"mi_{cid}_{pid}"))
        one = j.agg(*aggs)
        for p in picks:
            one = one.crossJoin(F.broadcast(p))
        # weight of pattern pid: product over prior rounds, factor
        # fct_i when bit set (mistake), 1/fct_i otherwise — fixed
        # left-assoc order, mirrored textually by the oracle
        wexprs = []
        for pid in range(npat):
            terms = [(f"fct{i + 1}" if (pid >> i) & 1
                      else f"(1.0 / fct{i + 1})") for i in range(r - 1)]
            if not terms:
                wexprs.append("1.0")
            else:
                e = terms[0]
                for t in terms[1:]:
                    e = f"({e} * {t})"
                wexprs.append(e)
        structs = []
        for cid, (fi, th, pol) in enumerate(CAND):
            num = " + ".join(
                f"CAST(mi_{cid}_{pid} AS DOUBLE) * {wexprs[pid]}"
                for pid in range(npat))
            den = " + ".join(
                f"CAST(cnt_{pid} AS DOUBLE) * {wexprs[pid]}"
                for pid in range(npat))
            structs.append(
                f"named_struct('cid', {cid}, 'feat', {fi}, 'th', {th}, "
                f"'pol', {pol}, 'eps', ({num}) / ({den}))")
        pick = (one.select(F.explode(F.expr(
            "array(" + ", ".join(structs) + ")")).alias("c"))
            .select("c.*")
            .orderBy("eps", "cid").limit(1)
            .select(F.col("feat").alias(f"feat{r}"),
                    F.col("th").alias(f"th{r}"),
                    F.col("pol").alias(f"pol{r}"),
                    F.col("eps").alias(f"eps{r}"),
                    F.expr("(1.0 - eps) / eps").alias(f"g{r}"),
                    F.expr("sqrt((1.0 - eps) / eps)").alias(f"fct{r}"),
                    F.expr("0.5 * ln((1.0 - eps) / eps)")
                    .alias(f"alpha{r}")))
        picks.append(pick)
    return picks


def adaboost_margin_errors(df: DataFrame,
                           picks: list[DataFrame]) -> DataFrame:
    """Ensemble training error via the ln-free margin rule
    prod g_k^(s_k) <= 1, plus the first stump's solo error. Returns
    one row (n, stump1_errors, ensemble_errors, stump1_rate,
    ensemble_rate, boosted_improves)."""
    j = df
    for p in picks:
        j = j.crossJoin(F.broadcast(p))
    terms = []
    for i in range(1, len(picks) + 1):
        m = f"IF({_h(f'feat{i}', f'th{i}', f'pol{i}')} <> y, 1, 0)"
        terms.append(f"IF({m} = 1, (1.0 / g{i}), g{i})")
    prod = terms[0]
    for t in terms[1:]:
        prod = f"({prod} * {t})"
    m1 = f"IF({_h('feat1', 'th1', 'pol1')} <> y, 1, 0)"
    out = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr(m1)).cast("bigint").alias("stump1_errors"),
        F.sum(F.expr(f"IF({prod} <= 1.0, 1, 0)")).cast("bigint")
        .alias("ensemble_errors"))
    return out.select(
        "n", "stump1_errors", "ensemble_errors",
        F.round(F.col("stump1_errors").cast("double")
                / F.col("n").cast("double"), 6).alias("stump1_rate"),
        F.round(F.col("ensemble_errors").cast("double")
                / F.col("n").cast("double"), 6).alias("ensemble_rate"),
        (F.col("ensemble_errors") <= F.col("stump1_errors"))
        .alias("boosted_improves"))
