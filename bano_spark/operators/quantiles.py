"""Exact distributed quantiles by iterative range-narrowing — the
selection-algorithm answer to "approx_percentile isn't exact and a
global sort doesn't scale".

Spark's built-ins force a choice: `approx_percentile` (bounded error,
not exact) or `orderBy` + offset (a global sort, and rank-style plans
are how the r1 single-partition funnel happened). This operator
computes EXACT rank statistics with O(log) full scans and O(bins)
driver state per pass, never sorting data and never collecting data
rows:

  pass k: bin each pending target's candidate set into `bins`
  equal-width bins, histogram ALL targets in ONE shared scan (each row
  emits one (target, bin) entry per pending target; the shuffle
  carries at most targets x bins counted rows after map-side combine),
  walk the O(bins) histogram on the driver to find the bin holding
  each target rank, recurse into that bin. Typical data resolves
  every quantile in 2-3 passes (1e4 bins -> 1e12 effective resolution
  in 3 passes).

Exactness under floating point: the candidate set is narrowed by a
chain of BIN-MEMBERSHIP predicates — the *same* clamp-floor expression
used to count the histogram — never by a value-range filter. A
borderline value whose (v - lo) / width rounds across a bin edge is
therefore counted in exactly one bin and filtered by exactly that
membership, so the rank bookkeeping can never drift by an ulp.
All-duplicate columns terminate: their range collapses to a single
double at the first stats pass.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F


def _bin_expr(lo: float, width: float, bins: int) -> Column:
    """Clamped equal-width bin id — total over all doubles (clamping
    means even values an ulp outside the analytic [lo, hi] estimate
    land in bin 0 or bins-1 and stay counted)."""
    return F.least(
        F.greatest(F.floor((F.col("v") - F.lit(lo)) / F.lit(width)),
                   F.lit(0)),
        F.lit(bins - 1)).cast("int")


def exact_quantiles(df: DataFrame, col: str, qs: list[float], *,
                    bins: int = 10_000, max_passes: int = 8) -> list[float]:
    """Exact q-quantiles of ``df[col]`` (nulls excluded) under the
    zero-indexed lower-rank convention: quantile q = the value at
    sorted position floor(q * (n - 1)). Returns values aligned with
    ``qs``.

    Driver state is O(bins * len(qs)) per pass; executor work per pass
    is one shared scan + hash aggregation (map-side combined), no
    sort, no shuffle wider than targets x bins rows."""
    d = df.select(F.col(col).cast("double").alias("v")) \
        .filter(F.col("v").isNotNull()).persist()
    try:
        stats = d.agg(F.count("v").alias("n"), F.min("v").alias("lo"),
                      F.max("v").alias("hi")).collect()[0]
        n = stats["n"]
        if n == 0:
            return [float("nan")] * len(qs)
        glo, ghi = float(stats["lo"]), float(stats["hi"])
        # pending[slot] = [rank within pred, pred, lo, hi]; lo/hi are
        # ANALYTIC width estimates only — membership is always pred
        pending: dict[int, list] = {
            i: [int(math.floor(q * (n - 1))), F.lit(True), glo, ghi]
            for i, q in enumerate(qs)}
        out: dict[int, float] = {}

        def _resolve_tiny(i: int, rank: int, pred: Column) -> None:
            """Exact kth-under-pred via distinct-value counts: used
            once the candidate set has <= a handful of distinct
            values (collapsed range) — O(distinct) driver rows."""
            rows = sorted(
                (r["v"], r["c"]) for r in
                d.filter(pred).groupBy("v")
                .agg(F.count(F.lit(1)).alias("c")).collect())
            acc = 0
            for v, c in rows:
                if acc + c > rank:
                    out[i] = float(v)
                    return
                acc += c
            out[i] = float(rows[-1][0])  # defensive: rank off the end

        if glo == ghi:
            d.unpersist()
            return [glo] * len(qs)
        for _ in range(max_passes):
            if not pending:
                break
            metas = []  # (slot, lo, width)
            entries = []
            for i, (rank, pred, lo, hi) in pending.items():
                width = (hi - lo) / bins
                if width <= 0 or math.nextafter(lo, hi) >= hi:
                    _resolve_tiny(i, rank, pred)
                    continue
                metas.append((i, lo, width))
                entries.append(F.struct(
                    F.lit(i).alias("t"),
                    F.when(pred, _bin_expr(lo, width, bins))
                    .otherwise(F.lit(-1)).alias("b")))
            for i in out:
                pending.pop(i, None)
            if not metas:
                continue
            hist = (d.select(F.explode(F.array(*entries)).alias("e"))
                    .filter(F.col("e.b") >= 0)
                    .groupBy(F.col("e.t").alias("t"), F.col("e.b").alias("b"))
                    .agg(F.count(F.lit(1)).alias("c")).collect())
            by_t: dict[int, dict[int, int]] = {}
            for r in hist:
                by_t.setdefault(r["t"], {})[r["b"]] = r["c"]
            for i, lo, width in metas:
                rank, pred, _, hi = pending[i]
                counts = by_t.get(i, {})
                acc = 0
                chosen = None
                for b in sorted(counts):
                    c = counts[b]
                    if acc + c > rank:
                        chosen = (b, acc, c)
                        break
                    acc += c
                if chosen is None:  # cannot happen: histogram is total
                    _resolve_tiny(i, rank, pred)
                    del pending[i]
                    continue
                b, acc, c = chosen
                npred = pred & (_bin_expr(lo, width, bins) == F.lit(b))
                if c == 1:
                    # a single candidate row IS the answer
                    val = d.filter(npred).agg(F.min("v")).collect()[0][0]
                    out[i] = float(val)
                    del pending[i]
                else:
                    pending[i] = [rank - acc, npred,
                                  lo + b * width, lo + (b + 1) * width]
        for i, (rank, pred, _, _) in list(pending.items()):
            _resolve_tiny(i, rank, pred)
            del pending[i]
        return [out[i] for i in range(len(qs))]
    finally:
        d.unpersist()


def exact_quantiles_df(df: DataFrame, col: str, qs: list[float], *,
                       bins: int = 10_000) -> DataFrame:
    """DataFrame wrapper for the oracle harness: one row per quantile
    (q, value). The selection runs eagerly (a driver-coordinated
    algorithm, like the k-means and prefix-sum operators); the result
    is O(len(qs)) rows."""
    vals = exact_quantiles(df, col, qs, bins=bins)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(float(q), float(v)) for q, v in zip(qs, vals)], ["q", "value"])


def benford_digit_test(df, col: str, *, round_to: int = 6):
    """First-digit Benford's-law conformity test: observed leading-
    digit counts of |value| >= 1 against the Benford expectation
    p_d = log10(1 + 1/d), with each digit's chi-square contribution
    (obs - n p_d)^2 / (n p_d) — the classic large-ledger anomaly
    screen (Nigrini 1996) run as a data-quality gate before amounts
    feed any model.

    Scale shape: leading digit is pure string codegen (no log10 per
    row), ONE groupBy(digit) + the O(9) expectation literals computed
    driver-side (both engines see identical doubles). Returns one row
    per digit 1..9: (digit, n_obs, expected, chi2_term)."""
    import math

    from pyspark.sql import functions as F

    spark = df.sparkSession
    probs = [(d, math.log10(1 + 1 / d)) for d in range(1, 10)]
    exp_df = F.broadcast(spark.createDataFrame(
        probs, "digit int, p double"))
    lead = F.substring(
        F.floor(F.abs(F.col(col))).cast("bigint").cast("string"),
        1, 1).cast("int")
    obs = (df.filter(F.abs(F.col(col)) >= 1)
           .select(lead.alias("digit"))
           .groupBy("digit")
           .agg(F.count(F.lit(1)).cast("double").alias("_o")))
    tot = obs.agg(F.sum("_o").alias("_n"))
    return (exp_df.join(obs, "digit", "left")
            .crossJoin(F.broadcast(tot))
            .select("digit",
                    F.coalesce("_o", F.lit(0.0)).cast("bigint")
                    .alias("n_obs"),
                    F.round(F.col("_n") * F.col("p"), round_to)
                    .alias("expected"),
                    F.round(
                        (F.coalesce("_o", F.lit(0.0))
                         - F.col("_n") * F.col("p"))
                        * (F.coalesce("_o", F.lit(0.0))
                           - F.col("_n") * F.col("p"))
                        / (F.col("_n") * F.col("p")),
                        round_to).alias("chi2_term")))
