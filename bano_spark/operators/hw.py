"""Seasonal forecasting folds — additive Holt-Winters triple
exponential smoothing and the theta method (Assimakopoulos &
Nikolopoulos 2000, the M3 winner) — the seasonal/long-horizon
upgrades of temporal.holt_last / croston_last.

Execution discipline (the engine-wide sequence-fold contract, cf.
operators/temporal.py:364 and operators/hmm.py): ONE groupBy shuffle
on the series key, then one aggregate() fold per key over its sorted
value array with a struct accumulator — no window, no Python, state
O(period). Exactness: every fold step is a FIXED textual chain of
IEEE double ops replayed verbatim by the DuckDB list_reduce oracle,
so results are bit-identical across engines and topologies (rounded
to 6 only at the output boundary). Memory contract: the per-key
array is the series length; pre-bucket unbounded series first.

Definitions published by this operator (mirrored by oracle + tests):
- holt_winters_last: init l0 = mean(y[1..m]), b0 = (mean(y[m+1..2m])
  - l0)/m, seasonal queue s_i = y[m+i] - l0; updates from t = 2m+1:
      l' = a*(y - s_old) + (1-a)*(l + b)
      b' = B*(l' - l) + (1-B)*b
      s' = g*(y - l - b) + (1-g)*s_old
  one-step SSE accumulated over the update range; forecasts
  f_h = l + h*b + s_h for h = 1..period (the queue after the last
  update holds next season's values in order).
- theta_forecast: OLS line over t = 1..n (exact integer sums via a
  counter fold; St, St2 in closed form), SES (level alpha) over the
  theta-2 line z_t = 2*y_t - (a + b*t), forecast
  f_h = 0.5*(a + b*(n+h)) + 0.5*ses — the equal-weight combination
  of the theta-0 (trend) and theta-2 (SES) lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["holt_winters_last", "theta_forecast"]


def _sorted_vals(df: DataFrame, key_col: str, order_cols: list[str],
                 val_col: str) -> DataFrame:
    order_struct = F.struct(*[F.col(c) for c in order_cols],
                            F.col(val_col).alias("_v"))
    return (df.groupBy(key_col)
            .agg(F.array_sort(F.collect_list(order_struct)).alias("os"))
            .withColumn("vs", F.expr(
                "transform(os, o -> CAST(o._v AS DOUBLE))")))


def holt_winters_last(df: DataFrame, key_col: str, order_cols: list[str],
                      val_col: str, *, period: int = 4,
                      alpha: float = 0.5, beta: float = 0.25,
                      gamma: float = 0.25) -> DataFrame:
    """Final additive Holt-Winters state per key + in-sample RMSE +
    one-season-ahead forecasts. Keys with < 2*period+1 rows drop
    (the init window is the first two seasons; period >= 2).

    Returns (key, n_rows, level, trend, rmse, f1..f_period)."""
    if period < 2:
        raise ValueError("holt_winters_last: period must be >= 2")
    m = period
    ca, cb, cg = repr(float(alpha)), repr(float(beta)), repr(float(gamma))
    cna, cnb, cng = (repr(1.0 - float(alpha)), repr(1.0 - float(beta)),
                     repr(1.0 - float(gamma)))
    md = repr(float(m))
    l0 = "((" + " + ".join(f"vs[{i}]" for i in range(m)) + f") / {md})"
    mu2 = ("((" + " + ".join(f"vs[{i}]" for i in range(m, 2 * m))
           + f") / {md})")
    b0 = f"(({mu2} - {l0}) / {md})"
    q0 = ", ".join(f"vs[{m + i}] - {l0}" for i in range(m))
    lp = f"({ca} * (v - s.q[0]) + {cna} * (s.l + s.b))"
    snew = f"({cg} * (v - s2.l - s2.b) + {cng} * s2.q[0])"
    err = "(v - (s2.l + s2.b + s2.q[0]))"
    fold = (
        f"aggregate(slice(vs, {2 * m + 1}, size(vs) - {2 * m}), "
        f"named_struct('l', {l0}, 'b', {b0}, "
        f"'q', array({q0}), 'sse', CAST(0 AS DOUBLE)), "
        f"(s, v) -> aggregate(array({lp}), s, "
        f"(s2, lp) -> named_struct("
        f"'l', lp, "
        f"'b', {cb} * (lp - s2.l) + {cnb} * s2.b, "
        f"'q', concat(slice(s2.q, 2, {m - 1}), array({snew})), "
        f"'sse', s2.sse + {err} * {err})))")
    agged = (_sorted_vals(df, key_col, order_cols, val_col)
             .filter(F.size("vs") >= 2 * m + 1))
    st = F.expr(fold)
    n = F.size("vs").cast("bigint")
    return (agged.select(key_col, n.alias("n_rows"), st.alias("_st"))
            .select(key_col, "n_rows",
                    F.round(F.col("_st.l"), 6).alias("level"),
                    F.round(F.col("_st.b"), 6).alias("trend"),
                    F.round(F.sqrt(F.col("_st.sse")
                                   / (F.col("n_rows") - 2 * m)
                                   .cast("double")), 6).alias("rmse"),
                    *[F.round(F.col("_st.l")
                              + F.lit(float(h)) * F.col("_st.b")
                              + F.col("_st.q")[h - 1], 6).alias(f"f{h}")
                      for h in range(1, m + 1)]))


def theta_forecast(df: DataFrame, key_col: str, order_cols: list[str],
                   val_col: str, *, alpha: float = 0.5,
                   horizon: int = 4) -> DataFrame:
    """Theta-method forecast per key: exact OLS trend + SES over the
    theta-2 line, combined half-and-half. Keys with < 3 rows drop.

    Returns (key, n_rows, slope, intercept, ses_level, f1..f_h)."""
    ca, cna = repr(float(alpha)), repr(1.0 - float(alpha))
    sums = (
        "aggregate(vs, "
        "named_struct('t', CAST(0 AS DOUBLE), 'sy', CAST(0 AS DOUBLE), "
        "'sty', CAST(0 AS DOUBLE)), "
        "(s, v) -> named_struct('t', s.t + 1.0, 'sy', s.sy + v, "
        "'sty', s.sty + (s.t + 1.0) * v))")
    # `icept` / `slope` below are COLUMN references, the {c*} are
    # Python-interpolated literal smoothing constants
    ses = (
        "aggregate(slice(vs, 2, size(vs) - 1), "
        "named_struct('t', CAST(1 AS DOUBLE), "
        "'s', 2.0 * vs[0] - (icept + slope * 1.0)), "
        "(s, v) -> named_struct('t', s.t + 1.0, "
        f"'s', {ca} * (2.0 * v - (icept + slope * (s.t + 1.0))) "
        f"+ {cna} * s.s)).s")
    d = (_sorted_vals(df, key_col, order_cols, val_col)
         .filter(F.size("vs") >= 3)
         .withColumn("nd", F.size("vs").cast("double"))
         .withColumn("sm", F.expr(sums)))
    st = F.expr("nd * (nd + 1.0) / 2.0")
    st2 = F.expr("nd * (nd + 1.0) * (2.0 * nd + 1.0) / 6.0")
    d = (d.withColumn("slope", (F.col("nd") * F.col("sm.sty")
                                - st * F.col("sm.sy"))
                      / (F.col("nd") * st2 - st * st))
         .withColumn("icept", (F.col("sm.sy") - F.col("slope") * st)
                     / F.col("nd"))
         .withColumn("ses", F.expr(ses)))
    return d.select(
        key_col, F.col("nd").cast("bigint").alias("n_rows"),
        F.round("slope", 6).alias("slope"),
        F.round("icept", 6).alias("intercept"),
        F.round("ses", 6).alias("ses_level"),
        *[F.round(F.lit(0.5) * (F.col("icept")
                                + F.col("slope") * (F.col("nd")
                                                    + F.lit(float(h))))
                  + F.lit(0.5) * F.col("ses"), 6).alias(f"f{h}")
          for h in range(1, horizon + 1)])
