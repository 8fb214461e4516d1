"""Temporal joins Spark lacks as built-ins: as-of (most recent match
at-or-before) and interval overlap, both expressed as shuffle-bounded
compositions of DataFrame ops — never an inequality nested-loop join.

The reference pipeline is batch-snapshot (its "latest state" logic is
the import-then-diff loop, bano/cron_osm.sh); these generalize that
temporal semantics to event streams, and they are the standard
training-data operators for attaching slowly-changing metadata (crawl
snapshots, robots.txt versions, per-host quality scores) to page
events at scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_sec: float | None = None,
) -> DataFrame:
    """LEFT as-of join: each left row picks up ``value_cols`` from the
    most recent right row with the same ``key`` and right.ts <= left.ts
    (DuckDB/Pandas ``ASOF JOIN`` semantics, ties matching). Left rows
    with no prior right row keep nulls; ``tolerance_sec`` additionally
    nulls matches older than the window.

    Plan: tag both sides, UNION on (key, ts, side), and run ONE
    per-key window with ``last(value, ignorenulls=True)`` ordered by
    (ts, side) — right rows sort before left rows at equal ts, so an
    exact-tie right row is visible to the left row. This is a single
    shuffle on the key (the union is shuffle-free), no inequality join
    anywhere, and the window never needs a global order — it scales
    exactly like any per-key aggregation, with the usual salting story
    for hot keys.

    The matched right timestamp is carried as ``matched_ts`` (needed
    for the tolerance filter; also the provenance a pipeline wants)."""
    value_cols = value_cols or [
        c for c in right.columns if c not in (key, ts)]
    lt = left.withColumn("_side", F.lit(1))
    for c in value_cols:
        lt = lt.withColumn(f"_v_{c}", F.lit(None).cast(
            right.schema[c].dataType))
    lt = lt.withColumn("_rts", F.lit(None).cast(right.schema[ts].dataType))
    rt = right.select(
        F.col(key), F.col(ts), F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
        F.col(ts).alias("_rts"))
    for c in left.columns:
        if c not in (key, ts):
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    both = lt.unionByName(rt)
    w = (Window.partitionBy(key).orderBy(ts, "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = both.select(
        *left.columns, "_side",
        F.last("_rts", ignorenulls=True).over(w).alias("matched_ts"),
        *[F.last(f"_v_{c}", ignorenulls=True).over(w).alias(c)
          for c in value_cols])
    out = filled.filter(F.col("_side") == 1).drop("_side")
    if tolerance_sec is not None:
        stale = (F.unix_timestamp(F.col(ts))
                 - F.unix_timestamp(F.col("matched_ts"))
                 > F.lit(float(tolerance_sec)))
        out = out.select(
            *left.columns,
            F.when(stale, F.lit(None)).otherwise(F.col("matched_ts"))
            .alias("matched_ts"),
            *[F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c)
              for c in value_cols])
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    ts: str = "ts",
    begin: str = "begin",
    end: str = "end",
    bin_sec: int = 3600,
    broadcast_intervals: bool | None = None,
    broadcast_max_rows: int = 1_000_000,
) -> DataFrame:
    """INNER overlap join: every (point, interval) pair with
    begin <= point.ts < end (half-open, the SQL/window convention).

    Plan: each interval is exploded to the epoch-time bins it covers
    (``sequence`` of bin ids — pure codegen), points map to ONE bin,
    and the pair space becomes a bin equi-join with an exact refine —
    the same complete-candidate-then-refine shape as the spatial cell
    joins, with the same guarantees: never a cross product, cost
    O(intervals x bins-covered + points) through a hash join.
    Long intervals cost bins proportional to their length; pick
    ``bin_sec`` near the median interval length (a 100x-too-small bin
    multiplies the exploded side 100x; a 100x-too-big bin multiplies
    candidate pairs — both degrade linearly and loudly, never
    quadratically). Auto-broadcasts the exploded interval side below
    ``broadcast_max_rows``."""
    pb = points.withColumn(
        "_bin", F.floor(F.unix_timestamp(F.col(ts)) / F.lit(bin_sec))
        .cast("bigint"))
    ib = intervals.withColumn(
        "_bin", F.explode(F.sequence(
            F.floor(F.unix_timestamp(F.col(begin)) / F.lit(bin_sec))
            .cast("bigint"),
            # end is exclusive: a zero-length tail on a bin border
            # must not explode an extra empty bin
            F.floor((F.unix_timestamp(F.col(end)) - F.lit(1))
                    / F.lit(bin_sec)).cast("bigint"))))
    if broadcast_intervals is None:
        cap = broadcast_max_rows
        broadcast_intervals = (
            ib.select("_bin").limit(cap + 1).count() <= cap)
    if broadcast_intervals:
        ib = F.broadcast(ib)
    return (pb.join(ib, "_bin")
            .filter((F.col(begin) <= F.col(ts)) & (F.col(ts) < F.col(end)))
            .drop("_bin"))


def time_range_rolling(df, part_col: str, ts_col: str, value_col: str,
                       seconds: int = 3600):
    """Time-range rolling aggregates: count and mean of ``value_col``
    over [ts - seconds, ts] per partition key — the RANGE-frame window
    (``RANGE BETWEEN INTERVAL x PRECEDING AND CURRENT ROW``) Spark
    only exposes through rangeBetween on a numeric ordering. Epoch
    seconds keep the frame arithmetic exact and identical to SQL
    engines' interval frames (both bounds inclusive).

    Scale shape: the window partitions by ``part_col`` — at 10^12
    events the shuffle is one exchange on the partition key, every
    frame evaluation is a per-partition sliding pass; no
    single-partition exchange, no self-join blowup (the naive
    range-self-join materializes O(rows x window-density) pairs)."""
    from pyspark.sql import Window, functions as F

    # TIMESTAMP_NTZ has no direct long cast, and the NTZ->TZ hop's
    # session offset is NOT constant across a DST transition (ADVICE
    # r3) — so derive epoch from the wall-clock FIELDS instead: pure
    # timezone-free arithmetic, identical to a SQL engine's RANGE
    # INTERVAL frame over the naive timestamp under any session tz.
    t = F.col(ts_col).cast("timestamp_ntz")
    epoch = (F.datediff(F.to_date(t), F.lit("1970-01-01")).cast("long")
             * 86400 + F.hour(t) * 3600 + F.minute(t) * 60 + F.second(t))
    w = (Window.partitionBy(part_col)
         .orderBy(epoch)
         .rangeBetween(-seconds, 0))
    return (df
            .withColumn("n_in_window",
                        F.count(F.lit(1)).over(w).cast("bigint"))
            .withColumn("avg_in_window",
                        F.round(F.avg(F.col(value_col)).over(w), 6)))


def ewma_last(df: DataFrame, key_col: str, order_cols: list[str],
              val_col: str, alpha: float = 0.5) -> DataFrame:
    """Final exponentially-weighted moving average per key:
    s_1 = v_1, s_i = alpha*v_i + (1-alpha)*s_{i-1} over rows ordered by
    ``order_cols`` (which must be a total order within each key — pass
    a tiebreaker column). Returns (key, n_rows, ewma).

    The recursion is inherently sequential per key, so the engine runs
    it as ONE aggregate() fold over each key's value array — the
    line_interpolate_point discipline: a single groupBy shuffle, then
    pure map work where the row lives; no window, no pow() (whose
    last-ulp behavior differs across libm implementations — repeated
    multiplication by the literal alpha reproduces bit-for-bit in any
    engine with IEEE doubles, and a SQL oracle replays it with the
    same fold, e.g. DuckDB list_reduce).

    Memory note: the per-key array is the series length; for unbounded
    series at 10^12 scale, pre-aggregate to coarser ticks first (the
    rollup keeps EWMA semantics under any time-bucketing) — the same
    contract as collect_list-based session features.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("ewma_last: alpha outside (0, 1]")
    order_struct = F.struct(*[F.col(c) for c in order_cols],
                            F.col(val_col).alias("_v"))
    agged = (df.groupBy(key_col)
             .agg(F.array_sort(F.collect_list(order_struct)).alias("os")))
    a = repr(float(alpha))
    fold = (f"aggregate(slice(vs, 2, size(vs) - 1), vs[0], "
            f"(s, v) -> CAST({a} AS DOUBLE) * v "
            f"+ CAST(1.0 - {a} AS DOUBLE) * s)")
    return (agged
            .withColumn("vs", F.expr("transform(os, o -> CAST(o._v AS DOUBLE))"))
            .select(key_col, F.size("vs").cast("bigint").alias("n_rows"),
                    F.expr(fold).alias("ewma")))


def gap_fill(df: DataFrame, key_col: str, ts_col: str, value_col: str,
             grid: DataFrame) -> DataFrame:
    """Resample an irregular per-key series onto a supplied time grid
    with forward fill (last observation carried forward): the filled
    value at grid instant g is the latest observation with ts <= g.

    ``grid`` must have (key_col, grid ``ts_col`` rows). Implemented as
    the classic union trick — observations and grid markers interleave
    in one partitioned ordered window and `last(value, ignorenulls)`
    carries the observation forward — so the whole operator is a
    single per-key sort, no as-of join, no per-key loop. At equal
    timestamps the observation sorts before the marker (is_grid
    tiebreak), so an observation exactly on a grid instant is
    included. Keys with no prior observation fill NULL.
    """
    obs = df.select(F.col(key_col), F.col(ts_col),
                    F.col(value_col).alias("_v"), F.lit(0).alias("_g"))
    mark = grid.select(F.col(key_col), F.col(ts_col),
                       F.lit(None).cast(obs.schema["_v"].dataType).alias("_v"),
                       F.lit(1).alias("_g"))
    w = (Window.partitionBy(key_col).orderBy(ts_col, "_g")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (obs.unionByName(mark)
            .withColumn("filled", F.last("_v", ignorenulls=True).over(w))
            .filter(F.col("_g") == 1)
            .select(key_col, ts_col, "filled"))


def time_weighted_average(df: DataFrame, key_col: str, ts_col: str,
                          value_col: str,
                          order_cols: list[str] | None = None) -> DataFrame:
    """Per-key time-weighted average: each observation's value is held
    until the next observation, TWA = sum(v_i * dt_i) / sum(dt_i) over
    the intervals between consecutive observations (the last
    observation carries no weight — the standard left-Riemann TWA of
    a step series). One lead window + one groupBy; dt in seconds as
    an exact microsecond-integer ratio.
    """
    order_cols = order_cols or [ts_col]
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    # TIMESTAMP_NTZ columns cast through the session zone; the engine
    # pins spark.sql.session.timeZone=UTC (session.py), so the cast is
    # offset-free and dt differences are exact microsecond integers
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    stepped = df.select(
        F.col(key_col), F.col(value_col).alias("_v"),
        ((F.lead(us).over(w) - us) / F.lit(1e6)).alias("_dt"))
    return (stepped.filter(F.col("_dt").isNotNull())
            .groupBy(key_col)
            .agg((F.sum(F.col("_v") * F.col("_dt")) / F.sum("_dt"))
                 .alias("twa"),
                 F.sum("_dt").alias("span_sec")))


def cusum(df: DataFrame, key_col: str, value_col: str,
          order_cols: list[str], target: float, slack: float,
          threshold: float) -> DataFrame:
    """One-sided upper CUSUM per key: S_i = max(0, S_{i-1} + x_i -
    target - slack), alarm when S_i > threshold (Page 1954).

    The recursion is rewritten with the reflection identity
    S_i = cs_i - min(0, min_{j<=i} cs_j) where cs is the running sum
    of y_i = x_i - target - slack — two ordered window passes, no
    recursion, no per-key loop, exact for integer-valued series.
    Returns per key: max_cusum, first alarm position (row number, 1
    when the first point already alarms; NULL if never), n_alarms.
    """
    k = F.lit(target + slack)
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cs = F.sum(F.col(value_col) - k).over(run)
    s = (df.withColumn("_cs", cs)
         .withColumn("_s", F.col("_cs")
                     - F.least(F.lit(0.0), F.min("_cs").over(run)))
         .withColumn("_seq", F.row_number().over(w)))
    return (s.groupBy(key_col)
            .agg(F.max("_s").alias("max_cusum"),
                 F.min(F.when(F.col("_s") > threshold, F.col("_seq")))
                 .alias("first_alarm_seq"),
                 F.sum(F.when(F.col("_s") > threshold, 1).otherwise(0))
                 .alias("n_alarms")))


def theil_sen(df: DataFrame, key_col: str, x_col: str, y_col: str,
              out_col: str = "theil_sen_slope") -> DataFrame:
    """Per-key Theil-Sen estimator: the median of all pairwise slopes
    (y_j - y_i) / (x_j - x_i) over x_i < x_j — the robust slope with a
    29.3% breakdown point (Sen 1968), immune to the level shifts and
    outliers that drag OLS (the CUSUM fixture's +300 step is exactly
    such a contaminant). Median = exact interpolated percentile(0.5),
    matching DuckDB's quantile_cont.

    Scale shape: the pair generation is a per-key equi-join —
    O(n_k^2) rows per key, never across keys. That quadratic is the
    estimator's definition; the contract is bounded per-key series
    (sessions, days, devices). For unbounded keys the standard remedy
    is upstream per-key sampling or the repeated-median variant —
    callers pick the bound, this operator never hides it.
    """
    a = df.select(F.col(key_col), F.col(x_col).cast("double").alias("_x1"),
                  F.col(y_col).cast("double").alias("_y1"))
    b = df.select(F.col(key_col), F.col(x_col).cast("double").alias("_x2"),
                  F.col(y_col).cast("double").alias("_y2"))
    pairs = (a.join(b, key_col)
             .filter(F.col("_x1") < F.col("_x2"))
             .withColumn("_s", (F.col("_y2") - F.col("_y1"))
                         / (F.col("_x2") - F.col("_x1"))))
    return (pairs.groupBy(key_col)
            .agg(F.expr("percentile(_s, 0.5)").alias(out_col),
                 F.count(F.lit(1)).alias("n_pairs")))


def ols_slope(df: DataFrame, key_col: str, x_col: str, y_col: str,
              out_col: str = "ols_slope") -> DataFrame:
    """Per-key ordinary-least-squares slope from one pass of additive
    sufficient statistics (n, sum x, sum y, sum xy, sum x^2) — the
    non-robust twin theil_sen is compared against."""
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    agg = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum(x).alias("_sx"), F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"), F.sum(x * x).alias("_sxx"))
    return agg.select(
        F.col(key_col),
        ((F.col("_sxy") - F.col("_sx") * F.col("_sy") / F.col("_n"))
         / (F.col("_sxx") - F.col("_sx") * F.col("_sx") / F.col("_n")))
        .alias(out_col),
        F.col("_n").cast("bigint").alias("n_obs"))


def interarrival_burstiness(df: DataFrame, key_col: str, ts_col: str,
                            order_cols: list | None = None) -> DataFrame:
    """Per-key burstiness of the inter-arrival process (Goh &
    Barabasi 2008): B = (sigma - mu) / (sigma + mu) over the gaps
    between consecutive events — -1 perfectly regular, 0 Poisson,
    -> 1 extremely bursty. The session/crawl politeness planner's
    heavy-tail detector.

    One partitioned lag + one groupBy; variance from explicit
    sufficient statistics (sum, sum of squares) so the float
    expression is identical in any SQL engine (library var_pop
    implementations differ numerically). Keys with < 2 events drop
    (no gap exists)."""
    order_cols = order_cols or [F.col(ts_col)]
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gaps = (df.withColumn("_dt", (us - F.lag(us).over(w)) / F.lit(1e6))
            .filter(F.col("_dt").isNotNull()))
    agg = gaps.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("_dt").alias("_s"),
        F.sum(F.col("_dt") * F.col("_dt")).alias("_s2"))
    n = F.col("n_gaps").cast("double")
    mu = F.col("_s") / n
    sigma = F.sqrt(F.col("_s2") / n - mu * mu)
    return agg.select(
        key_col, "n_gaps", mu.alias("mean_gap_sec"),
        sigma.alias("std_gap_sec"),
        F.when(sigma + mu > 0, (sigma - mu) / (sigma + mu))
        .otherwise(F.lit(0.0)).alias("burstiness"))


def holt_last(df: DataFrame, key_col: str, order_cols: list[str],
              val_col: str, alpha: float = 0.5,
              beta: float = 0.25) -> DataFrame:
    """Final Holt double-exponential state per key (level + trend +
    one-step-ahead forecast), the linear-trend upgrade of
    :func:`ewma_last`:

        l_t = a*y_t + (1-a)*(l_{t-1} + b_{t-1})
        b_t = B*(l_t - l_{t-1}) + (1-B)*b_{t-1}

    initialized l_2 = y_2, b_2 = y_2 - y_1 (the standard Holt start;
    a perfectly linear series is then tracked EXACTLY — level = y_t,
    trend = slope — for any alpha/beta). Keys with < 2 rows drop.
    Same execution discipline as ewma_last: ONE groupBy shuffle, then
    one aggregate() fold per key over its sorted value array with a
    STRUCT accumulator — no window, no pow(); literals are CAST once
    so both engines fold identical doubles (a SQL twin replays it
    with DuckDB list_reduce over a prepended init struct). Memory
    contract as ewma_last: per-key array is the series length;
    pre-bucket unbounded series first."""
    if not 0.0 < alpha <= 1.0 or not 0.0 <= beta <= 1.0:
        raise ValueError("holt_last: smoothing constants out of range")
    order_struct = F.struct(*[F.col(c) for c in order_cols],
                            F.col(val_col).alias("_v"))
    agged = (df.groupBy(key_col)
             .agg(F.array_sort(F.collect_list(order_struct)).alias("os"))
             .withColumn("vs", F.expr(
                 "transform(os, o -> CAST(o._v AS DOUBLE))"))
             .filter(F.size("vs") >= 2))
    a = repr(float(alpha))
    b = repr(float(beta))
    lnew = (f"(CAST({a} AS DOUBLE) * v "
            f"+ CAST(1.0 - {a} AS DOUBLE) * (s.l + s.b))")
    fold = (f"aggregate(slice(vs, 3, size(vs) - 2), "
            f"named_struct('l', CAST(vs[1] AS DOUBLE), "
            f"              'b', CAST(vs[1] - vs[0] AS DOUBLE)), "
            f"(s, v) -> named_struct("
            f"  'l', {lnew}, "
            f"  'b', CAST({b} AS DOUBLE) * ({lnew} - s.l) "
            f"     + CAST(1.0 - {b} AS DOUBLE) * s.b))")
    st = F.expr(fold)
    return (agged.select(
        key_col, F.size("vs").cast("bigint").alias("n_rows"),
        st.alias("_st"))
        .select(key_col, "n_rows",
                F.round(F.col("_st.l"), 6).alias("level"),
                F.round(F.col("_st.b"), 6).alias("trend"),
                F.round(F.col("_st.l") + F.col("_st.b"), 6)
                .alias("forecast")))


def seasonal_naive_mase(df: DataFrame, key_col: str, ts_col: str,
                        val_col: str, *, period: int = 24,
                        bucket_seconds: int = 3600,
                        round_to: int = 6) -> DataFrame:
    """Forecast-skill evaluation per key: bucket the series (epoch
    div ``bucket_seconds``, DST-free field arithmetic as
    time_range_rolling), then score the SEASONAL-NAIVE forecast
    (y_hat[t] = y[t - period], ROW lag over the observed bucket
    sequence) with MASE (Hyndman & Koehler 2006): numerator = MAE of
    the seasonal forecast, denominator = in-sample MAE of the naive
    one-step forecast. MASE < 1 means the seasonal pattern carries
    real signal — the triage statistic before fitting anything
    heavier.

    Scale shape: one hash aggregation into buckets + two ROW-lag
    windows partitioned by key — no self-join, no global exchange.
    Returns (key, n_buckets, mae_seasonal, mae_naive, mase)."""
    t = F.col(ts_col).cast("timestamp_ntz")
    epoch = (F.datediff(F.to_date(t), F.lit("1970-01-01")).cast("long")
             * 86400 + F.hour(t) * 3600 + F.minute(t) * 60 + F.second(t))
    hourly = (df.withColumn("_b", F.floor(epoch / bucket_seconds))
              .groupBy(key_col, "_b")
              .agg(F.sum(F.col(val_col).cast("double")).alias("_y")))
    w = Window.partitionBy(key_col).orderBy("_b")
    scored = (hourly
              .withColumn("_sn", F.lag("_y", period).over(w))
              .withColumn("_nv", F.lag("_y", 1).over(w)))
    out = (scored.groupBy(key_col)
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
                F.avg(F.abs(F.col("_y") - F.col("_sn"))).alias("_ms"),
                F.avg(F.abs(F.col("_y") - F.col("_nv"))).alias("_mn")))
    return out.select(
        key_col, "n_buckets",
        F.round(F.col("_ms"), round_to).alias("mae_seasonal"),
        F.round(F.col("_mn"), round_to).alias("mae_naive"),
        F.round(F.col("_ms") / F.col("_mn"), round_to).alias("mase"))


def acf_profile(df: DataFrame, key_col: str, ts_col: str,
                val_col: str, *, max_lag: int = 6,
                bucket_seconds: int = 3600,
                round_to: int = 6) -> DataFrame:
    """Autocorrelation profile per key: the ACF at ROW lags 1..
    ``max_lag`` over the bucketed series (the periodicity detector
    generalizing lag-1 autocorrelation — a daily cycle shows as a
    peak at lag 24 on hourly buckets):

        r_k = sum (y_t - m)(y_{t-k} - m) / sum (y_t - m)^2

    with m the series mean. One bucket aggregation, one lag window
    per k (bounded, max_lag explodes structs — still one window
    pass), one per-key rollup. Returns (key, lag, n_pairs, acf)."""
    t = F.col(ts_col).cast("timestamp_ntz")
    epoch = (F.datediff(F.to_date(t), F.lit("1970-01-01")).cast("long")
             * 86400 + F.hour(t) * 3600 + F.minute(t) * 60 + F.second(t))
    hourly = (df.withColumn("_b", F.floor(epoch / bucket_seconds))
              .groupBy(key_col, "_b")
              .agg(F.sum(F.col(val_col).cast("double")).alias("_y")))
    mean = hourly.groupBy(key_col).agg(
        (F.sum("_y") / F.count(F.lit(1))).alias("_m"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        F.sum("_y").alias("_sy"),
        F.count(F.lit(1)).alias("_n"))
    w = Window.partitionBy(key_col).orderBy("_b")
    lagged = hourly
    for k in range(1, max_lag + 1):
        lagged = lagged.withColumn(f"_l{k}", F.lag("_y", k).over(w))
    dev = lagged.join(mean, key_col)
    outs = []
    for k in range(1, max_lag + 1):
        lk = F.col(f"_l{k}")
        outs.append(dev.filter(lk.isNotNull()).groupBy(key_col).agg(
            F.lit(k).alias("lag"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum((F.col("_y") - F.col("_m"))
                  * (lk - F.col("_m"))).alias("_num"),
            F.max(F.col("_syy") - F.col("_sy") * F.col("_sy")
                  / F.col("_n")).alias("_den")))
    acf = outs[0]
    for o in outs[1:]:
        acf = acf.unionByName(o)
    return acf.select(key_col, "lag", "n_pairs",
                      F.round(F.col("_num") / F.col("_den"),
                              round_to).alias("acf"))


def rolling_trend_slope(df: DataFrame, key_col: str, ts_col: str,
                        val_col: str, *, window: int = 24,
                        bucket_seconds: int = 3600,
                        round_to: int = 6) -> DataFrame:
    """Rolling OLS trend slope per key: over each trailing ``window``
    buckets (ROW frame on the observed bucket sequence), the least-
    squares slope of value against bucket index — the local-trend
    detector between EWMA (level) and Mann-Kendall (global monotony):

        slope = (n Σxy - Σx Σy) / (n Σx² - (Σx)²)

    computed from running-sum windows only (five windowed sums, no
    self-join); emitted where the frame holds >= 3 buckets. Returns
    (key, bucket, n_in_frame, slope)."""
    t = F.col(ts_col).cast("timestamp_ntz")
    epoch = (F.datediff(F.to_date(t), F.lit("1970-01-01")).cast("long")
             * 86400 + F.hour(t) * 3600 + F.minute(t) * 60 + F.second(t))
    hourly = (df.withColumn("_b", F.floor(epoch / bucket_seconds))
              .groupBy(key_col, "_b")
              .agg(F.sum(F.col(val_col).cast("double")).alias("_y")))
    # center x on the per-key min bucket: raw epoch-hour indices
    # (~5e5) would make n*Sxy - Sx*Sy cancel 10 orders of magnitude
    # and the engines' different window-sum trees (running fold vs
    # segment tree) would disagree past round-6
    minb = hourly.groupBy(key_col).agg(F.min("_b").alias("_b0"))
    hourly = hourly.join(minb, key_col)
    w = (Window.partitionBy(key_col).orderBy("_b")
         .rowsBetween(-(window - 1), 0))
    x = (F.col("_b") - F.col("_b0")).cast("double")
    n = F.count(F.lit(1)).over(w).cast("double")
    sx = F.sum(x).over(w)
    sy = F.sum("_y").over(w)
    sxx = F.sum(x * x).over(w)
    sxy = F.sum(x * F.col("_y")).over(w)
    out = (hourly
           .withColumn("_n", n).withColumn("_sx", sx)
           .withColumn("_sy", sy).withColumn("_sxx", sxx)
           .withColumn("_sxy", sxy)
           .filter(F.col("_n") >= 3))
    slope = ((F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
             / (F.col("_n") * F.col("_sxx")
                - F.col("_sx") * F.col("_sx")))
    return out.select(key_col, F.col("_b").alias("bucket"),
                      F.col("_n").cast("bigint").alias("n_in_frame"),
                      F.round(slope, round_to).alias("slope"))


def croston_last(df: DataFrame, key_col: str, order_cols: list,
                 val_col: str, alpha: float = 0.3,
                 round_to: int = 6) -> DataFrame:
    """Final Croston state per key for INTERMITTENT demand series
    (Croston 1972): exponential smoothing applied separately to the
    nonzero demand sizes (z) and the inter-demand intervals (p),
    advancing ONLY on demand periods; forecast = z / p, the demand
    rate per period. Initialized at the first nonzero demand with
    z = that demand and p = its 1-based position. Keys with no demand
    drop.

    Execution discipline as holt_last: ONE groupBy shuffle, then one
    aggregate() fold per key over the sorted value array with a
    struct accumulator (Spark evaluates all struct fields against the
    OLD state; the DuckDB twin must hold the state as a LIST — the
    list_reduce struct trap). Memory contract: per-key array is the
    series length; pre-bucket unbounded series first."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("croston_last: alpha out of range")
    order_struct = F.struct(*[F.col(c) for c in order_cols],
                            F.col(val_col).alias("_v"))
    agged = (df.groupBy(key_col)
             .agg(F.array_sort(F.collect_list(order_struct)).alias("os"))
             .withColumn("vs", F.expr(
                 "transform(os, o -> CAST(o._v AS DOUBLE))"))
             .withColumn("_k", F.expr(
                 "array_position(transform(vs, x -> x > 0), true)"))
             .filter(F.col("_k") > 0))
    a = repr(float(alpha))
    fold = (f"aggregate(slice(vs, CAST(_k + 1 AS INT), "
            f"                size(vs) - CAST(_k AS INT)), "
            f"named_struct('z', element_at(vs, CAST(_k AS INT)), "
            f"             'p', CAST(_k AS DOUBLE), "
            f"             'q', CAST(0 AS DOUBLE)), "
            f"(s, v) -> named_struct("
            f"  'z', IF(v > 0, CAST({a} AS DOUBLE) * v "
            f"            + CAST(1.0 - {a} AS DOUBLE) * s.z, s.z), "
            f"  'p', IF(v > 0, CAST({a} AS DOUBLE) * (s.q + 1) "
            f"            + CAST(1.0 - {a} AS DOUBLE) * s.p, s.p), "
            f"  'q', IF(v > 0, CAST(0 AS DOUBLE), s.q + 1)))")
    st = F.expr(fold)
    nz = F.expr("size(filter(vs, x -> x > 0))")
    return (agged.select(
        key_col, F.size("vs").cast("bigint").alias("n_periods"),
        nz.cast("bigint").alias("n_demands"), st.alias("_st"))
        .select(key_col, "n_periods", "n_demands",
                F.round(F.col("_st.z"), round_to).alias("demand_size"),
                F.round(F.col("_st.p"), round_to).alias("interval"),
                F.round(F.col("_st.z") / F.col("_st.p"), round_to)
                .alias("rate_forecast")))


def kaplan_meier(durations: DataFrame, *, dur_col: str = "duration",
                 observed_col: str = "observed",
                 round_to: int = 6) -> DataFrame:
    """Kaplan-Meier product-limit survival estimator (Kaplan & Meier
    1958) over right-censored durations: at each distinct observed
    event time t, S(t) = prod_{t_i <= t} (1 - d_i / n_i) with d_i the
    events and n_i the number still at risk — recrawl-interval
    survival with the still-unchanged pages entering as censored
    spells, the principled upgrade of naive change-rate averages
    (cf. recrawl_priority).

    Scale shape: the risk table is ONE groupBy on duration (distinct
    times, already bounded for bucketed durations) + an ordered
    window cumsum of integer counts; the running product folds over
    the collected risk table in ascending-time order — an O(distinct
    times) array on one executor, the kmeans O(k) discipline, never
    the raw spell count. Every factor is a ratio of exact integers
    and the fold order is fixed, so S(t) is bit-stable. Returns
    (duration, n_risk, n_events, n_censored, survival) for event
    times only (the censored-only times thin the risk set but add no
    step, per the estimator)."""
    d = durations.select(
        F.col(dur_col).cast("double").alias("_t"),
        F.col(observed_col).cast("boolean").alias("_o"))
    total = d.agg(F.count(F.lit(1)).alias("_n"))
    rt = d.groupBy("_t").agg(
        F.sum(F.when(F.col("_o"), 1).otherwise(0)).alias("_d"),
        F.sum(F.when(~F.col("_o"), 1).otherwise(0)).alias("_c"))
    # the risk table is O(distinct times); ONE array fold computes the
    # at-risk cumsum AND the running product — no global window, no
    # single-partition exchange (explain-audit discipline)
    row = F.struct(F.col("_t"), F.col("_d"), F.col("_c"))
    folded = (rt.agg(F.array_sort(F.collect_list(row)).alias("a"))
              .crossJoin(F.broadcast(total))
              .select(F.expr(
                  "transform(a, (r, i) -> named_struct("
                  "  't', r._t, 'd', r._d, 'c', r._c,"
                  "  'nrisk', _n - aggregate(slice(a, 1, i), "
                  "       CAST(0 AS BIGINT), "
                  "       (acc, q) -> acc + q._d + q._c),"
                  "  's', aggregate(slice(a, 1, i + 1), "
                  "       CAST(1 AS DOUBLE), "
                  "       (acc, q) -> acc * (1 - CAST(q._d AS DOUBLE) "
                  "         / (_n - aggregate(slice(a, 1, "
                  "              array_position(transform(a, z -> z._t), "
                  "                             q._t) - 1), "
                  "              CAST(0 AS BIGINT), "
                  "              (a2, q2) -> a2 + q2._d + q2._c))))))")
                  .alias("rows")))
    out = folded.select(F.explode("rows").alias("r")).select(
        F.col("r.t").alias("duration"),
        F.col("r.nrisk").cast("bigint").alias("n_risk"),
        F.col("r.d").cast("bigint").alias("n_events"),
        F.col("r.c").cast("bigint").alias("n_censored"),
        F.round(F.col("r.s"), round_to).alias("survival"))
    return out.filter(F.col("n_events") > 0)


def classical_decomposition(df: DataFrame, key_col: str, seq_col: str,
                            val_col: str, period: int, *,
                            round_to: int = 6) -> DataFrame:
    """Classical additive seasonal decomposition (the moving-average
    method, Macaulay 1931 — still the reference baseline under STL):
    per key, trend = centered moving average over one full (odd)
    period (NULL where the window is truncated), seasonal = the
    phase-mean of the detrended series re-centered to sum to zero,
    remainder = value - trend - seasonal.

    Scale shape: one per-key ROWS window for the MA (partitioned,
    never global), two groupBys for the phase means and their
    centering, and broadcast joins back — no self-join, no global
    exchange. Returns (key, seq, value, trend, seasonal, remainder)."""
    if period % 2 != 1 or period < 3:
        raise ValueError("classical_decomposition: period must be odd >= 3")
    h = period // 2
    d = df.select(F.col(key_col).alias("_k"),
                  F.col(seq_col).cast("bigint").alias("_s"),
                  F.col(val_col).cast("double").alias("_v"))
    w = Window.partitionBy("_k").orderBy("_s").rowsBetween(-h, h)
    d = d.withColumn(
        "_trend",
        F.when(F.count(F.lit(1)).over(w) == period, F.avg("_v").over(w)))
    d = d.withColumn("_phase", F.pmod(F.col("_s"), F.lit(period)))
    d = d.withColumn("_det", F.col("_v") - F.col("_trend"))
    ph = (d.groupBy("_k", "_phase")
          .agg(F.avg("_det").alias("_sp")))
    ctr = ph.groupBy("_k").agg(F.avg("_sp").alias("_spm"))
    ph = (ph.join(ctr, "_k")
          .select("_k", "_phase",
                  (F.col("_sp") - F.col("_spm")).alias("_seasonal")))
    out = d.join(ph, ["_k", "_phase"])
    return out.select(
        F.col("_k").alias(key_col), F.col("_s").alias(seq_col),
        F.round("_v", round_to).alias("value"),
        F.round("_trend", round_to).alias("trend"),
        F.round("_seasonal", round_to).alias("seasonal"),
        F.round(F.col("_v") - F.col("_trend") - F.col("_seasonal"),
                round_to).alias("remainder"))


# method-of-moments Gumbel constants, inlined as literals so both
# engines fold identical doubles
_EULER_GAMMA = 0.5772156649015329
_PI = 3.141592653589793


def gumbel_block_maxima(df: DataFrame, key_col: str, block_col: str,
                        val_col: str, *,
                        round_to: int = 6) -> DataFrame:
    """Extreme-value analysis per key: block maxima + a Gumbel fit by
    the method of moments (beta = s * sqrt(6) / pi, mu = mean -
    gamma * beta; Gumbel 1958) and the implied 100-block return
    level mu - beta ln(-ln(1 - 1/100)) — the peak-load / flood-design
    summary (how bad is the 1-in-100 burst) for per-host traffic or
    per-cell rainfall alike.

    Scale shape: one groupBy(key, block) max + one groupBy(key)
    moment pass — map-side partials end to end; the constants are
    inlined literals so the closed forms are bit-stable. Keys need
    >= 2 blocks (variance), others drop."""
    bm = (df.groupBy(F.col(key_col).alias("_k"),
                     F.col(block_col).alias("_b"))
          .agg(F.max(F.col(val_col).cast("double")).alias("_m")))
    g = (bm.groupBy("_k")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
              F.avg("_m").alias("_mean"),
              F.stddev_samp("_m").alias("_sd"))
         .filter(F.col("n_blocks") >= 2))
    beta = F.col("_sd") * F.lit(math.sqrt(6.0)) / F.lit(_PI)
    mu = F.col("_mean") - F.lit(_EULER_GAMMA) * beta
    rl = mu - beta * F.log(-F.log(F.lit(1.0 - 1.0 / 100.0)))
    return g.select(
        F.col("_k").alias(key_col), "n_blocks",
        F.round(mu, round_to).alias("gumbel_mu"),
        F.round(beta, round_to).alias("gumbel_beta"),
        F.round(rl, round_to).alias("return_level_100"))


def nelson_aalen_hazard(durations: DataFrame, *,
                        dur_col: str = "duration",
                        observed_col: str = "observed",
                        round_to: int = 6) -> DataFrame:
    """Nelson-Aalen cumulative hazard (Nelson 1972; Aalen 1978):
    H(t) = sum_{t_i <= t} d_i / n_i over the same right-censored risk
    table as :func:`kaplan_meier` — the hazard-scale companion
    (exp(-H) is the Fleming-Harrington survival variant), preferred
    when hazards are the modeling target (recrawl intensity).

    Scale shape identical to kaplan_meier: one groupBy(duration),
    then the at-risk cumsum AND hazard cumsum inside a single
    O(distinct-times) array fold — no global window. Returns event
    times only: (duration, n_risk, n_events, cum_hazard)."""
    d = durations.select(
        F.col(dur_col).cast("double").alias("_t"),
        F.col(observed_col).cast("boolean").alias("_o"))
    total = d.agg(F.count(F.lit(1)).alias("_n"))
    rt = d.groupBy("_t").agg(
        F.sum(F.when(F.col("_o"), 1).otherwise(0)).alias("_d"),
        F.sum(F.when(~F.col("_o"), 1).otherwise(0)).alias("_c"))
    row = F.struct(F.col("_t"), F.col("_d"), F.col("_c"))
    folded = (rt.agg(F.array_sort(F.collect_list(row)).alias("a"))
              .crossJoin(F.broadcast(total))
              .select(F.expr(
                  "transform(a, (r, i) -> named_struct("
                  "  't', r._t, 'd', r._d,"
                  "  'nrisk', _n - aggregate(slice(a, 1, i), "
                  "       CAST(0 AS BIGINT), "
                  "       (acc, q) -> acc + q._d + q._c),"
                  "  'h', aggregate(slice(a, 1, i + 1), "
                  "       CAST(0 AS DOUBLE), "
                  "       (acc, q) -> acc + CAST(q._d AS DOUBLE) "
                  "         / (_n - aggregate(slice(a, 1, "
                  "              array_position(transform(a, z -> z._t), "
                  "                             q._t) - 1), "
                  "              CAST(0 AS BIGINT), "
                  "              (a2, q2) -> a2 + q2._d + q2._c)))))")
                  .alias("rows")))
    return (folded.select(F.explode("rows").alias("r"))
            .select(F.col("r.t").alias("duration"),
                    F.col("r.nrisk").cast("bigint").alias("n_risk"),
                    F.col("r.d").cast("bigint").alias("n_events"),
                    F.round(F.col("r.h"), round_to).alias("cum_hazard"))
            .filter(F.col("n_events") > 0))


def log_rank_test(durations: DataFrame, *, dur_col: str = "duration",
                  observed_col: str = "observed",
                  group_col: str = "grp",
                  round_to: int = 6) -> DataFrame:
    """Two-sample log-rank test (Mantel 1966; Peto & Peto 1972) on
    right-censored spells: at each event time, observed group-1
    events vs the hypergeometric expectation d * n1 / n, summed with
    the matching variance into the chi-square statistic
    (O1 - E1)^2 / V — do the two recrawl policies really differ, the
    inferential arm of the KM / Nelson-Aalen estimators.

    Scale shape: ONE groupBy(duration) risk table with per-group
    conditional counts; the at-risk prefixes and per-time terms come
    from a single O(distinct-times) array transform (the kaplan_meier
    fold idiom — no global window), then one scalar aggregate.
    Returns one row (n1, n2, o1, e1, chi2)."""
    d = durations.select(
        F.col(dur_col).cast("double").alias("_t"),
        F.col(observed_col).cast("boolean").alias("_o"),
        F.col(group_col).cast("boolean").alias("_g"))
    tot = d.agg(
        F.sum(F.when(F.col("_g"), 1).otherwise(0)).alias("_n1"),
        F.sum(F.when(~F.col("_g"), 1).otherwise(0)).alias("_n2"))
    rt = d.groupBy("_t").agg(
        F.sum(F.when(F.col("_g") & F.col("_o"), 1).otherwise(0))
        .alias("_d1"),
        F.sum(F.when(F.col("_g") & ~F.col("_o"), 1).otherwise(0))
        .alias("_c1"),
        F.sum(F.when(~F.col("_g") & F.col("_o"), 1).otherwise(0))
        .alias("_d2"),
        F.sum(F.when(~F.col("_g") & ~F.col("_o"), 1).otherwise(0))
        .alias("_c2"))
    row = F.struct(F.col("_t"), F.col("_d1"), F.col("_c1"),
                   F.col("_d2"), F.col("_c2"))
    terms = (rt.agg(F.array_sort(F.collect_list(row)).alias("a"))
             .crossJoin(F.broadcast(tot))
             .select(F.expr(
                 "transform(a, (r, i) -> named_struct("
                 "  'd1', CAST(r._d1 AS DOUBLE),"
                 "  'n1', CAST(_n1 - aggregate(slice(a, 1, i),"
                 "        CAST(0 AS BIGINT),"
                 "        (acc, q) -> acc + q._d1 + q._c1) AS DOUBLE),"
                 "  'n2', CAST(_n2 - aggregate(slice(a, 1, i),"
                 "        CAST(0 AS BIGINT),"
                 "        (acc, q) -> acc + q._d2 + q._c2) AS DOUBLE),"
                 "  'd', CAST(r._d1 + r._d2 AS DOUBLE)))").alias("rows")))
    t = terms.select(F.explode("rows").alias("r")).select(
        F.col("r.d1").alias("d1"), F.col("r.n1").alias("n1"),
        F.col("r.n2").alias("n2"), F.col("r.d").alias("d"))
    n = F.col("n1") + F.col("n2")
    e1 = F.col("d") * F.col("n1") / n
    v = F.when(n > 1,
               F.col("d") * (F.col("n1") / n) * (F.col("n2") / n)
               * (n - F.col("d")) / (n - 1)).otherwise(0.0)
    agg = t.filter(F.col("d") > 0).agg(
        F.sum("d1").alias("_o1"), F.sum(e1).alias("_e1"),
        F.sum(v).alias("_v"))
    return (agg.crossJoin(F.broadcast(tot))
            .select(F.col("_n1").cast("bigint").alias("n1"),
                    F.col("_n2").cast("bigint").alias("n2"),
                    F.col("_o1").cast("bigint").alias("o1"),
                    F.round("_e1", round_to).alias("e1"),
                    F.round((F.col("_o1") - F.col("_e1"))
                            * (F.col("_o1") - F.col("_e1"))
                            / F.col("_v"), round_to).alias("chi2")))


def seasonal_strength(df: DataFrame, key_col: str, ts_col: str,
                      value_col: str, *, round_to: int = 6) -> DataFrame:
    """Per-key seasonal strength on the hour-of-day cycle:
    1 - Var(value - seasonal_mean) / Var(value), clamped at 0 —
    the Wang/Hyndman feature-based decomposition score with the
    seasonal component estimated by hourly means. 1 = the hour
    explains everything; 0 = no hourly structure.

    Scale shape: the seasonal means are a partitioned window over
    (key, hour) — they never leave the exchange the per-key variance
    needs anyway; variances come from explicit sufficient statistics
    (sum / sum-of-squares), not library var_pop, so the float
    expression is engine-identical. Returns one row per key
    (key, n, seasonal_strength)."""
    v = F.col(value_col).cast("double")
    d = (df.select(F.col(key_col).alias("_k"), v.alias("_v"),
                   F.col(ts_col).alias("_ts"))
         .filter(F.col("_v").isNotNull())
         .withColumn("_s", F.avg("_v").over(
             Window.partitionBy("_k", F.hour(F.col("_ts"))))))
    r = F.col("_v") - F.col("_s")
    agg = d.groupBy("_k").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_v").alias("_sv"), F.sum(F.col("_v") * F.col("_v")).alias("_svv"),
        F.sum(r).alias("_sr"), F.sum(r * r).alias("_srr"))
    n = F.col("_n").cast("double")
    var_v = F.col("_svv") / n - (F.col("_sv") / n) * (F.col("_sv") / n)
    var_r = F.col("_srr") / n - (F.col("_sr") / n) * (F.col("_sr") / n)
    return agg.select(
        F.col("_k").alias(key_col),
        F.col("_n").cast("bigint").alias("n"),
        F.round(F.greatest(F.lit(0.0), 1 - var_r / var_v), round_to)
        .alias("seasonal_strength"))


def ar1_coefficient(df: DataFrame, key_col: str, order_cols: list,
                    value_col: str, *, round_to: int = 6) -> DataFrame:
    """Per-key lag-1 autoregressive coefficient: the OLS slope of
    x_t on x_{t-1} over the ``order_cols``-ordered series (include a
    unique tiebreak). phi ~ 0 white noise, -> 1 strong persistence,
    < 0 mean reversion — the stationarity screen before any
    smoothing/forecast operator (holt_last, croston) is trusted.

    Scale shape: one partitioned lag window + one groupBy of the five
    OLS sufficient statistics. Keys with < 2 observations drop.
    Returns (key, n_pairs, ar1_phi)."""
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    v = F.col(value_col).cast("double")
    pairs = (df.withColumn("_y", v).withColumn("_x", F.lag(v).over(w))
             .filter(F.col("_x").isNotNull() & F.col("_y").isNotNull()))
    agg = pairs.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("_x").alias("_sx"), F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"))
    n = F.col("n_pairs").cast("double")
    phi = ((n * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
           / (n * F.col("_sxx") - F.col("_sx") * F.col("_sx")))
    return agg.filter(F.col("n_pairs") >= 2).select(
        key_col, "n_pairs", F.round(phi, round_to).alias("ar1_phi"))


def variance_ratio(df: DataFrame, key_col: str, order_cols: list,
                   value_col: str, *, q: int = 4,
                   round_to: int = 6) -> DataFrame:
    """Per-key Lo-MacKinlay variance ratio VR(q) =
    Var(x_t - x_{t-q}) / (q * Var(x_t - x_{t-1})) over the ordered
    series (overlapping q-differences, population variances). VR ~ 1
    for a random walk, < 1 mean-reverting, > 1 trending.

    Scale shape: two partitioned lag windows sharing one exchange +
    one groupBy of explicit moments. Keys with < 2 q-spaced
    differences drop. Returns (key, n_1, n_q, vr)."""
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    v = F.col(value_col).cast("double")
    d = (df.withColumn("_d1", v - F.lag(v, 1).over(w))
         .withColumn("_dq", v - F.lag(v, q).over(w)))
    agg = d.groupBy(key_col).agg(
        F.count("_d1").alias("n_1"),
        F.sum("_d1").alias("_s1"),
        F.sum(F.col("_d1") * F.col("_d1")).alias("_s11"),
        F.count("_dq").alias("n_q"),
        F.sum("_dq").alias("_sq"),
        F.sum(F.col("_dq") * F.col("_dq")).alias("_sqq"))
    n1 = F.col("n_1").cast("double")
    nq = F.col("n_q").cast("double")
    var1 = F.col("_s11") / n1 - (F.col("_s1") / n1) * (F.col("_s1") / n1)
    varq = F.col("_sqq") / nq - (F.col("_sq") / nq) * (F.col("_sq") / nq)
    return (agg.filter(F.col("n_q") >= 2)
            .select(key_col, "n_1", "n_q",
                    F.round(varq / (q * var1), round_to).alias("vr")))


def changepoint_split(df: DataFrame, key_col: str, t_col: str,
                      y_col: str, *, round_to: int = 6) -> DataFrame:
    """Single-changepoint detection per key — the first step of
    binary segmentation (Scott & Knott 1974): over the series y_t
    ordered by ``t_col`` (one row per distinct t — pre-aggregate
    upstream), choose the split that minimizes
    SSE(left) + SSE(right), with SSE from exact prefix sums
    (Q - S^2/W). Pass an exact-INTEGER y (cents-quantize floats
    upstream): prefix sums are then exact longs and every engine
    computes bit-identical split scores, so the argmin
    (min-over-struct, earliest t on ties) agrees across engines.

    Returns (key, split_t, n_left, n_right, sse_reduction) where
    split_t is the LAST point of the left segment and
    sse_reduction = 1 - SSE_best / SSE_total (NULL for a constant
    series). Scale shape: one partitioned window chain per key — no
    global exchange; O(n) candidate rows folded by min(struct)."""
    w = (Window.partitionBy("_k").orderBy("_t")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    base = df.select(F.col(key_col).alias("_k"), F.col(t_col).alias("_t"),
                     F.col(y_col).cast("long").alias("_y"))
    pre = (base
           .withColumn("_i", F.count(F.lit(1)).over(w))
           .withColumn("_S", F.sum("_y").over(w))
           .withColumn("_Q", F.sum(F.col("_y") * F.col("_y")).over(w)))
    tot = base.groupBy("_k").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_y").alias("_St"),
        F.sum(F.col("_y") * F.col("_y")).alias("_Qt"))
    sse_l = F.col("_Q") - F.col("_S") * F.col("_S") / F.col("_i")
    sse_r = ((F.col("_Qt") - F.col("_Q"))
             - (F.col("_St") - F.col("_S"))
             * (F.col("_St") - F.col("_S"))
             / (F.col("_n") - F.col("_i")))
    cand = (pre.join(tot, "_k")
            .filter(F.col("_i") < F.col("_n"))
            .select("_k", (sse_l + sse_r).alias("_sse"), "_t", "_i"))
    best = (cand.groupBy("_k")
            .agg(F.min(F.struct(F.col("_sse").alias("s"),
                                F.col("_t").alias("t"),
                                F.col("_i").alias("i"))).alias("_b")))
    return (best.join(tot, "_k")
            .select(F.col("_k").alias(key_col),
                    F.col("_b.t").alias("split_t"),
                    F.col("_b.i").cast("bigint").alias("n_left"),
                    (F.col("_n") - F.col("_b.i")).cast("bigint")
                    .alias("n_right"),
                    F.round(F.lit(1.0) - F.col("_b.s")
                            / F.nullif(F.col("_Qt")
                                       - F.col("_St") * F.col("_St")
                                       / F.col("_n"), F.lit(0.0)),
                            round_to).alias("sse_reduction"))
            .orderBy(key_col))


def granger_f(series: DataFrame, *, t_col: str = "t", y_col: str = "y",
              x_col: str = "x", round_to: int = 6) -> DataFrame:
    """Granger-causality F test at lag 1 (Granger 1969): does the
    lagged predictor x_{t-1} improve the AR(1) forecast of y_t?
    Restricted model  y_t = c + phi*y_{t-1}; unrestricted adds
    beta*x_{t-1}. Both are solved in closed form from one pass of
    sufficient statistics (the normal equations of the 2-predictor
    OLS via the exact 2x2 inverse on centered cross-moments — no
    iterative fit), and F = (RSS_r - RSS_u) / (RSS_u / (n - 3)) with
    1 numerator df.

    Scale shape: the input is an already-aggregated O(time-buckets)
    series, so the lag alignment runs as ONE bounded global aggregate
    (array_sort(collect_list) + transform/zip_with folds — the
    changepoint_split idiom, no single-partition window exchange);
    the corpus-sized table never reappears after the upstream
    bucketing groupBy. With integer count series the nine
    cross-moments are EXACT (integer sums), and only ratio statistics
    are returned (F, R-squared of both models) — raw RSS magnitudes
    are summation-order sensitive at the ulp level while the ratios
    cancel it. Returns one row
    (n, f_stat, r2_restricted, r2_unrestricted)."""
    from pyspark.sql import functions as F

    a = series.agg(F.array_sort(F.collect_list(F.struct(
        F.col(t_col).alias("t"),
        F.col(y_col).cast("double").alias("y"),
        F.col(x_col).cast("double").alias("x")))).alias("a"))

    cur = "slice(a, 2, size(a) - 1)"
    prev = "slice(a, 1, size(a) - 1)"

    def _s(vec: str, name: str) -> str:
        return f"aggregate({vec}, 0D, (acc, v) -> acc + v) AS {name}"

    m = a.selectExpr(
        "CAST(size(a) - 1 AS DOUBLE) AS n",
        _s(f"transform({cur}, s -> s.y)", "sy"),
        _s(f"transform({prev}, s -> s.y)", "sl"),
        _s(f"transform({prev}, s -> s.x)", "sx"),
        _s(f"transform({cur}, s -> s.y * s.y)", "syy"),
        _s(f"transform({prev}, s -> s.y * s.y)", "sll"),
        _s(f"transform({prev}, s -> s.x * s.x)", "sxx"),
        _s(f"zip_with({cur}, {prev}, (c, p) -> c.y * p.y)", "syl"),
        _s(f"zip_with({cur}, {prev}, (c, p) -> c.y * p.x)", "syx"),
        _s(f"transform({prev}, s -> s.y * s.x)", "slx"))
    n = F.col("n")
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    cll = F.col("sll") - F.col("sl") * F.col("sl") / n
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    cyl = F.col("syl") - F.col("sy") * F.col("sl") / n
    cyx = F.col("syx") - F.col("sy") * F.col("sx") / n
    clx = F.col("slx") - F.col("sl") * F.col("sx") / n
    rss_r = cyy - cyl * cyl / cll
    det = cll * cxx - clx * clx
    b1 = (cxx * cyl - clx * cyx) / det
    b2 = (cll * cyx - clx * cyl) / det
    rss_u = cyy - b1 * cyl - b2 * cyx
    f = (rss_r - rss_u) / (rss_u / (n - 3))
    return m.select(
        n.cast("bigint").alias("n"),
        F.round(f, round_to).alias("f_stat"),
        F.round(1 - rss_r / cyy, round_to).alias("r2_restricted"),
        F.round(1 - rss_u / cyy, round_to).alias("r2_unrestricted"))


def cox_ph_quantized(durations: DataFrame, *, dur_col: str = "duration",
                     observed_col: str = "observed", x_col: str = "x",
                     iters: int = 3, round_to: int = 6) -> DataFrame:
    """Cox proportional-hazards regression (Cox 1972) with ONE
    quantized covariate, Breslow tie handling — the effect-size
    member of the survival family (kaplan_meier / nelson_aalen_hazard
    estimate curves; log_rank_test detects a difference; Cox measures
    it as a hazard ratio). Newton-Raphson on the partial
    log-likelihood: per step, U(b) = sum_events(x) - sum_t d_t S1/S0
    and I(b) = sum_t d_t (S2/S0 - (S1/S0)^2) with
    S_k(t) = sum_{t_j >= t} x_j^k exp(b x_j); b += U/I.

    Scale shape — the quantized-covariate contract is the whole
    trick: the corpus is touched ONCE (one groupBy on (duration,
    x-level) with map-side combine), and every Newton step runs on
    that bounded table: per-time S_k terms are one groupBy(t), the
    risk-set suffix sums fold over the collected O(distinct times)
    array (the kaplan_meier discipline — no global window), and U/I
    are two scalars. b is rounded to 12 decimals per step (the
    pagerank discipline). Continuous covariates quantize upstream
    (the GMM/isotonic binning contract). Returns one row
    (n, n_events, beta, hazard_ratio, se) — se = 1/sqrt(I) at the
    final beta, ratios rounded to ``round_to``."""
    from pyspark.sql import functions as F

    ct = (durations.select(
            F.col(dur_col).cast("double").alias("_t"),
            F.col(x_col).cast("double").alias("_x"),
            F.col(observed_col).cast("boolean").alias("_o"))
          .groupBy("_t", "_x")
          .agg(F.count(F.lit(1)).cast("double").alias("_n"),
               F.sum(F.when(F.col("_o"), 1).otherwise(0))
               .cast("double").alias("_d"))
          .localCheckpoint(eager=False))

    def _ui(beta: float):
        ex = F.exp(F.lit(beta) * F.col("_x"))
        rt = ct.groupBy("_t").agg(
            F.sum(F.col("_n") * ex).alias("a0"),
            F.sum(F.col("_n") * F.col("_x") * ex).alias("a1"),
            F.sum(F.col("_n") * F.col("_x") * F.col("_x") * ex)
            .alias("a2"),
            F.sum("_d").alias("d"),
            F.sum(F.col("_d") * F.col("_x")).alias("sx"))
        row = F.struct(F.col("_t"), F.col("d"), F.col("sx"),
                       F.col("a0"), F.col("a1"), F.col("a2"))
        folded = rt.agg(F.array_sort(F.collect_list(row)).alias("a")) \
            .select(F.expr(
                "transform(a, (r, i) -> named_struct("
                "  'd', r.d, 'sx', r.sx,"
                "  's0', aggregate(slice(a, i + 1, size(a) - i),"
                "        CAST(0 AS DOUBLE), (acc, q) -> acc + q.a0),"
                "  's1', aggregate(slice(a, i + 1, size(a) - i),"
                "        CAST(0 AS DOUBLE), (acc, q) -> acc + q.a1),"
                "  's2', aggregate(slice(a, i + 1, size(a) - i),"
                "        CAST(0 AS DOUBLE), (acc, q) -> acc + q.a2)))")
                .alias("rows"))
        ev = (folded.select(F.explode("rows").alias("r"))
              .filter(F.col("r.d") > 0))
        agg = ev.agg(
            F.sum(F.col("r.sx")
                  - F.col("r.d") * F.col("r.s1") / F.col("r.s0"))
            .alias("u"),
            F.sum(F.col("r.d")
                  * (F.col("r.s2") / F.col("r.s0")
                     - (F.col("r.s1") / F.col("r.s0"))
                     * (F.col("r.s1") / F.col("r.s0"))))
            .alias("i")).collect()[0]
        return agg.u, agg.i

    beta = 0.0
    for _ in range(iters):
        u, i = _ui(beta)
        beta = round(beta + u / i, 12)
    _, i_fin = _ui(beta)
    tot = durations.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col(observed_col).cast("boolean"), 1)
              .otherwise(0)).cast("bigint").alias("n_events"))
    return tot.select(
        "n", "n_events",
        F.round(F.lit(beta), round_to).alias("beta"),
        F.round(F.exp(F.lit(beta)), round_to).alias("hazard_ratio"),
        F.round(F.lit(1.0) / F.sqrt(F.lit(i_fin)), round_to).alias("se"))


def kalman_level_last(df: DataFrame, key_col: str, order_cols: list[str],
                      val_col: str, q: float = 4.0, r: float = 25.0,
                      round_to: int = 6) -> DataFrame:
    """Final 1-D Kalman filter state per key for the local-level model
    (random-walk state x_t = x_{t-1} + w, w ~ N(0, q); observation
    z_t = x_t + v, v ~ N(0, r)) — the optimal-gain upgrade of the
    fixed-gain smoothers (`ewma_last` uses a constant alpha;
    `holt_last` a constant alpha/beta): here the gain
    K = P'/(P' + r) ADAPTS as the error variance P converges to its
    steady state, which is exactly the Riccati fixed point a
    monitoring pipeline wants for change-alarm thresholds.

        P' = P + q;  K = P'/(P' + r)
        x <- x + K*(z - x);  P <- (1 - K)*P'

    initialized x_1 = z_1, P_1 = r (the diffuse-ish standard start).
    Execution discipline: ONE groupBy shuffle, then one aggregate()
    fold per key over its sorted value array with a STRUCT
    accumulator (the holt_last shape; the DuckDB twin replays it with
    a LIST accumulator — the list_reduce struct-field trap). The fold
    is pure rational arithmetic in identical order on both engines —
    no libm — so the trajectory is bit-stable before the final
    rounding. Returns (key, n_rows, x_hat, p_var, gain, mae_innov):
    the filtered level, its error variance, the converged gain, and
    the mean absolute one-step innovation (the residual-scale number
    alarms are calibrated on)."""
    qq = repr(float(q))
    rr = repr(float(r))
    order_struct = F.struct(*[F.col(c) for c in order_cols],
                            F.col(val_col).alias("_v"))
    agged = (df.groupBy(key_col)
             .agg(F.array_sort(F.collect_list(order_struct)).alias("os"))
             .withColumn("vs", F.expr(
                 "transform(os, o -> CAST(o._v AS DOUBLE))"))
             .filter(F.size("vs") >= 2))
    kgain = f"((s.p + CAST({qq} AS DOUBLE)) " \
            f"/ (s.p + CAST({qq} AS DOUBLE) + CAST({rr} AS DOUBLE)))"
    fold = (f"aggregate(slice(vs, 2, size(vs) - 1), "
            f"named_struct('x', CAST(vs[0] AS DOUBLE), "
            f"              'p', CAST({rr} AS DOUBLE), "
            f"              'acc', CAST(0 AS DOUBLE)), "
            f"(s, v) -> named_struct("
            f"  'x', s.x + {kgain} * (v - s.x), "
            f"  'p', (1 - {kgain}) * (s.p + CAST({qq} AS DOUBLE)), "
            f"  'acc', s.acc + abs(v - s.x)))")
    st = F.expr(fold)
    return (agged.select(
        key_col, F.size("vs").cast("bigint").alias("n_rows"),
        st.alias("_st"))
        .select(key_col, "n_rows",
                F.round(F.col("_st.x"), round_to).alias("x_hat"),
                F.round(F.col("_st.p"), round_to).alias("p_var"),
                F.round((F.col("_st.p") + F.lit(float(q)))
                        / (F.col("_st.p") + F.lit(float(q))
                           + F.lit(float(r))), round_to)
                .alias("gain"),
                F.round(F.col("_st.acc")
                        / (F.col("n_rows") - 1), round_to)
                .alias("mae_innov"))
        .orderBy(key_col))


def sprt_decision(df: DataFrame, key_col: str, order_cols: list[str],
                  flag_col: str, *, p0: float = 0.15, p1: float = 0.25,
                  alpha: float = 0.05, beta: float = 0.05,
                  round_to: int = 6) -> DataFrame:
    """Wald's sequential probability ratio test (Wald 1945) per key
    over an ordered Bernoulli stream: accumulate the log-likelihood
    ratio llr += x ln(p1/p0) + (1-x) ln((1-p1)/(1-p0)) and stop the
    FIRST time it exits [ln(beta/(1-alpha)), ln((1-beta)/alpha)] —
    the early-stopping monitor for per-entity rate shifts (host error
    rates, user click rates) that fixed-n tests (welch_ttest,
    mcnemar) must wait out. decision: +1 accepts H1 (p = p1), -1
    accepts H0, 0 = still sampling at stream end; decided_at is the
    1-based stopping step (0 if undecided).

    Execution discipline: the holt_last shape — ONE groupBy shuffle,
    one aggregate() fold per key over the sorted flag array with a
    STRUCT accumulator that FREEZES once a boundary is crossed (the
    sequential-stopping semantics, replayed by the DuckDB twin with a
    LIST accumulator). The llr lattice is a two-generator integer
    combination of the ln constants, so a cross-engine 1-ulp ln
    difference moves llr by ~1e-14 — decisions flip only on exact
    boundary coincidences, and the reported llr rounds at 6 dp.
    Returns (key, n_events, decision, decided_at, llr)."""
    # shared textual constants — both engines parse the same literals
    inc = (f"(v * ln(CAST({p1!r} AS DOUBLE) / CAST({p0!r} AS DOUBLE)) "
           f"+ (1 - v) * ln(CAST({1 - p1!r} AS DOUBLE) "
           f"/ CAST({1 - p0!r} AS DOUBLE)))")
    up = (f"ln(CAST({1 - beta!r} AS DOUBLE) / CAST({alpha!r} AS DOUBLE))")
    lo = (f"ln(CAST({beta!r} AS DOUBLE) / CAST({1 - alpha!r} AS DOUBLE))")
    order_struct = F.struct(*[F.col(c) for c in order_cols],
                            F.col(flag_col).cast("double").alias("_v"))
    agged = (df.groupBy(key_col)
             .agg(F.array_sort(F.collect_list(order_struct)).alias("os"))
             .withColumn("vs", F.expr(
                 "transform(os, o -> CAST(o._v AS DOUBLE))")))
    nxt = f"(s.llr + {inc})"
    fold = (f"aggregate(vs, "
            f"named_struct('llr', CAST(0 AS DOUBLE), "
            f"              'dec', CAST(0 AS DOUBLE), "
            f"              'stp', CAST(0 AS DOUBLE), "
            f"              'at', CAST(0 AS DOUBLE)), "
            f"(s, v) -> named_struct("
            f"  'llr', CASE WHEN s.dec <> 0 THEN s.llr ELSE {nxt} END, "
            f"  'dec', CASE WHEN s.dec <> 0 THEN s.dec "
            f"              WHEN {nxt} >= {up} THEN CAST(1 AS DOUBLE) "
            f"              WHEN {nxt} <= {lo} THEN CAST(-1 AS DOUBLE) "
            f"              ELSE CAST(0 AS DOUBLE) END, "
            f"  'stp', s.stp + 1, "
            f"  'at', CASE WHEN s.dec <> 0 THEN s.at "
            f"             WHEN {nxt} >= {up} OR {nxt} <= {lo} "
            f"             THEN s.stp + 1 "
            f"             ELSE CAST(0 AS DOUBLE) END))")
    st = F.expr(fold)
    return (agged.select(
        key_col, F.size("vs").cast("bigint").alias("n_events"),
        st.alias("_st"))
        .select(key_col, "n_events",
                F.col("_st.dec").cast("bigint").alias("decision"),
                F.col("_st.at").cast("bigint").alias("decided_at"),
                F.round(F.col("_st.llr"), round_to).alias("llr"))
        .orderBy(key_col))


def durbin_watson(df: DataFrame, group_col: str, order_cols: list[str],
                  x_col: str, y_col: str, *,
                  round_to: int = 6) -> DataFrame:
    """Durbin-Watson residual-autocorrelation statistic per group
    (Durbin & Watson 1950): fit OLS y ~ a + b*x from exact moment
    sums, then DW = sum_t (e_t - e_{t-1})^2 / sum_t e_t^2 over the
    ``order_cols``-ordered residuals. DW ~ 2 means no lag-1
    autocorrelation, -> 0 positive (the un-modeled level shift in the
    series fixture), -> 4 negative.

    Float parity: with integer-valued x and y the moment sums are
    EXACT, so slope/intercept are identical double divisions in both
    engines; residual terms then evaluate bit-identically and only
    the final sums' addition order differs (absorbed by round_to).

    Scale shape: one map-side-combinable moment groupBy, a join of the
    per-group (a, b) back onto the rows (left to AQE: broadcast while
    the group table is small, shuffle-on-g — the same key the lag
    window repartitions by anyway — when group cardinality outgrows
    the threshold), one per-group lag window, one final groupBy; no
    global exchange."""
    g = F.col(group_col).alias("g")
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = df.select(g, x.alias("x"), y.alias("y"),
                     *[F.col(c) for c in order_cols])
    m = (base.groupBy("g").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"))
        .withColumn("b", (F.col("n") * F.col("sxy")
                          - F.col("sx") * F.col("sy"))
                    / (F.col("n") * F.col("sxx")
                       - F.col("sx") * F.col("sx")))
        .withColumn("a", (F.col("sy") - F.col("b") * F.col("sx"))
                    / F.col("n"))
        .select("g", "n", "a", "b"))
    res = (base.join(m, "g")
           .withColumn("e", F.col("y") - F.col("a")
                       - F.col("b") * F.col("x")))
    w = Window.partitionBy("g").orderBy(*order_cols)
    lagged = res.withColumn("ep", F.lag("e").over(w))
    out = (lagged.groupBy("g").agg(
        F.first("n").alias("n"),
        F.sum(F.col("e") * F.col("e")).alias("sse"),
        F.sum(F.when(F.col("ep").isNotNull(),
                     (F.col("e") - F.col("ep"))
                     * (F.col("e") - F.col("ep")))).alias("sdd"))
        .select(F.col("g").alias(group_col),
                F.col("n").cast("bigint").alias("n"),
                F.round(F.col("sdd") / F.col("sse"), round_to)
                .alias("dw")))
    return out.orderBy(group_col)


def sax_words(df: DataFrame, group_col: str, order_cols: list[str],
              value_col: str, *, n_segments: int = 8) -> DataFrame:
    """SAX-style symbolic series encoding per group (Lin et al. 2003,
    restated for cross-engine exactness): split the ordered series
    into ``n_segments`` PAA segments (index i -> segment
    (i-1)*w div n), take each segment's mean, and letter it against
    the group's own mean +- 0.5 sd bands: a < m-s/2 <= b < m <= c <
    m+s/2 <= d. Classic SAX z-normalizes each point then letters
    against N(0,1) quantiles; lettering the raw-integer segment means
    against m + k*s is the SAME partition of the value axis (affine
    invariance) but keeps every compared quantity a deterministic
    function of EXACT integer sums — segment mean and band edges are
    bit-identical across engines, so letters can never flip on
    accumulation order.

    Scale shape: one groupBy for global moments, one (group, segment)
    groupBy for PAA sums, one ordered string_agg fold over
    O(n_segments) rows per group — all map-side combinable, no
    windows."""
    g = F.col(group_col).alias("g")
    v = F.col(value_col).cast("double")
    w = Window.partitionBy("g").orderBy(*order_cols)
    base = (df.select(g, v.alias("v"), *[F.col(c) for c in order_cols])
            .withColumn("i", F.row_number().over(w)))
    mom = (base.groupBy("g").agg(
        F.count(F.lit(1)).alias("nl"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"))
        .withColumn("n", F.col("nl").cast("double"))
        .withColumn("m", F.col("s") / F.col("n"))
        .withColumn("sd", F.sqrt((F.col("ss")
                                  - F.col("s") * F.col("s") / F.col("n"))
                                 / (F.col("n") - 1))))
    # integer segment index: (i-1)*w div n — never a float cast, whose
    # int conversion ROUNDS in DuckDB but truncates in Spark
    seg = (base.join(mom.select("g", "nl", "m", "sd"), "g")
           .withColumn("seg", F.expr(
               f"CAST(((i - 1) * {int(n_segments)}) div nl AS INT)"))
           .groupBy("g", "seg").agg(
               F.first("m").alias("m"), F.first("sd").alias("sd"),
               (F.sum("v") / F.count(F.lit(1))).alias("pm")))
    letter = (F.when(F.col("pm") < F.col("m") - F.col("sd") / 2, "a")
              .when(F.col("pm") < F.col("m"), "b")
              .when(F.col("pm") < F.col("m") + F.col("sd") / 2, "c")
              .otherwise("d"))
    out = (seg.withColumn("L", letter)
           .groupBy("g").agg(
               F.concat_ws("", F.array_sort(
                   F.collect_list(F.struct("seg", "L"))).getField("L"))
               .alias("sax_word"),
               F.count(F.lit(1)).cast("bigint").alias("n_segments")))
    return (out.select(F.col("g").alias(group_col), "n_segments",
                       "sax_word")
            .orderBy(group_col))


def hurst_rs(df: DataFrame, group_col: str, order_cols: list[str],
             value_col: str, *, sizes: tuple = (8, 16, 32),
             round_to: int = 6) -> DataFrame:
    """Hurst exponent per group by classic rescaled-range analysis
    (Hurst 1951; Mandelbrot & Wallis 1969): for each window size w,
    split the ordered series into full blocks of w, compute each
    block's R/S = (max cumdev - min cumdev) / population sd, average
    over blocks, then H = OLS slope of ln(avg R/S) on ln(w). H ~ 0.5
    for iid noise, > 0.5 persistent (the level-shift fixture), < 0.5
    anti-persistent.

    Float parity: integer values make block sums/cumsums EXACT, so
    block mean, variance (ss/w - mean^2 — the one-pass form, chosen
    because a per-row (v-mean)^2 re-aggregation would reintroduce
    sum-order noise), every cumulative deviation, and R are
    bit-identical across engines; only the per-(group,size) block
    average and the final ln-slope accumulate 1-ulp noise (6 dp).

    Scale shape: rows explode x len(sizes); one (g,size,block)
    groupBy for moments, one same-key cumsum window, one
    (g,size,block) max/min groupBy, then O(groups x sizes) algebra.
    All shuffles share the (g,size,block) key family."""
    g = F.col(group_col).alias("g")
    v = F.col(value_col).cast("double")
    w = Window.partitionBy("g").orderBy(*order_cols)
    base = (df.select(g, v.alias("v"), *[F.col(c) for c in order_cols])
            .withColumn("i", F.row_number().over(w))
            .withColumn("size", F.explode(F.array(
                *[F.lit(int(s)) for s in sizes])))
            .withColumn("blk", F.expr("CAST((i - 1) div size AS INT)")))
    mom = (base.groupBy("g", "size", "blk").agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"))
        .filter(F.col("nb") == F.col("size"))
        .withColumn("mean", F.col("s") / F.col("size").cast("double"))
        .withColumn("sd", F.sqrt(
            F.col("ss") / F.col("size").cast("double")
            - (F.col("s") / F.col("size").cast("double"))
            * (F.col("s") / F.col("size").cast("double")))))
    wc = (Window.partitionBy("g", "size", "blk").orderBy(*order_cols)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (base.withColumn("t", F.row_number().over(
        Window.partitionBy("g", "size", "blk").orderBy(*order_cols)))
        .withColumn("cs", F.sum("v").over(wc))
        .join(mom.select("g", "size", "blk", "mean", "sd"),
              ["g", "size", "blk"])
        .withColumn("z", F.col("cs") - F.col("t") * F.col("mean")))
    rs = (cum.groupBy("g", "size", "blk").agg(
        F.first("sd").alias("sd"),
        (F.max("z") - F.min("z")).alias("r"))
        .filter(F.col("sd") > 0)
        .withColumn("rs", F.col("r") / F.col("sd")))
    pts = (rs.groupBy("g", "size").agg(
        F.avg("rs").alias("avg_rs"),
        F.count(F.lit(1)).alias("n_blocks"))
        .withColumn("x", F.log(F.col("size").cast("double")))
        .withColumn("y", F.log("avg_rs")))
    out = (pts.groupBy("g").agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum("n_blocks").cast("bigint").alias("n_blocks"))
        .select(F.col("g").alias(group_col), "n_blocks",
                F.round((F.col("k") * F.col("sxy")
                         - F.col("sx") * F.col("sy"))
                        / (F.col("k") * F.col("sxx")
                           - F.col("sx") * F.col("sx")), round_to)
                .alias("hurst")))
    return out.orderBy(group_col)


def permutation_entropy(df: DataFrame, group_col: str,
                        order_cols: list[str], value_col: str, *,
                        round_to: int = 6) -> DataFrame:
    """Permutation entropy of order 3 per group (Bandt & Pompe 2002):
    slide a 3-window over the ordered series, map each triple to its
    ordinal pattern — the positions 1..3 sorted by (value, position),
    position breaking ties so the pattern is deterministic for
    integer-valued series — and take Shannon entropy (nats) of the
    pattern distribution. Low PE = regular dynamics, ln 6 = white
    noise.

    Scale shape: two lead() calls on one per-group window, a
    JVM-side array_sort of a 3-element struct array (no Python), one
    (g, pattern) count groupBy, one per-group entropy fold over <= 6
    rows."""
    g = F.col(group_col).alias("g")
    v = F.col(value_col).cast("double")
    w = Window.partitionBy("g").orderBy(*order_cols)
    base = (df.select(g, v.alias("v"),
                      *[F.col(c) for c in order_cols])
            .withColumn("v2", F.lead("v", 1).over(w))
            .withColumn("v3", F.lead("v", 2).over(w))
            .filter(F.col("v3").isNotNull()))
    pat = F.concat_ws("", F.array_sort(F.array(
        F.struct(F.col("v").alias("a"), F.lit(1).alias("p")),
        F.struct(F.col("v2").alias("a"), F.lit(2).alias("p")),
        F.struct(F.col("v3").alias("a"), F.lit(3).alias("p"))))
        .getField("p"))
    cnt = (base.select("g", pat.alias("pattern"))
           .groupBy("g", "pattern").agg(F.count(F.lit(1)).alias("c")))
    tot = cnt.groupBy("g").agg(F.sum("c").alias("n"))
    out = (cnt.join(tot, "g")
           .groupBy("g").agg(
               F.first("n").cast("bigint").alias("n_windows"),
               F.count(F.lit(1)).cast("bigint").alias("n_patterns"),
               (-F.sum((F.col("c") / F.col("n"))
                       * F.log(F.col("c") / F.col("n"))))
               .alias("pe"))
           .select(F.col("g").alias(group_col), "n_windows",
                   "n_patterns",
                   F.round("pe", round_to).alias("perm_entropy")))
    return out.orderBy(group_col)


def lis_length(df: DataFrame, group_col: str, order_cols: list[str],
               value_col: str) -> DataFrame:
    """Longest strictly-increasing subsequence length per group via
    patience sorting (the O(n log n) pile-tops invariant, run as an
    ordered fold): for each value replace the first pile top >= x
    (keeping tops sorted) or start a new pile; the pile count IS the
    LIS length. Pure integer algebra — exact parity; the oracle
    replays the identical fold in a DuckDB list accumulator.

    Scale shape: the session-fold contract — one collect_list bounded
    by per-key stream length, one JVM-side aggregate(); the linear
    scan for the insertion point is over the pile-tops array
    (<= LIS length), never the stream."""
    row = F.struct(*[F.col(c) for c in order_cols],
                   F.col(value_col).cast("bigint").alias("val"))
    per = (df.groupBy(F.col(group_col).alias("k"))
           .agg(F.array_sort(F.collect_list(row)).alias("rows"))
           .withColumn("vs", F.col("rows").getField("val"))
           .drop("rows"))
    fold = F.expr("""
        aggregate(
          vs,
          CAST(array() AS ARRAY<BIGINT>),
          (acc, x) -> CASE
            WHEN size(filter(acc, t -> t < x)) = size(acc)
            THEN concat(acc, array(x))
            ELSE concat(
              slice(acc, 1, size(filter(acc, t -> t < x))),
              array(x),
              slice(acc, size(filter(acc, t -> t < x)) + 2,
                    size(acc) - size(filter(acc, t -> t < x)) - 1))
          END,
          acc -> size(acc))
    """)
    return (per.select(F.col("k").alias(group_col),
                       F.size("vs").cast("bigint").alias("n_events"),
                       fold.cast("bigint").alias("lis_len"))
            .orderBy(group_col))


def haar_energy(df: DataFrame, group_col: str, order_cols: list[str],
                value_col: str, *, length: int = 32) -> DataFrame:
    """Haar wavelet energy decomposition of each group's first
    ``length`` (a power of two) ordered values: recursively split
    into pairwise averages (a) and differences (d), both halved —
    energy at level L = sum of squared detail coefficients there,
    plus the final approximation coefficient. The multi-resolution
    screen: a level-shift series concentrates energy in the coarse
    levels, white noise spreads it flat.

    Float parity is EXACT, not rounded: integer inputs make every
    coefficient a dyadic rational with denominator <= 2^levels, so
    sums of squares are exact multiples of 4^-levels and no
    accumulation order can perturb them.

    Scale shape: one bounded collect_list per group (session-fold
    contract), then a fully unrolled JVM expression cascade — zero
    joins, zero windows, zero Python."""
    levels = 0
    n = length
    while n > 1:
        assert n % 2 == 0, "length must be a power of two"
        n //= 2
        levels += 1
    row = F.struct(*[F.col(c) for c in order_cols],
                   F.col(value_col).cast("double").alias("val"))
    per = (df.groupBy(F.col(group_col).alias("k"))
           .agg(F.array_sort(F.collect_list(row)).alias("rows"))
           .withColumn("a0", F.expr(
               f"slice(transform(rows, r -> r.val), 1, {length})"))
           .filter(F.size("a0") == length)
           .drop("rows"))
    cur = "a0"
    out_cols = []
    for lv in range(1, levels + 1):
        half = length >> lv
        per = per.withColumn(f"d{lv}", F.expr(
            f"transform(sequence(1, {half}), i ->"
            f" ({cur}[2*i - 2] - {cur}[2*i - 1]) / 2)"))
        per = per.withColumn(f"a{lv}", F.expr(
            f"transform(sequence(1, {half}), i ->"
            f" ({cur}[2*i - 2] + {cur}[2*i - 1]) / 2)"))
        per = per.withColumn(f"e{lv}", F.expr(
            f"aggregate(d{lv}, CAST(0.0 AS DOUBLE),"
            f" (s, x) -> s + x * x)"))
        out_cols.append(f"e{lv}")
        cur = f"a{lv}"
    return (per.select(F.col("k").alias(group_col),
                       *[F.col(c).alias(c) for c in out_cols],
                       F.expr(f"{cur}[0]").alias("approx"))
            .orderBy(group_col))


def huffman_cost(df: DataFrame, group_col: str,
                 symbol_col: str, *, round_to: int = 6) -> DataFrame:
    """Optimal prefix-code (Huffman 1952) total cost per group over
    the observed symbol distribution, via the classic two-smallest
    merge run as a fold: total encoded bits = sum of every merged
    node's weight (all Huffman trees are cost-optimal, and both
    engines replay the IDENTICAL merge order anyway, ties included).
    Reported next to the Shannon bound sum c*log2(n/c) — the
    compressibility audit pair.

    Scale shape: one (g, symbol) count groupBy, one collect of
    O(alphabet) weights per group, one JVM fold of alphabet-1 merges
    (each a sort of the <= alphabet-sized weight array)."""
    cnt = (df.groupBy(F.col(group_col).alias("g"),
                      F.col(symbol_col).alias("sym"))
           .agg(F.count(F.lit(1)).alias("c")))
    per = (cnt.groupBy("g").agg(
        F.array_sort(F.collect_list("c")).alias("ws"),
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_symbols"),
        F.sum(F.col("c").cast("double")
              * F.log2(F.col("c").cast("double"))).alias("clogc")))
    fold = F.expr("""
        IF(size(ws) < 2, CAST(0 AS BIGINT), aggregate(
          sequence(1, size(ws) - 1),
          named_struct('a', ws, 'cost', CAST(0 AS BIGINT)),
          (s, i) -> named_struct(
            'a', array_sort(concat(
                   slice(s.a, 3, size(s.a) - 2),
                   array(s.a[0] + s.a[1]))),
            'cost', s.cost + s.a[0] + s.a[1]),
          s -> s.cost))
    """)
    ent = (F.col("n").cast("double")
           * F.log2(F.col("n").cast("double")) - F.col("clogc"))
    return (per.select(
        F.col("g").alias(group_col),
        F.col("n").cast("bigint").alias("n_total"),
        F.col("n_symbols").cast("bigint").alias("n_symbols"),
        fold.alias("huffman_bits"),
        F.round(ent, round_to).alias("entropy_bits"))
        .orderBy(group_col))


def matrix_profile_ed(series: DataFrame, group_col: str, seq_col: str,
                      value_col: str, m: int = 4) -> DataFrame:
    """Matrix-profile motif + discord discovery per group (Yeh et al.
    2016, the ICDM matrix-profile paper) under EXACT squared Euclidean
    distance on integer series: for every length-m subsequence, the
    profile value is the min distance to any non-trivial match
    (|i - j| >= m exclusion zone); the MOTIF is the globally closest
    pair, the DISCORD the subsequence with the largest profile value.
    Integer distances make every comparison exact; ties break to the
    smallest (d2, i, j).

    Scale shape: subsequences come from m-1 LEAD columns over the
    per-group window (no collect); the candidate pairs are a per-group
    self-join bounded by the per-group series length (n^2 pairs INSIDE
    a group, never across groups — cap n upstream for long series or
    switch to the STOMP recurrence); the profile is one hash aggregate
    and motif/discord are per-group argmins over bounded windows.
    Returns (group, n_subs, motif_i, motif_j, motif_d2, discord_i,
    discord_d2)."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(seq_col)
    v = F.col(value_col).cast("bigint")
    cols = [v.alias("v0")] + [F.lead(v, k).over(w).alias(f"v{k}")
                              for k in range(1, m)]
    subs = (series.select(F.col(group_col).alias("g"),
                          F.row_number().over(w).alias("i"), *cols)
            .filter(F.col(f"v{m - 1}").isNotNull()))
    a = subs.alias("a")
    b = subs.alias("b")
    d2 = sum((F.col(f"a.v{k}") - F.col(f"b.v{k}"))
             * (F.col(f"a.v{k}") - F.col(f"b.v{k}")) for k in range(m))
    pairs = (a.join(b, (F.col("a.g") == F.col("b.g"))
                    & (F.abs(F.col("a.i") - F.col("b.i")) >= m))
             .select(F.col("a.g").alias("g"), F.col("a.i").alias("i"),
                     F.col("b.i").alias("j"),
                     d2.cast("bigint").alias("d2")))
    profile = (pairs.groupBy("g", "i")
               .agg(F.min(F.struct("d2", "j")).alias("p"))
               .select("g", "i", F.col("p.d2").alias("pd2")))
    wd = Window.partitionBy("g").orderBy(F.col("pd2").desc(),
                                         F.col("i").asc())
    discord = (profile.withColumn("rn", F.row_number().over(wd))
               .filter(F.col("rn") == 1)
               .select("g", F.col("i").alias("discord_i"),
                       F.col("pd2").alias("discord_d2")))
    wm = Window.partitionBy("g").orderBy("d2", "i", "j")
    motif = (pairs.filter(F.col("i") < F.col("j"))
             .withColumn("rn", F.row_number().over(wm))
             .filter(F.col("rn") == 1)
             .select("g", F.col("i").alias("motif_i"),
                     F.col("j").alias("motif_j"),
                     F.col("d2").alias("motif_d2")))
    nsubs = subs.groupBy("g").agg(F.count("*").cast("bigint")
                                  .alias("n_subs"))
    return (nsubs.join(motif, "g").join(discord, "g")
            .select(F.col("g").alias(group_col), "n_subs",
                    "motif_i", "motif_j", "motif_d2",
                    "discord_i", "discord_d2")
            .orderBy(group_col))


def page_hinkley(series: DataFrame, group_col: str, seq_col: str,
                 value_col: str, *, delta: float = 0.5,
                 lam: float = 20.0) -> DataFrame:
    """Page-Hinkley mean-increase drift detection per group (Page
    1954; the streaming-drift baseline in MOA/river): with running
    mean x̄_t INCLUDING the current point, m_t = m_{t-1} +
    (x_t - x̄_t - delta), M_t = min m, alarm at the first t where
    m_t - M_t > lambda.  The fold runs in one fixed order per group
    (seq ascending), so every double is bit-identical across engines
    and topologies.  Returns (group, n, ph_final, max_dev,
    first_alarm) — first_alarm 0 when no alarm fired.

    Ref parity: the reference flags communes whose matched-address
    counts drift between runs (munin bano_rapproche thresholds);
    Page-Hinkley is the sequential version with a false-alarm bound.

    Scale shape: session-fold contract — one shuffle to the group,
    one bounded collect, O(1) fold state, no Python."""
    row = F.struct(F.col(seq_col).cast("bigint").alias("o"),
                   F.col(value_col).cast("double").alias("x"))
    per = (series.groupBy(F.col(group_col).alias("g"))
           .agg(F.array_sort(F.collect_list(row)).alias("xs")))
    fold = F.expr(f"""
        aggregate(
          xs,
          named_struct('s', CAST(0.0 AS DOUBLE), 't', CAST(0 AS BIGINT),
                       'm', CAST(0.0 AS DOUBLE),
                       'mn', CAST(0.0 AS DOUBLE),
                       'mx', CAST(0.0 AS DOUBLE),
                       'al', CAST(0 AS BIGINT)),
          (acc, r) -> aggregate(
            array(named_struct(
              's', acc.s + r.x, 't', acc.t + 1,
              'm', acc.m + (r.x - (acc.s + r.x) / (acc.t + 1)
                            - CAST({delta} AS DOUBLE)))),
            acc,
            (a, u) -> named_struct(
              's', u.s, 't', u.t, 'm', u.m,
              'mn', least(a.mn, u.m),
              'mx', greatest(a.mx, u.m - least(a.mn, u.m)),
              'al', IF(a.al > 0, a.al,
                       IF(u.m - least(a.mn, u.m)
                            > CAST({lam} AS DOUBLE), u.t,
                          CAST(0 AS BIGINT)))),
            a -> a),
          acc -> acc)
    """)
    return (per.select(F.col("g").alias(group_col),
                       F.size("xs").cast("bigint").alias("n"),
                       fold.alias("st"))
            .select(group_col, "n",
                    (F.round(F.col("st.m"), 6) + F.lit(0.0))
                    .alias("ph_final"),
                    (F.round(F.col("st.mx"), 6) + F.lit(0.0))
                    .alias("max_dev"),
                    F.col("st.al").alias("first_alarm"))
            .orderBy(group_col))
