"""Merge-asof join — the point-in-time-correctness primitive of
feature-store / market-data / telemetry pipelines: for every left row
match the nearest right row at-or-before (backward), at-or-after
(forward), or closest (nearest) in event time, optionally per key and
within a tolerance.

Spark has no native asof join, so the classic scalable formulation is
used: UNION the two tagged sides and take a running ``max`` of a
right-row struct over an ordered window — the struct leads with the
(direction-oriented) event time, so the running max IS the most recent
(resp. next) right row, and ``max`` skips nulls (left rows carry a
null struct) for free. No join explosion, no per-row Python:

- **keyed** (``by=[...]``): one hash exchange on the key, per-key sort
  — the same shape as any keyed window, parallel across keys.
- **keyless** (global timeline): an unpartitioned ordered window would
  funnel 100 TB through one task, so the union is RANGE-BUCKETED on
  event time (deterministic ``percentile_approx`` bounds, same recipe
  as ``selection.distributed_cumsum``), the running max runs per
  bucket in parallel, and the cross-bucket carry — the latest right
  row of every earlier bucket — is an O(buckets) driver pass
  broadcast back, exactly the two-pass prefix pattern (here a prefix
  MAX instead of a prefix sum).

Determinism under ties: among right rows sharing the match time the
one with the greatest ``right_id`` wins (the struct's second field),
in both directions — callers get a reproducible answer without
relying on input order, unlike pandas ``merge_asof``.

Ref parity: generalizes the reference's "match each address point to
the most recent FANTOIR record" temporal lookups (bano/sql/*.sql use
batch-stamped snapshots instead); the LLM-pipeline use is joining
crawl snapshots / quality scores to documents point-in-time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from bano_spark.operators.selection import _bucket_expr, _guarded


def _tagged_union(left: DataFrame, right: DataFrame, on: str,
                  value_cols: list[str], by: list[str], right_id: str,
                  sign: int) -> tuple[DataFrame, list[str]]:
    """UNION of the two sides with a shared schema: key cols, the
    direction-oriented order key ``_ot`` (sign * on), ``_side`` (right
    rows sort before left rows at equal time → inclusive match), a
    left-row struct (null on right rows) and a right-value struct
    (null on left rows) led by (_ot, right_id) so ``max`` picks the
    latest/next right row."""
    lcols = [c for c in left.columns]
    rval = F.struct(
        (F.col(on).cast("long") * sign).alias("_ot"),
        F.col(right_id).cast("long").alias("_rid"),
        F.col(on).cast("long").alias("_rt"),
        *[F.col(c).alias(c) for c in value_cols])
    r_tag = right.select(
        *[F.col(c) for c in by],
        (F.col(on).cast("long") * sign).alias("_t"),
        F.lit(0).alias("_side"),
        rval.alias("_rval"))
    lrow = F.struct(*[F.col(c).alias(c) for c in lcols])
    l_tag = left.select(
        *[F.col(c) for c in by],
        (F.col(on).cast("long") * sign).alias("_t"),
        F.lit(1).alias("_side"),
        lrow.alias("_lrow"))
    rv_type = r_tag.schema["_rval"].dataType
    lr_type = l_tag.schema["_lrow"].dataType
    u = (l_tag.withColumn("_rval", F.lit(None).cast(rv_type))
         .unionByName(r_tag.withColumn("_lrow",
                                       F.lit(None).cast(lr_type))))
    return u, lcols


def _unpack(matched: DataFrame, lcols: list[str], on: str,
            value_cols: list[str], tolerance: int | None) -> DataFrame:
    """Left rows only; apply the tolerance gate and flatten the left
    struct + matched right fields into output columns."""
    out = matched.filter(F.col("_side") == 1)
    m: Column = F.col("_m")
    if tolerance is not None:
        lt = F.col("_lrow").getField(on).cast("long")
        ok = F.abs(lt - m.getField("_rt")) <= F.lit(int(tolerance))
        out = out.withColumn("_m", F.when(ok, m))
        m = F.col("_m")
    sel = [F.col("_lrow").getField(c).alias(c) for c in lcols]
    sel.append(m.getField("_rt").alias(f"{on}_asof"))
    sel += [m.getField(c).alias(f"{c}_asof") for c in value_cols]
    return out.select(*sel)


def merge_asof(left: DataFrame, right: DataFrame, on: str,
               value_cols: list[str], right_id: str,
               by: list[str] | None = None,
               direction: str = "backward",
               tolerance: int | None = None,
               num_buckets: int | None = None) -> DataFrame:
    """LEFT asof join: every left row, plus ``{on}_asof`` (matched
    right event time) and ``{c}_asof`` for each value column — null
    when no right row qualifies. ``on`` must be numeric (cast to
    long); ``right_id`` a unique right key for deterministic ties.
    ``direction``: 'backward' (right.on <= left.on, nearest) or
    'forward' (right.on >= left.on, nearest); see
    :func:`merge_asof_nearest` for 'nearest'."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction {direction!r}: use merge_asof_nearest")
    sign = 1 if direction == "backward" else -1
    by = list(by or [])
    u, lcols = _tagged_union(left, right, on, value_cols, by,
                             right_id, sign)
    if by:
        w = (Window.partitionBy(*by).orderBy("_t", "_side")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        matched = u.withColumn("_m", F.max("_rval").over(w))
        return _unpack(matched, lcols, on, value_cols, tolerance)

    # Keyless: range-bucket the timeline, run the running max per
    # bucket, carry the per-bucket right maxima forward on the driver
    # (O(buckets) rows), broadcast back.
    n = int(num_buckets or left.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"))
    qs = [i / n for i in range(1, n)]
    row = u.select(F.percentile_approx("_t", qs, 10000).alias("b")).first()
    bounds = sorted(set(row["b"] or []))
    bucketed = u.withColumn(
        "_pid", _bucket_expr(_guarded(F.col("_t"), "asof time"),
                             bounds, False))
    w = (Window.partitionBy("_pid").orderBy("_t", "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = bucketed.withColumn("_lm", F.max("_rval").over(w))
    # one row per bucket that contains right rows — tiny driver pass
    tops = (bucketed.filter(F.col("_side") == 0)
            .groupBy("_pid").agg(F.max("_rval").alias("_top"))
            .collect())
    rv_type = bucketed.schema["_rval"].dataType
    # seed for bucket p = max right struct over all buckets < p;
    # O(buckets^2) with buckets <= shuffle partitions — driver-trivial
    seeds = [(p, _carry_at(tops, p)) for p in range(len(bounds) + 1)]
    spark = left.sparkSession
    from pyspark.sql.types import LongType, StructField, StructType
    seed_schema = StructType([StructField("_pid", LongType(), False),
                              StructField("_seed", rv_type, True)])
    seed_df = spark.createDataFrame(
        [(int(p), s) for p, s in seeds], seed_schema)
    merged = (local.join(F.broadcast(seed_df), "_pid", "left")
              .withColumn("_m", F.greatest("_lm", "_seed")))
    return _unpack(merged, lcols, on, value_cols, tolerance)


def _carry_at(tops, pid: int):
    """Max right struct over all buckets strictly before `pid` (used
    for buckets that contain no right rows and were skipped by the
    streaming carry)."""
    best = None
    for r in tops:
        if r["_pid"] < pid:
            top = r["_top"]
            if top is not None and (best is None
                                    or (top["_ot"], top["_rid"])
                                    > (best["_ot"], best["_rid"])):
                best = top
    return best


def merge_asof_nearest(left: DataFrame, right: DataFrame, on: str,
                       value_cols: list[str], right_id: str,
                       left_id: str, by: list[str] | None = None,
                       tolerance: int | None = None,
                       num_buckets: int | None = None) -> DataFrame:
    """Nearest-in-time asof: backward and forward passes joined on the
    unique ``left_id``; the closer match wins, exact-distance ties go
    backward (then the backward pass's own max-id rule applies). Two
    parallel scans, one broadcast-free equi-join on the unique id."""
    bwd = merge_asof(left, right, on, value_cols, right_id, by=by,
                     direction="backward", tolerance=tolerance,
                     num_buckets=num_buckets)
    fsel = [F.col(left_id), F.col(f"{on}_asof").alias("_f_t")]
    fsel += [F.col(f"{c}_asof").alias(f"_f_{c}") for c in value_cols]
    fwd = merge_asof(left, right, on, value_cols, right_id, by=by,
                     direction="forward", tolerance=tolerance,
                     num_buckets=num_buckets).select(*fsel)
    j = bwd.join(fwd, left_id, "left")
    lt = F.col(on).cast("long")
    bt, ft = F.col(f"{on}_asof"), F.col("_f_t")
    # materialize the choice BEFORE overwriting {on}_asof — the when()
    # below must not re-resolve against the overwritten column
    out = j.withColumn(
        "_use_fwd",
        (bt.isNull() & ft.isNotNull()) | (
            bt.isNotNull() & ft.isNotNull()
            & (F.abs(ft - lt) < F.abs(lt - bt))))
    out = out.withColumn(f"{on}_asof",
                         F.when(F.col("_use_fwd"), ft).otherwise(bt))
    for c in value_cols:
        out = out.withColumn(
            f"{c}_asof",
            F.when(F.col("_use_fwd"), F.col(f"_f_{c}"))
            .otherwise(F.col(f"{c}_asof")))
    return out.drop("_use_fwd", "_f_t",
                    *[f"_f_{c}" for c in value_cols])
