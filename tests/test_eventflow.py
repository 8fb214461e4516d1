"""Unit tests: SCD2, CDC apply, funnel, retention — vs brute force."""

import datetime as dt

from pyspark.sql import functions as F

T0 = dt.datetime(2024, 1, 1)


def _ts(h):
    return T0 + dt.timedelta(hours=h)


def test_scd2_merges_consecutive_duplicates(spark):
    from bano_spark.operators.eventflow import scd2_intervals

    rows = [(1, _ts(0), "a", 1), (1, _ts(1), "a", 2), (1, _ts(2), "b", 3),
            (1, _ts(3), "a", 4), (2, _ts(0), "x", 5)]
    df = spark.createDataFrame(
        rows, "k int, ts timestamp, attr string, eid int")
    out = sorted(
        ((r["k"], r["attr"], r["valid_from"], r["valid_to"])
         for r in scd2_intervals(df, key="k", ts="ts", attr="attr",
                                 tiebreak="eid").collect()))
    assert out == [
        (1, "a", _ts(0), _ts(2)),   # the h1 duplicate merged in
        (1, "a", _ts(3), None),     # value returned -> NEW interval
        (1, "b", _ts(2), _ts(3)),
        (2, "x", _ts(0), None),
    ]


def test_cdc_apply_delete_wins_and_latest_value(spark):
    from bano_spark.operators.eventflow import cdc_apply

    rows = [(1, _ts(0), 1, "U", 10.0), (1, _ts(1), 2, "U", 20.0),
            (2, _ts(0), 3, "U", 5.0), (2, _ts(1), 4, "D", 0.0),
            (3, _ts(0), 5, "D", 0.0), (3, _ts(1), 6, "U", 7.0),
            # same ts: higher tiebreak wins
            (4, _ts(0), 7, "U", 1.0), (4, _ts(0), 8, "D", 0.0)]
    df = spark.createDataFrame(
        rows, "k int, ts timestamp, eid int, op string, v double")
    out = {r["k"]: r["v"]
           for r in cdc_apply(df, key="k", ts="ts", tiebreak="eid",
                              op_col="op", value_cols=["v"]).collect()}
    assert out == {1: 20.0, 3: 7.0}  # 2 and 4 deleted


def test_funnel_strict_order(spark):
    from bano_spark.operators.eventflow import funnel_stages

    rows = [
        # user 1 completes in order
        (1, "view", _ts(0)), (1, "click", _ts(1)), (1, "purchase", _ts(2)),
        # user 2: click BEFORE the first view -> breaks at stage 2
        (2, "click", _ts(0)), (2, "view", _ts(1)), (2, "purchase", _ts(2)),
        # user 3: no purchase
        (3, "view", _ts(0)), (3, "click", _ts(1)),
        # user 4 never views -> absent from output
        (4, "click", _ts(0)),
    ]
    df = spark.createDataFrame(rows, "k int, event_type string, ts timestamp")
    out = {r["k"]: (r["t1"], r["t2"], r["t3"])
           for r in funnel_stages(df, ["view", "click", "purchase"],
                                  key="k", ts="ts").collect()}
    assert set(out) == {1, 2, 3}
    assert out[1] == (_ts(0), _ts(1), _ts(2))
    assert out[2] == (_ts(1), None, None)
    assert out[3] == (_ts(0), _ts(1), None)


def test_retention_offsets(spark):
    from bano_spark.operators.eventflow import retention_cohorts

    def wk(n, d=0):
        return dt.datetime(2024, 1, 1 + 7 * n + d)  # 2024-01-01 is a Monday

    rows = [(1, wk(0)), (1, wk(0, 3)), (1, wk(1)), (1, wk(3)),
            (2, wk(0)), (2, wk(1)),
            (3, wk(1))]
    df = spark.createDataFrame(rows, "k int, ts timestamp")
    out = {(str(r["cohort"]), r["period_offset"]): r["n_active"]
           for r in retention_cohorts(df, key="k", ts="ts").collect()}
    assert out == {
        ("2024-01-01", 0): 2, ("2024-01-01", 1): 2, ("2024-01-01", 3): 1,
        ("2024-01-08", 0): 1,
    }


def test_eventflow_random_logs_vs_bruteforce(spark):
    """One randomized 800-event log across 25 keys (duplicate
    timestamps included) checked against independent brute-force
    implementations of all three changelog operators."""
    import numpy as np

    from bano_spark.operators.eventflow import (cdc_apply, funnel_stages,
                                                scd2_intervals)

    rng = np.random.default_rng(17)
    types = ["view", "click", "purchase", "error"]
    rows = []
    for eid in range(800):
        rows.append((int(rng.integers(0, 25)),
                     _ts(int(rng.integers(0, 50))),  # heavy ts ties
                     eid, types[int(rng.integers(0, 4))],
                     float(rng.integers(1, 100))))
    df = spark.createDataFrame(
        rows, "k int, ts timestamp, event_id int, event_type string, v double")
    by_key = {}
    for k, ts, eid, et, v in rows:
        by_key.setdefault(k, []).append((ts, eid, et, v))
    for k in by_key:
        by_key[k].sort()

    # --- SCD2 ---
    skey = lambda t: (t[0], t[1], t[2], t[3] or dt.datetime.max)
    got = sorted(((r["k"], r["event_type"], r["valid_from"], r["valid_to"])
                  for r in scd2_intervals(df, key="k", ts="ts",
                                          attr="event_type",
                                          tiebreak="event_id").collect()),
                 key=skey)
    want = []
    for k, seq in by_key.items():
        changes = [s for i, s in enumerate(seq)
                   if i == 0 or s[2] != seq[i - 1][2]]
        for i, c in enumerate(changes):
            nxt = changes[i + 1][0] if i + 1 < len(changes) else None
            want.append((k, c[2], c[0], nxt))
    assert got == sorted(want, key=skey)

    # --- CDC (error = delete) ---
    got_cdc = {r["k"]: r["v"]
               for r in cdc_apply(
                   df.withColumn("op", F.when(
                       F.col("event_type") == "error", "D").otherwise("U")),
                   key="k", ts="ts", tiebreak="event_id",
                   op_col="op", value_cols=["v"]).collect()}
    want_cdc = {}
    for k, seq in by_key.items():
        last = seq[-1]
        if last[2] != "error":
            want_cdc[k] = last[3]
    assert got_cdc == want_cdc

    # --- funnel ---
    got_f = {r["k"]: (r["t1"], r["t2"], r["t3"])
             for r in funnel_stages(df, ["view", "click", "purchase"],
                                    key="k", ts="ts").collect()}
    want_f = {}
    for k, seq in by_key.items():
        t1 = min((s[0] for s in seq if s[2] == "view"), default=None)
        if t1 is None:
            continue
        t2 = min((s[0] for s in seq if s[2] == "click" and s[0] >= t1),
                 default=None)
        t3 = None
        if t2 is not None:
            t3 = min((s[0] for s in seq if s[2] == "purchase" and s[0] >= t2),
                     default=None)
        want_f[k] = (t1, t2, t3)
    assert got_f == want_f


def test_scd2_null_attribute_intervals(spark):
    """NULL attribute values form their own intervals and consecutive
    NULLs merge (review finding: non-null-safe comparison dropped the
    NULL period entirely)."""
    from bano_spark.operators.eventflow import scd2_intervals

    rows = [(1, _ts(0), "a", 1), (1, _ts(1), None, 2), (1, _ts(2), None, 3),
            (1, _ts(3), "b", 4), (2, _ts(0), None, 5), (2, _ts(1), None, 6)]
    df = spark.createDataFrame(
        rows, "k int, ts timestamp, attr string, eid int")
    out = sorted(((r["k"], r["attr"], r["valid_from"], r["valid_to"])
                  for r in scd2_intervals(df, key="k", ts="ts", attr="attr",
                                          tiebreak="eid").collect()),
                 key=lambda t: (t[0], t[2]))
    assert out == [
        (1, "a", _ts(0), _ts(1)),
        (1, None, _ts(1), _ts(3)),   # NULL period kept, dups merged
        (1, "b", _ts(3), None),
        (2, None, _ts(0), None),     # all-NULL key -> one open interval
    ]


def test_retention_rejects_unsupported_period(spark):
    import pytest as _pt

    from bano_spark.operators.eventflow import retention_cohorts

    df = spark.createDataFrame([(1, _ts(0))], "k int, ts timestamp")
    with _pt.raises(ValueError, match="unsupported"):
        retention_cohorts(df, key="k", ts="ts", period="month")
