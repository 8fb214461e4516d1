"""Kernel tests for wave 151: burn-rate math vs hand computation,
multiwindow precision (hot short window alone must NOT page), and
budget accounting."""

from __future__ import annotations

import pytest

from bano_spark.operators.slo import burn_rate_alerts, error_budget_report


def _df(spark, errs):
    return spark.createDataFrame(
        [(i, "t", e) for i, e in enumerate(errs)],
        "id: bigint, event_type: string, err: int")


def test_burn_rates_vs_hand(spark):
    # 1000 events: long bucket 0; short buckets 0..4
    errs = [1 if (i % 200 < 40 and i < 200) else 0 for i in range(1000)]
    rows = {r["short_bucket"]: r for r in
            burn_rate_alerts(_df(spark, errs), "id", "err",
                             short_w=200, long_w=1000).collect()}
    # short bucket 0: 40/200 = 0.2 -> burn 20 ; long: 40/1000 -> burn 4
    assert rows[0]["burn_short"] == pytest.approx(
        0.2 / (1 - 0.99), rel=1e-9)
    assert rows[0]["burn_long"] == pytest.approx(
        0.04 / (1 - 0.99), rel=1e-9)
    # fast window hot (20 > 14.4) but slow cold (4 < 6): NO page —
    # the multiwindow rule's precision property
    assert not rows[0]["page"]
    assert not any(r["page"] for r in rows.values())


def test_sustained_incident_pages(spark):
    errs = [1 if i % 5 == 0 else 0 for i in range(1000)]  # 20% all
    rows = burn_rate_alerts(_df(spark, errs), "id", "err",
                            short_w=200, long_w=1000).collect()
    assert all(r["page"] for r in rows)


def test_budget_report(spark):
    errs = ([1] * 5 + [0] * 495) * 2  # 1% exactly
    row = error_budget_report(_df(spark, errs), "event_type",
                              "err").collect()[0]
    assert row["errors"] == 10 and row["n"] == 1000
    assert row["budget_used"] == pytest.approx(1.0, rel=1e-9)
    assert row["budget_left_frac"] == pytest.approx(0.0, abs=1e-9)


def test_non_multiple_windows_rejected(spark):
    # long_w must be a multiple of short_w: otherwise a short bucket
    # straddles two long buckets and the short_bucket-only sort is
    # nondeterministic (ADVICE r4, slo.py)
    with pytest.raises(ValueError, match="multiple of short_w"):
        burn_rate_alerts(_df(spark, [0, 1]), "id", "err",
                         short_w=300, long_w=1000)
