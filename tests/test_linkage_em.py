"""Kernel tests for wave 131: fs_em_fit vs a step-by-step python EM
on the same pattern counts; posterior monotonicity and decision
sanity; validation."""

from __future__ import annotations

import pytest

from bano_spark.operators.linkage_em import fs_em_fit, fs_em_posteriors

_M31 = 2147483648


def _pairs(n=3000):
    out = []
    for i in range(n):
        u0 = (i * 2654435761 + 13) % _M31
        ua = (i * 1103515245 + 12345) % _M31
        ub = (i * 69069 + 7) % _M31
        uc = (i * 48271 + 3) % _M31
        m = u0 % 4 == 0
        out.append((1 if ua % 20 < (19 if m else 1) else 0,
                    1 if ub % 20 < (18 if m else 1) else 0,
                    1 if uc % 20 < (19 if m else 2) else 0))
    return out


def _em_ref(pairs, iters=3):
    cnt = [0] * 8
    for g1, g2, g3 in pairs:
        cnt[g1 + 2 * g2 + 4 * g3] += 1
    p, mm, uu = 0.5, [0.8] * 3, [0.2] * 3
    for _ in range(iters):
        w = [0.0] * 8
        for g in range(8):
            a, b = p, 1 - p
            for k in range(3):
                a *= mm[k] if (g >> k) & 1 else 1 - mm[k]
                b *= uu[k] if (g >> k) & 1 else 1 - uu[k]
            w[g] = a / (a + b)
        tot = sum(cnt)
        ws = sum(cnt[g] * w[g] for g in range(8))
        p = ws / tot
        for k in range(3):
            on = [g for g in range(8) if (g >> k) & 1]
            mm[k] = sum(cnt[g] * w[g] for g in on) / ws
            uu[k] = sum(cnt[g] * (1 - w[g]) for g in on) / (tot - ws)
    return p, mm, uu


def test_em_vs_reference(spark):
    pairs = _pairs()
    df = spark.createDataFrame(pairs, "g1: int, g2: int, g3: int")
    row = fs_em_fit(df, ["g1", "g2", "g3"], iters=3).collect()[0]
    p, mm, uu = _em_ref(pairs, 3)
    assert row["lambda_match"] == pytest.approx(p, abs=1e-6)
    for k in range(3):
        assert row[f"m{k + 1}"] == pytest.approx(mm[k], abs=1e-6)
        assert row[f"u{k + 1}"] == pytest.approx(uu[k], abs=1e-6)
    # planted structure recovered: matches ~25%, m >> u on every field
    assert 0.15 < row["lambda_match"] < 0.35
    for k in range(3):
        assert row[f"m{k + 1}"] > 0.7 > 0.2 > row[f"u{k + 1}"]


def test_posteriors_monotone_in_agreement(spark):
    pairs = _pairs()
    df = spark.createDataFrame(pairs, "g1: int, g2: int, g3: int")
    rows = {(r["g1"], r["g2"], r["g3"]): r for r in
            fs_em_posteriors(df, ["g1", "g2", "g3"], iters=3).collect()}
    assert len(rows) == 8
    # adding an agreement never lowers the posterior (m_k > u_k)
    for g1, g2, g3 in [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
                       (1, 1, 0), (1, 0, 1), (0, 1, 1)]:
        for k, up in enumerate([(1, g2, g3), (g1, 1, g3), (g1, g2, 1)]):
            if (g1, g2, g3)[k] == 0:
                assert rows[up]["posterior"] > \
                    rows[(g1, g2, g3)]["posterior"]
    assert rows[(1, 1, 1)]["is_match"]
    assert not rows[(0, 0, 0)]["is_match"]
    assert sum(r["n"] for r in rows.values()) == len(pairs)


def test_field_count_validation(spark):
    df = spark.createDataFrame([(1, 1)], "g1: int, g2: int")
    with pytest.raises(ValueError):
        fs_em_fit(df, ["g1", "g2"])
