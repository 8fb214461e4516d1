"""Kernel tests for wave 86: item-item cosine top-k and weighted
Slope One vs exact-fraction Python replays."""

from __future__ import annotations

from fractions import Fraction

import pytest

from bano_spark.operators.recsys import item_cosine_topk, slope_one_predict


@pytest.fixture(scope="module")
def ratings(spark):
    import hashlib
    rows = []
    for u in range(20):
        seen = {}
        for e in range(15):
            h = int(hashlib.md5(f"{u}|{e}".encode()).hexdigest()[:12], 16)
            item, rat = h % 8, 1 + (h // 8) % 5
            seen[item] = max(seen.get(item, 0), rat)
        rows += [(u, i, r) for i, r in seen.items()]
    return rows, spark.createDataFrame(
        rows, "user_id long, item long, rating long")


def test_item_cosine_topk_matches_bruteforce(ratings):
    rows, df = ratings
    got = item_cosine_topk(df, "user_id", "item", "rating", k=3).collect()
    by_user = {}
    for u, i, r in rows:
        by_user.setdefault(u, {})[i] = r
    items = sorted({i for _, i, _ in rows})
    ss = {i: sum(m[i] * m[i] for m in by_user.values() if i in m)
          for i in items}
    for i in items:
        cands = []
        for j in items:
            if j == i:
                continue
            common = [(m[i], m[j]) for m in by_user.values()
                      if i in m and j in m]
            if not common:
                continue
            dot = sum(a * b for a, b in common)
            cands.append((-Fraction(dot * dot, ss[i] * ss[j]), j,
                          len(common)))
        cands.sort()
        mine = [r for r in got if r["item_i"] == i]
        assert len(mine) == min(3, len(cands))
        for rank, (negc2, j, nc) in enumerate(cands[:3], 1):
            row = mine[rank - 1]
            assert row["item_j"] == j and row["rank"] == rank
            assert row["n_common"] == nc
            import math
            assert row["cosine"] == round(math.sqrt(float(-negc2)), 6)


def test_slope_one_matches_bruteforce(ratings):
    rows, df = ratings
    got = slope_one_predict(df, "user_id", "item", "rating",
                            top_n=2).collect()
    by_user = {}
    for u, i, r in rows:
        by_user.setdefault(u, {})[i] = r
    items = sorted({i for _, i, _ in rows})
    dev = {}
    for j in items:
        for i in items:
            if i == j:
                continue
            common = [(m[j], m[i]) for m in by_user.values()
                      if i in m and j in m]
            if common:
                dev[(j, i)] = (sum(a - b for a, b in common), len(common))
    for u, rated in by_user.items():
        preds = []
        for j in items:
            if j in rated:
                continue
            num = den = 0
            for i, r in rated.items():
                if (j, i) in dev:
                    n, c = dev[(j, i)]
                    num += n + r * c
                    den += c
            if den:
                preds.append((-Fraction(num, den), j, den))
        preds.sort()
        mine = [r for r in got if r["user_id"] == u]
        assert len(mine) == min(2, len(preds))
        for rank, (negp, j, den) in enumerate(preds[:2], 1):
            row = mine[rank - 1]
            assert row["item"] == j and row["rank"] == rank
            assert row["n_support"] == den
            assert row["prediction"] == round(float(-negp), 6)


def test_slope_one_excludes_rated(ratings):
    rows, df = ratings
    got = slope_one_predict(df, "user_id", "item", "rating",
                            top_n=3).collect()
    rated = {(u, i) for u, i, _ in rows}
    assert all((r["user_id"], r["item"]) not in rated for r in got)
