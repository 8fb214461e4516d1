"""Kernel tests for wave 148: chunk cosine vs a numpy bag-of-words
computation, selection of the representative chunk over an outlier
chunk, and the separation rollup direction."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest

from bano_spark.operators.extractive import (extractive_topk,
                                             summary_rollup)


def _doc(spark, text, doc_id=1, source="s"):
    return spark.createDataFrame([(doc_id, text, source)],
                                 "doc_id: bigint, text: string, "
                                 "source: string")


def _ref_cos(text, chunk_words=12):
    words = text.split(" ")
    chunks = [words[i:i + chunk_words]
              for i in range(0, len(words), chunk_words)]
    dcnt = Counter(words)
    out = []
    for ci, ch in enumerate(chunks):
        c = Counter(ch)
        dot = sum(v * dcnt[t] for t, v in c.items())
        ns = sum(v * v for v in c.values())
        nd = sum(v * v for v in dcnt.values())
        out.append((ci, dot / np.sqrt(ns * nd)))
    return out


def test_cosine_vs_numpy(spark):
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    text = " ".join(vocab[(i * 3 + i // 7) % 5] for i in range(60))
    rows = extractive_topk(_doc(spark, text), k=5,
                           min_chunks=2).collect()
    ref = dict(_ref_cos(text))
    for r in rows:
        assert r["cos"] == pytest.approx(ref[r["chunk"]], abs=1e-6)


def test_outlier_chunk_ranked_last(spark):
    # 4 chunks of common words + 1 chunk of unique junk: the junk
    # chunk has minimal centroid cosine, never selected at k=2
    common = ("spark data " * 6).strip()
    junk = " ".join(f"junk{i}" for i in range(12))
    text = " ".join([common] * 4 + [junk])
    rows = extractive_topk(_doc(spark, text), k=2).collect()
    assert len(rows) == 2
    assert all(r["chunk"] != 4 for r in rows)
    assert rows[0]["rank"] == 1


def test_separation_direction(spark):
    texts = []
    for d in range(6):
        common = ("query table join scan " * 3).strip()
        junk = " ".join(f"junk{d}_{i}" for i in range(12))
        texts.append((d, " ".join([common] * 4 + [junk]), "src"))
    df = spark.createDataFrame(texts, "doc_id: bigint, text: string, "
                                      "source: string")
    row = summary_rollup(df, k=2).collect()[0]
    assert row["n_docs"] == 6
    assert row["mean_cos_selected"] > row["mean_cos_rest"]
