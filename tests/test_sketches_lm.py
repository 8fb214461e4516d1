"""KMV sketch and bigram-LM scoring: closed-form fixtures plus the
lossless-pre-prune and under-filled-sketch branches."""

import math

from pyspark.sql import functions as F

from bano_spark.operators.lm import bigram_lm_score
from bano_spark.operators.sketches import kmv_distinct


def test_kmv_underfilled_sketch_is_exact(spark):
    df = spark.createDataFrame(
        [("a", i % 5) for i in range(100)] + [("b", i) for i in range(3)],
        "g string, v int")
    out = {r.g: r for r in kmv_distinct(df, "g", "v", k=32).collect()}
    assert out["a"].sketch_size == 5 and out["a"].kmv_estimate == 5.0
    assert out["b"].sketch_size == 3 and out["b"].kmv_estimate == 3.0


def test_kmv_estimator_tracks_truth(spark):
    n = 5000
    df = spark.createDataFrame([("g", i) for i in range(n)], "g string, v int")
    est = kmv_distinct(df, "g", "v", k=256).collect()[0]
    assert est.sketch_size == 256
    assert abs(est.kmv_estimate - n) / n < 0.15  # ~1/sqrt(k) regime


def test_kmv_prune_is_lossless(spark):
    df = spark.createDataFrame(
        [(f"g{i % 3}", i * 7919 % 1000) for i in range(600)],
        "g string, v int")
    a = sorted(map(tuple, kmv_distinct(df, "g", "v", k=16,
                                       prune_buckets=1).collect()))
    b = sorted(map(tuple, kmv_distinct(df, "g", "v", k=16,
                                       prune_buckets=16).collect()))
    assert a == b


def test_bigram_lm_closed_form(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a a"), (3, "solo")],
        "doc_id bigint, text string")
    out = {r.doc_id: r for r in bigram_lm_score(docs).collect()}
    # corpus: bigrams doc1 = ab, ba, ab; doc2 = aa. V = {a, b, solo} = 3
    # c2: (a,b)=2 (b,a)=1 (a,a)=1 ; c1: a=3, b=1
    v = 3.0
    p_ab = (2 + 0.5) / (3 + 0.5 * v)
    p_ba = (1 + 0.5) / (1 + 0.5 * v)
    p_aa = (1 + 0.5) / (3 + 0.5 * v)
    x1 = -(2 * math.log2(p_ab) + math.log2(p_ba)) / 3
    x2 = -math.log2(p_aa)
    assert out[1].n_bigrams == 3
    assert abs(out[1].xent_bits - round(x1, 6)) < 1e-9
    assert abs(out[2].xent_bits - round(x2, 6)) < 1e-9
    assert 3 not in out  # single-token doc has no bigrams


def test_bigram_lm_repetitive_text_scores_lower(spark):
    rep = " ".join(["spam"] * 50)
    rich = "the quick brown fox jumps over the lazy dog near a riverbank"
    filler = [(i, f"w{i} x{i} y{i} z{i}") for i in range(10, 30)]
    docs = spark.createDataFrame(
        [(1, rep), (2, rich)] + filler, "doc_id bigint, text string")
    out = {r.doc_id: r.xent_bits for r in bigram_lm_score(docs).collect()}
    assert out[1] < out[2]  # repeated bigram is cheap under the corpus LM
