"""Hand-computed checks for the ranking-metric operators (wave 46)."""

import math

from pyspark.sql import functions as F

from bano_spark.operators.ranking import (
    average_precision, ndcg_at_k, reciprocal_rank_summary, roc_auc)


def _fixture(spark):
    # query 1: ranked (by score desc, id asc) rel pattern = [0,1,1,0]
    # query 2: all irrelevant
    # query 3: single relevant item at rank 1, with a score TIE broken
    # by id (id 31 outranks id 32 at equal score)
    rows = [
        (1, 10, 9.0, False), (1, 11, 8.0, True),
        (1, 12, 7.0, True), (1, 13, 6.0, False),
        (2, 20, 5.0, False), (2, 21, 4.0, False),
        (3, 31, 2.0, True), (3, 32, 2.0, False),
    ]
    return spark.createDataFrame(
        rows, "q int, id int, score double, rel boolean")


def _order():
    return [F.desc("score"), F.asc("id")]


def test_mrr(spark):
    out = reciprocal_rank_summary(_fixture(spark), "q", _order(), "rel") \
        .collect()[0]
    # q1 first rel at rank 2, q2 none (0), q3 at rank 1
    assert out["n_queries"] == 3
    assert out["n_with_relevant"] == 2
    assert out["mrr"] == round((0.5 + 0.0 + 1.0) / 3, 6)


def test_ndcg(spark):
    out = {r["q"]: r for r in
           ndcg_at_k(_fixture(spark), "q", _order(), "rel", k=10).collect()}
    dcg1 = 1 / math.log2(3) + 1 / math.log2(4)
    idcg1 = 1 / math.log2(2) + 1 / math.log2(3)
    assert out[1]["ndcg_10"] == round(dcg1 / idcg1, 6)
    assert out[2]["ndcg_10"] == 0.0
    assert out[3]["ndcg_10"] == 1.0
    assert out[1]["n_rel"] == 2


def test_ndcg_truncates_at_k(spark):
    # k=2: q1's hits at ranks 2,3 -> only rank 2 counts; ideal has
    # min(n_rel, k)=2 slots
    out = {r["q"]: r for r in
           ndcg_at_k(_fixture(spark), "q", _order(), "rel", k=2).collect()}
    dcg = 1 / math.log2(3)
    idcg = 1 / math.log2(2) + 1 / math.log2(3)
    assert out[1]["ndcg_2"] == round(dcg / idcg, 6)


def test_average_precision(spark):
    out = {r["q"]: r for r in
           average_precision(_fixture(spark), "q", _order(), "rel").collect()}
    # q1: hits at ranks 2 (prec 1/2) and 3 (prec 2/3) -> AP = 7/12
    assert out[1]["ap"] == round((0.5 + 2 / 3) / 2, 6)
    assert out[2]["ap"] == 0.0
    assert out[3]["ap"] == 1.0


def test_roc_auc_ties(spark):
    # pos scores {3, 2}, neg scores {2, 1}: pairs (3>2)=1, (3>1)=1,
    # (2=2)=0.5, (2>1)=1 -> AUC = 3.5/4
    rows = [(3.0, True), (2.0, True), (2.0, False), (1.0, False)]
    df = spark.createDataFrame(rows, "score double, rel boolean")
    out = roc_auc(df, "score", "rel").collect()[0]
    assert (out["n_pos"], out["n_neg"]) == (2, 2)
    assert out["auc"] == round(3.5 / 4, 6)


def test_roc_auc_perfect_separation(spark):
    rows = [(5.0, True), (4.0, True), (1.0, False), (0.5, False)]
    df = spark.createDataFrame(rows, "score double, rel boolean")
    assert roc_auc(df, "score", "rel").collect()[0]["auc"] == 1.0
