"""Hand-computed checks for the wave-52 operators: sampled Brandes
betweenness, Adamic-Adar link prediction, Dirichlet query likelihood,
and reciprocal-rank fusion."""

import math

from bano_spark.operators.graph import adamic_adar_pairs, sampled_betweenness
from bano_spark.operators.search import ql_dirichlet_topk, rrf_fuse


def test_betweenness_path(spark):
    # 0 - 1 - 2 - 3: exact betweenness (all seeds) of node 1 is 2
    # (pairs (0,2),(0,3) pass through it... counted once per unordered
    # pair): delta sums over seeds / 2 with n/k = 1 recovers it.
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "s bigint, d bigint")
    seeds = spark.createDataFrame([(i,) for i in range(4)], "node bigint")
    out = {r["node"]: r["betweenness"] for r in sampled_betweenness(
        edges, seeds, src="s", dst="d", max_hops=5).collect()}
    # exact Brandes on a path: bc(1) = bc(2) = 2, endpoints 0
    assert out[1] == 2.0 and out[2] == 2.0
    assert 0 not in out and 3 not in out  # zero dependency -> absent


def test_betweenness_diamond_sigma(spark):
    # 0-1, 0-2, 1-3, 2-3: two shortest 0->3 paths, sigma(3)=2 from
    # seed 0; node 1 gets delta = (1/2)*(1+0) = 0.5 from seed 0,
    # 0.5 from seed 3, plus 0 elsewhere -> bc = (4/4)*(1)/2 = 0.5.
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3)], "s bigint, d bigint")
    seeds = spark.createDataFrame([(i,) for i in range(4)], "node bigint")
    out = {r["node"]: r["betweenness"] for r in sampled_betweenness(
        edges, seeds, src="s", dst="d", max_hops=5).collect()}
    assert out[1] == 0.5 and out[2] == 0.5


def test_adamic_adar_square(spark):
    # square 0-1-2-3-0: (0,2) share neighbors {1,3}, both degree 2
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "s bigint, d bigint")
    rows = {(r["u"], r["v"]): r for r in
            adamic_adar_pairs(edges, src="s", dst="d").collect()}
    aa02 = rows[(0, 2)]
    assert aa02["common_neighbors"] == 2
    assert aa02["adamic_adar"] == round(2 / math.log(2), 6)
    assert not aa02["is_edge"]
    assert rows[(1, 3)]["common_neighbors"] == 2
    # adjacent corners share nothing on a square -> absent
    assert (0, 1) not in rows


def test_ql_dirichlet(spark):
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c c"), (3, "c c c")],
        "doc_id bigint, text string")
    out = {r["doc_id"]: r["score"] for r in
           ql_dirichlet_topk(docs, ["a"], k=3, mu=2.0).collect()}
    # C = 9, cf(a) = 3, p_c = 1/3; doc1: ln(1 + 2/(2*1/3)) + ln(2/5)
    assert out[1] == round(math.log(1 + 2 / (2 * 3 / 9))
                           + math.log(2 / (3 + 2)), 6)
    assert 3 not in out  # no matching term -> not a candidate


def test_rrf_fuse(spark):
    a = spark.createDataFrame([(1, 3.0), (2, 2.0), (3, 1.0)],
                              "doc_id bigint, score double")
    b = spark.createDataFrame([(2, 9.0), (4, 5.0)],
                              "doc_id bigint, score double")
    out = {r["doc_id"]: r for r in
           rrf_fuse(a, b, c=60.0, k=10).collect()}
    assert out[2]["rank_a"] == 2 and out[2]["rank_b"] == 1
    assert out[2]["rrf_score"] == round(1 / 62 + 1 / 61, 6)
    assert out[4]["rank_a"] is None
    assert out[4]["rrf_score"] == round(1 / 62, 6)
    assert out[1]["rrf_score"] == round(1 / 61, 6)
