"""Unit tests: PageRank, inverted index / BM25, weighted sampling."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def _numpy_pagerank(edges, n_nodes, iters=5, d=0.85, round_to=12):
    """Dense reference power iteration with dangling redistribution
    and the same per-iteration rounding the operator applies."""
    w = np.zeros((n_nodes, n_nodes))
    for s, t, wt in edges:
        w[s, t] += wt
    outw = w.sum(axis=1)
    r = np.full(n_nodes, round(1.0 / n_nodes, round_to))
    for _ in range(iters):
        dm = r[outw == 0].sum()
        contrib = np.zeros(n_nodes)
        for s in range(n_nodes):
            if outw[s] > 0:
                contrib += r[s] * w[s] / outw[s]
        r = np.round((1 - d) / n_nodes + d * (contrib + dm / n_nodes),
                     round_to)
    return r


def test_pagerank_matches_numpy_with_dangling(spark):
    from bano_spark.operators.graph import pagerank

    rng = np.random.default_rng(7)
    n = 12
    edges = []
    for s in range(n - 2):  # nodes n-2, n-1 dangle (no out-edges)
        for t in rng.choice(n, size=3, replace=False):
            edges.append((int(s), int(t), float(rng.integers(1, 4))))
    df = spark.createDataFrame(edges, "src int, dst int, w double")
    got = {r["node"]: r["rank"]
           for r in pagerank(df, weight="w", iters=5).collect()}
    want = _numpy_pagerank(edges, n)
    assert set(got) == set(range(n))
    for v in range(n):
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    # ranks are a probability distribution (dangling mass conserved)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_uniform_on_symmetric_cycle(spark):
    from bano_spark.operators.graph import pagerank

    n = 6
    edges = [(i, (i + 1) % n) for i in range(n)]
    df = spark.createDataFrame(edges, "src int, dst int")
    ranks = [r["rank"] for r in pagerank(df, iters=4).collect()]
    assert all(r == pytest.approx(1.0 / n, abs=1e-9) for r in ranks)


def test_inverted_index_postings_and_max_df(spark):
    from bano_spark.operators.search import inverted_index

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "a  c c"), (4, "")],
        "doc_id int, text string")
    idx = {r["term"]: r for r in inverted_index(docs).collect()}
    assert idx["a"]["df"] == 2 and idx["a"]["total_tf"] == 3
    assert idx["a"]["postings"] == "1:2,3:1"
    assert idx["b"]["postings"] == "1:1,2:1"
    assert idx["c"]["postings"] == "2:1,3:2"
    capped = inverted_index(docs, max_df=1).collect()
    assert capped == []  # every term appears in >= 2 docs

    # df cap keeps sub-threshold terms exact
    docs2 = spark.createDataFrame(
        [(1, "x common"), (2, "common")], "doc_id int, text string")
    kept = {r["term"] for r in inverted_index(docs2, max_df=1).collect()}
    assert kept == {"x"}


def test_bm25_matches_bruteforce(spark):
    from bano_spark.operators.search import bm25_topk

    corpus = {
        1: "spark table join",
        2: "spark spark hash",
        3: "sort merge window line",
        4: "table table table hash spark",
    }
    docs = spark.createDataFrame(list(corpus.items()),
                                 "doc_id int, text string")
    q = ["spark", "hash"]
    got = [(r["doc_id"], r["score"])
           for r in bm25_topk(docs, q, k=3).collect()]

    n = len(corpus)
    dls = {d: len(t.split()) for d, t in corpus.items()}
    avgdl = sum(dls.values()) / n
    dfs = {t: sum(1 for txt in corpus.values() if t in txt.split())
           for t in q}
    want = {}
    for d, txt in corpus.items():
        s = 0.0
        for t in q:
            tf = txt.split().count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dls[d] / avgdl))
        if s > 0:
            want[d] = round(s, 6)
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert got == top


def test_weighted_sample_deterministic_and_guarded(spark):
    from bano_spark.operators.selection import weighted_sample_wor

    rows = [(i, float(1 + (i * 13) % 50)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id int, w double")
    a = [r["doc_id"] for r in weighted_sample_wor(df, "w", 20).collect()]
    b = [r["doc_id"]
         for r in weighted_sample_wor(df.repartition(7), "w", 20).collect()]
    assert a == b and len(a) == 20  # pure function of content

    # brute-force replay of the same md5-derived keys
    import hashlib

    def key(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        return round(math.log((h + 0.5) / 2**32) / w, 6)

    want = sorted(rows, key=lambda r: (-key(*r), r[0]))[:20]
    assert a == [d for d, _ in want]

    bad = spark.createDataFrame([(1, 0.0)], "doc_id int, w double")
    with pytest.raises(Exception, match="strictly positive"):
        weighted_sample_wor(bad, "w", 5).collect()


def test_weighted_sample_per_group_quota_and_independence(spark):
    from bano_spark.operators.selection import weighted_sample_per_group

    rows = [(i, ["a", "b", "c"][i % 3], 1.0 + i % 7) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id int, grp string, w double")
    out = weighted_sample_per_group(df, "w", 5, "grp").collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r["doc_id"])
    assert {g: len(v) for g, v in by_grp.items()} == {
        "a": 5, "b": 5, "c": 5}

    # draw is a pure function of content: repartitioning changes nothing
    out2 = weighted_sample_per_group(df.repartition(11), "w", 5,
                                     "grp").collect()
    assert sorted((r["grp"], r["doc_id"]) for r in out) == sorted(
        (r["grp"], r["doc_id"]) for r in out2)

    # the group is folded into the key: the same id draws differently
    # across strata (keys differ between groups for identical ids/weights)
    keys = {(r["grp"], r["doc_id"]): r["sample_key"] for r in out}
    assert len(set(keys.values())) > 1


def test_triangle_participation_vs_bruteforce(spark):
    import itertools

    from bano_spark.operators.graph import triangle_participation

    rng = np.random.default_rng(21)
    n = 14
    edges = set()
    for _ in range(40):
        a, b = rng.choice(n, 2, replace=False)
        edges.add((int(min(a, b)), int(max(a, b))))
    # hub-skew: node 0 connects to everything (stresses orientation)
    for v in range(1, n):
        edges.add((0, v))
    df = spark.createDataFrame(sorted(edges), "src int, dst int")
    got = {r["node"]: r["n_triangles"]
           for r in triangle_participation(df).collect()}

    want = {}
    for a, b, c in itertools.combinations(range(n), 3):
        if ((a, b) in edges and (b, c) in edges and (a, c) in edges):
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    assert got == want
    # total count divides by 3 exactly
    assert sum(got.values()) % 3 == 0


def test_trustrank_concentrates_on_seed_reachable(spark):
    from bano_spark.operators.graph import pagerank

    # two disjoint 3-cycles; seeds only in the first
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)]
    df = spark.createDataFrame(edges, "src int, dst int")
    seeds = spark.createDataFrame([(0, 1.0)], "node int, t double")
    got = {r["node"]: r["rank"]
           for r in pagerank(df, iters=6, teleport=seeds).collect()}
    # unreachable component gets exactly zero; seeded component holds
    # all mass
    assert got[10] == got[11] == got[12] == 0.0
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    assert got[0] > got[1] > 0  # seed node keeps the largest share


def test_zorder_interleave_and_locality(spark):
    from bano_spark.geo.tiles import zorder_key

    df = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)],
        "tx long, ty long")
    rows = df.select("tx", "ty", zorder_key(
        F.col("tx"), F.col("ty"), bits=3).alias("z")).collect()
    got = {(r["tx"], r["ty"]): r["z"] for r in rows}

    def morton(x, y):
        z = 0
        for i in range(3):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(x, y): morton(x, y)
                   for x in range(8) for y in range(8)}
    # locality: every aligned 2x2 block occupies 4 CONSECUTIVE keys
    for bx in range(0, 8, 2):
        for by in range(0, 8, 2):
            ks = sorted(got[(bx + i, by + j)]
                        for i in range(2) for j in range(2))
            assert ks[3] - ks[0] == 3


def test_bfs_distances_vs_bruteforce(spark):
    from collections import deque

    from bano_spark.operators.graph import bfs_distances

    rng = np.random.default_rng(33)
    n = 30
    edges = {(int(min(a, b)), int(max(a, b)))
             for a, b in rng.integers(0, n, size=(60, 2)) if a != b}
    df = spark.createDataFrame(sorted(edges), "src int, dst int")
    seeds = spark.createDataFrame([(0,), (7,)], "node int")
    got = {r["node"]: r["dist"]
           for r in bfs_distances(df, seeds, max_hops=4).collect()}

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want, q = {0: 0, 7: 0}, deque([0, 7])
    while q:
        u = q.popleft()
        if want[u] >= 4:
            continue
        for v in adj.get(u, ()):
            if v not in want:
                want[v] = want[u] + 1
                q.append(v)
    assert got == want


def test_hits_matches_numpy(spark):
    from bano_spark.operators.graph import hits

    rng = np.random.default_rng(41)
    n = 10
    edges = {(int(a), int(b))
             for a, b in rng.integers(0, n, size=(35, 2)) if a != b}
    df = spark.createDataFrame(sorted(edges), "src int, dst int")
    got = {r["node"]: (r["hub"], r["auth"])
           for r in hits(df, iters=3).collect()}

    adj = np.zeros((n, n))
    for a, b in edges:
        adj[a, b] = 1.0
    h = np.round(np.full(n, 1.0 / n), 12)
    a = None
    for _ in range(3):
        a_raw = adj.T @ h
        mask_a = adj.sum(axis=0) > 0  # nodes with in-edges
        a = np.zeros(n)
        a[mask_a] = np.round(a_raw[mask_a] / a_raw[mask_a].sum(), 12)
        h_raw = adj @ a
        mask_h = adj.sum(axis=1) > 0
        h = np.zeros(n)
        h[mask_h] = np.round(h_raw[mask_h] / h_raw[mask_h].sum(), 12)
    active = sorted({x for e in edges for x in e})
    for v in active:
        assert got[v][0] == pytest.approx(h[v], abs=1e-9), v
        assert got[v][1] == pytest.approx(a[v], abs=1e-9), v
    # both scores are L1-normalized distributions
    assert sum(x[0] for x in got.values()) == pytest.approx(1.0, abs=1e-6)
    assert sum(x[1] for x in got.values()) == pytest.approx(1.0, abs=1e-6)


def test_k_core_matches_bruteforce(spark):
    import collections
    import random

    rng = random.Random(5)
    edges = {(rng.randint(0, 25), rng.randint(0, 25)) for _ in range(120)}
    edges |= {(i, j) for i in range(6) for j in range(6) if i < j}  # clique
    df = spark.createDataFrame(
        [(u, v) for u, v in edges], ["src", "dst"]).repartition(4)

    from bano_spark.operators.graph import k_core

    und = set()
    for u, v in edges:
        if u != v:
            und.add((u, v)); und.add((v, u))
    for k in (3, 5):
        alive = {u for u, _ in und}
        while True:
            deg = collections.Counter(
                u for u, v in und if u in alive and v in alive)
            nxt = {n for n, d in deg.items() if d >= k}
            if nxt == alive:
                break
            alive = nxt
        want = {n: deg[n] for n in alive}
        got = {r["node"]: r["core_degree"]
               for r in k_core(df, k).collect()}
        assert got == want, f"k={k}"


def test_label_propagation_two_cliques(spark):
    from bano_spark.operators.graph import label_propagation
    edges = []
    for base in (0, 10):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j))
    edges.append((3, 10))  # one weak bridge
    df = spark.createDataFrame(edges, "src int, dst int")
    out = {r.node: r.lbl
           for r in label_propagation(df, rounds=4).collect()}
    # each clique converges to its min node's label
    assert {out[i] for i in range(4)} == {0}
    assert {out[i] for i in range(10, 14)} == {10}


def test_label_propagation_deterministic_across_partitionings(spark):
    from bano_spark.operators.graph import label_propagation
    import random
    rng = random.Random(23)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(80)]
    edges = [(u, v) for u, v in edges if u != v]
    a = spark.createDataFrame(edges, "src int, dst int")
    b = a.repartition(7)
    ra = sorted(map(tuple, label_propagation(a, rounds=3).collect()))
    rb = sorted(map(tuple, label_propagation(b, rounds=3).collect()))
    assert ra == rb
