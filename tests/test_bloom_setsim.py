"""Unit tests: bloom-pruned join and AllPairs exact Jaccard join."""

import itertools

import pytest
from pyspark.sql import functions as F


def test_bloom_join_exact_vs_plain(spark):
    from bano_spark.operators.bloom import bloom_pruned_join

    probe = spark.createDataFrame(
        [(i, f"v{i}") for i in range(2000)], "k int, payload string")
    build = spark.createDataFrame(
        [(i,) for i in range(0, 2000, 37)], "k int")
    got = sorted(r["k"] for r in bloom_pruned_join(probe, build, "k")
                 .select("k").collect())
    want = sorted(range(0, 2000, 37))
    assert got == want

    # tiny filter -> many false positives -> STILL exact
    got_fp = sorted(r["k"]
                    for r in bloom_pruned_join(probe, build, "k",
                                               num_bits=64, num_hashes=2)
                    .select("k").collect())
    assert got_fp == want


def test_bloom_prune_actually_drops_rows(spark):
    from bano_spark.operators.bloom import (bloom_might_contain,
                                            build_bloom_words)

    build = spark.createDataFrame([(i,) for i in range(50)], "k int")
    words = build_bloom_words(build, "k")
    # probe key is BIGINT while the build was INT — hash inputs must be
    # type-aligned exactly as bloom_pruned_join does internally
    probe = spark.range(0, 100_000).select(F.col("id").alias("k"))
    kept = probe.filter(
        bloom_might_contain(words, F.col("k").cast("int"))).count()
    # all 50 true keys survive; FP rate at 2^16 bits / 50 keys is ~0
    assert 50 <= kept < 200


def _brute_jaccard(corpus, tau):
    toks = {d: set(t.split()) for d, t in corpus}
    out = []
    for (a, ta), (b, tb) in itertools.combinations(
            sorted(toks.items()), 2):
        inter = len(ta & tb)
        if not ta and not tb:
            continue
        j = inter / (len(ta) + len(tb) - inter)
        if j >= tau:
            out.append((a, b, round(j, 6)))
    return sorted(out)


@pytest.mark.parametrize("tau", [0.5, 0.8])
def test_allpairs_matches_bruteforce(spark, tau):
    from bano_spark.operators.setsim import allpairs_jaccard

    vocab = ["a", "b", "c", "d", "e", "f", "g", "h"]
    corpus = []
    for i in range(60):
        toks = [vocab[(i * 3 + j * 5) % 8] for j in range(1 + i % 6)]
        corpus.append((i, " ".join(toks)))
    docs = spark.createDataFrame(corpus, "doc_id int, text string")
    got = sorted((r["id_a"], r["id_b"], r["jac"])
                 for r in allpairs_jaccard(docs, tau).collect())
    assert got == _brute_jaccard(corpus, tau)


def test_prefix_len_bound():
    from bano_spark.operators.setsim import _prefix_len

    # tau=1.0 -> only the single rarest token; tau->0 -> whole set
    assert _prefix_len(10, 1.0) == 1
    assert _prefix_len(10, 0.5) == 6
    assert _prefix_len(1, 0.8) == 1


def test_bloom_join_rejects_outer_and_rounds_bits(spark):
    import pytest as _pt

    from bano_spark.operators.bloom import (bloom_might_contain,
                                            bloom_pruned_join,
                                            build_bloom_words)

    probe = spark.createDataFrame([(1,), (2,)], "k int")
    build = spark.createDataFrame([(1,)], "k int")
    with _pt.raises(ValueError, match="left"):
        bloom_pruned_join(probe, build, "k", how="left")
    with _pt.raises(ValueError, match="left_anti"):
        bloom_pruned_join(probe, build, "k", how="left_anti")

    # non-multiple-of-64 num_bits rounds up consistently: build and
    # probe agree on the modulus, no IndexError, no false negatives
    words = build_bloom_words(build, "k", num_bits=1000)
    assert len(words) * 64 == 1024
    kept = probe.filter(
        bloom_might_contain(words, probe["k"].cast("int"))).collect()
    assert 1 in {r["k"] for r in kept}
