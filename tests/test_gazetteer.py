"""Kernel tests for wave 108: gazetteer phrase matching vs a naive
Python scan — overlap, nesting, repeated tokens, zero-freq anchors,
and the rarest-token/smallest-offset anchor rule."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bano_spark.operators.gazetteer import (candidates, match_phrases,
                                            phrase_tokens, pick_anchors)

DOCS = {
    1: "a b a b a b",        # overlapping 'a b' x3, 'b a' x2
    2: "x x x y",            # 'x x' self-overlaps x2
    3: "s m j s m",          # 's m j' nests 's m'; 'm j' overlaps
}

PHRASES = [(1, "a b"), (2, "b a"), (3, "x x"), (4, "s m j"),
           (5, "s m"), (6, "m j"), (7, "zz"), (8, "y")]


def _naive():
    out = set()
    for did, text in DOCS.items():
        toks = text.split(" ")
        for pid, ph in PHRASES:
            pt = ph.split(" ")
            for s in range(len(toks) - len(pt) + 1):
                if toks[s:s + len(pt)] == pt:
                    out.add((did, pid, s + 1))
    return out


@pytest.fixture(scope="module")
def parts(spark):
    docs = spark.createDataFrame(list(DOCS.items()),
                                 "doc_id long, text string")
    stream = (docs.select("doc_id",
                          F.posexplode(F.split("text", " "))
                          .alias("p0", "tok"))
              .withColumn("pos", (F.col("p0") + 1).cast("bigint"))
              .drop("p0"))
    ptoks = phrase_tokens(
        spark.createDataFrame(PHRASES, "phrase_id long, phrase string"))
    tf = stream.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    return stream, ptoks, pick_anchors(ptoks, tf)


def test_matches_equal_naive_scan(spark, parts):
    stream, ptoks, anchors = parts
    got = {(r["doc_id"], r["phrase_id"], r["start"])
           for r in match_phrases(stream, ptoks, anchors).collect()}
    assert got == _naive()
    # sanity on the edge cases the fixture encodes
    assert (1, 1, 1) in got and (1, 1, 3) in got  # overlap
    assert (2, 3, 1) in got and (2, 3, 2) in got  # repeated-token
    assert (3, 4, 1) in got and (3, 5, 1) in got  # nesting
    assert not any(p == 7 for _, p, _s in got)    # zero-freq phrase


def test_anchor_rule_rarest_then_smallest_offset(spark, parts):
    _, _, anchors = parts
    a = {r["phrase_id"]: (r["anchor_tok"], r["anchor_off"],
                          r["anchor_freq"])
         for r in anchors.collect()}
    # corpus freqs: a=3 b=3 x=3 y=1 s=2 m=2 j=1 zz=0
    assert a[4] == ("j", 3, 1)    # rarest token wins
    assert a[5] == ("s", 1, 2)    # tie (s=2, m=2) -> smallest offset
    assert a[3] == ("x", 1, 3)    # repeated token -> first offset
    assert a[7] == ("zz", 1, 0)   # absent from corpus -> freq 0


def test_zero_freq_anchor_generates_no_candidates(spark, parts):
    stream, _, anchors = parts
    c = candidates(stream, anchors.filter(F.col("phrase_id") == 7))
    assert c.count() == 0


def test_candidates_superset_of_matches(spark, parts):
    stream, ptoks, anchors = parts
    cand = {(r["doc_id"], r["phrase_id"], r["start"])
            for r in candidates(stream, anchors).collect()}
    assert _naive() <= cand
