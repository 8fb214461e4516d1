"""Gazetteer multi-pattern phrase matching — Aho-Corasick semantics
as rare-token-anchored positional equi-joins.

Dictionary matching (find every occurrence of every dictionary
phrase in a token stream) is classically Aho-Corasick: one pass,
all patterns at once, overlaps reported.  A trie automaton is
driver-side sequential state; the DISTRIBUTED shape that preserves
its semantics exactly is:

1. pick one ANCHOR token per phrase — the corpus-rarest token
   (min document-stream frequency, tie -> smallest offset), the
   selectivity trick from set-similarity joins (prefix filtering):
   a phrase can only start at pos s if its anchor occurs at
   s + anchor_offset, so candidates/phrase = freq(anchor), the
   minimum over the phrase's tokens;
2. candidate generation = ONE hash equi-join of the token stream
   against the (tiny, broadcast) anchor table on the token;
3. verification = ONE more equi-join of candidates x phrase-tokens
   against the stream on (doc_id, pos, tok), counting hits ==
   phrase length.

Both joins key on the token / (doc, pos, token) — at 100 TB the
stream is the big side and is never shuffled when pre-partitioned
by doc_id (the verify key starts with doc_id); the dictionary side
is broadcast.  All matches are reported, INCLUDING overlapping and
nested ones, exactly like Aho-Corasick's output function.

Ref parity: the reference's rapprochement hash-matches normalized
FANTOIR registry names against OSM/BAN/cadastre names per commune
(bano/models.py:22-165, bano/core.py:281-323); the gazetteer is
that registry-vs-corpus match generalized to positions in free
text, with the anchor choice making it web-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["phrase_tokens", "pick_anchors", "candidates",
           "match_phrases"]


def phrase_tokens(phrases: DataFrame) -> DataFrame:
    """Explode (phrase_id, phrase) into (phrase_id, phrase, plen,
    off, tok) with 1-based token offsets; phrases are
    space-separated token sequences."""
    return (phrases
            .withColumn("plen",
                        F.size(F.split("phrase", " ")).cast("bigint"))
            .select("phrase_id", "phrase", "plen",
                    F.posexplode(F.split("phrase", " "))
                    .alias("off0", "tok"))
            .withColumn("off", (F.col("off0") + 1).cast("bigint"))
            .drop("off0"))


def pick_anchors(ptoks: DataFrame, term_freq: DataFrame) -> DataFrame:
    """One row per phrase: the rarest token and its offset.
    `term_freq` is (tok, freq) over the corpus; dictionary tokens
    absent from the corpus get freq 0 (and generate 0 candidates —
    the correct fast path).  Ties break on the smallest offset."""
    w = Window.partitionBy("phrase_id").orderBy(
        F.col("freq").asc(), F.col("off").asc())
    return (ptoks.join(term_freq, "tok", "left")
            .withColumn("freq",
                        F.coalesce("freq", F.lit(0)).cast("bigint"))
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("phrase_id", "plen",
                    F.col("tok").alias("anchor_tok"),
                    F.col("off").alias("anchor_off"),
                    F.col("freq").alias("anchor_freq")))


def candidates(stream: DataFrame, anchors: DataFrame) -> DataFrame:
    """(doc_id, phrase_id, start): every stream position whose token
    equals a phrase's anchor, shifted back by the anchor offset.
    `stream` is (doc_id, pos, tok) with 1-based pos.  The anchor
    table is broadcast — it is O(|dictionary|)."""
    return (stream
            .join(F.broadcast(anchors),
                  stream["tok"] == anchors["anchor_tok"])
            .select("doc_id", "phrase_id", "plen",
                    (F.col("pos") - F.col("anchor_off") + 1)
                    .cast("bigint").alias("start"))
            .filter(F.col("start") >= 1))


def match_phrases(stream: DataFrame, ptoks: DataFrame,
                  anchors: DataFrame) -> DataFrame:
    """All (doc_id, phrase_id, start) where the full phrase matches
    the stream — Aho-Corasick's complete output set (overlapping
    and nested matches included).

    Verification is candidates x phrase-tokens equi-joined back to
    the stream on (doc_id, pos, tok); a candidate survives iff all
    plen offsets hit.  Counting is map-side combinable."""
    cand = candidates(stream, anchors)
    need = (cand.join(F.broadcast(ptoks.select("phrase_id", "off",
                                               "tok")),
                      "phrase_id")
            .select("phrase_id", "plen", "start",
                    F.col("doc_id").alias("n_doc"),
                    (F.col("start") + F.col("off") - 1).alias("n_pos"),
                    F.col("tok").alias("n_tok")))
    hits = (need.join(
        stream,
        (need["n_doc"] == stream["doc_id"])
        & (need["n_pos"] == stream["pos"])
        & (need["n_tok"] == stream["tok"]))
        .select(F.col("n_doc").alias("doc_id"), "phrase_id",
                "start", "plen"))
    return (hits.groupBy("doc_id", "phrase_id", "start", "plen")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") == F.col("plen"))
            .select("doc_id", "phrase_id", "start"))
