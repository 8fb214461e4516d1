"""Bigram language-model scoring — the CCNet-style perplexity screen.

Web-scale training pipelines rank documents by how "language-like"
they are under a corpus LM (Wenzek et al., CCNet); this operator is
that screen with the LM trained *on the corpus itself* in the same
job: corpus-wide bigram counts with add-alpha smoothing, then each
document scored by its mean negative log2 bigram probability
(cross-entropy in bits; perplexity = 2^xent). No reference
counterpart in osm-fr/bano — this is the webtext-payload side of the
engine, next to gopher_quality / token_entropy.

Determinism contract: tokens = split(trim(lower(text)), \\s+); counts
are integers; p = (c2 + alpha) / (c1 + alpha * V) with V = corpus
distinct-unigram count — identical closed-form arithmetic in any
engine, so a SQL oracle replays it exactly.

Scale shape (10^12 docs): everything is codegen column expressions.
Three shuffles — bigram count, left-context rollup (vocab-sized,
derived from the bigram counts rather than a second pass over
occurrences), and ONE occurrence-scale equi-join of the bigram stream
to the (w1, w2)-keyed count table that already carries its
left-context total. V rides in as a broadcast 1-row cross join, never
a driver scalar. Zero Python, zero collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import tokens


def bigram_lm_score(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    alpha: float = 0.5) -> DataFrame:
    """(id, n_bigrams, xent_bits) per document with >= 2 tokens.

    xent_bits = -avg(log2((c2(w1,w2) + alpha) / (c1(w1) + alpha * V)))
    over the document's bigram OCCURRENCES (repeats count), with
    c2/c1/V trained on the whole input. Rounded to 6 places.
    """
    ts = tokens(F.col(text_col))
    n = F.size(ts)
    toked = docs.select(F.col(id_col), ts.alias("ts"), n.alias("n"))

    big = (toked.filter(F.col("n") >= 2)
           .select(id_col,
                   F.explode(F.arrays_zip(
                       F.slice("ts", 1, F.col("n") - 1).alias("w1"),
                       F.slice("ts", 2, F.col("n") - 1).alias("w2")))
                   .alias("b"))
           .select(id_col, F.col("b.w1").alias("w1"),
                   F.col("b.w2").alias("w2")))

    c2 = big.groupBy("w1", "w2").agg(F.count("*").alias("n2"))
    c1 = c2.groupBy("w1").agg(F.sum("n2").alias("n1"))
    # vocab over ALL token positions (not just bigram lefts)
    vocab = (toked.select(F.explode("ts").alias("t")).distinct()
             .agg(F.count("*").cast("double").alias("v")))

    model = (c2.join(c1, "w1")
             .crossJoin(F.broadcast(vocab))
             .select("w1", "w2",
                     ((F.col("n2") + alpha)
                      / (F.col("n1") + alpha * F.col("v"))).alias("p")))

    return (big.join(model, ["w1", "w2"])
            .groupBy(id_col)
            .agg(F.count("*").alias("n_bigrams"),
                 F.round(-F.avg(F.log2("p")), 6).alias("xent_bits")))
