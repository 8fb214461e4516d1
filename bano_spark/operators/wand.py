"""WAND / Block-Max-WAND pruning audit over the BM25 index — the
index-time cost model for top-k retrieval at corpus scale (Broder et
al. CIKM'03 "Efficient query evaluation using a two-level retrieval
process"; Ding & Suel SIGIR'11 block-max variant).

WAND's safety invariant: a document may be skipped iff the sum of its
query terms' score UPPER BOUNDS is below the current threshold θ (the
k-th best full score). This module audits that invariant STATICALLY
over a corpus: exact top-k → θ, per-term upper bounds (global and
per-block), and per-candidate prunability — i.e. how much of the
postings traversal a WAND/BMW engine would skip, and a proof row that
no true top-k document is prunable.

Numeric contract: score contributions reuse the exact BM25 formula of
operators/search.py:bm25_topk (same literal/operation order, so the
doubles are engine-identical up to libm ulps); every bound/threshold
is immediately quantized to MICRO-UNITS (round(x * 1e6) as BIGINT) so
all downstream sums and comparisons are exact integers — order-free
across engines, same precedent as bm25_topk's round-6 scores.

Scale shape: contributions = the query-term-filtered tf scan (postings
of the query terms only); bounds = map-side-combinable max per term
(or per term × block); the audit = one broadcast join of O(|query|)
bounds onto candidates. No Python, no global window; top-k is
TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bano_spark.operators.search import _TOKEN_SPLIT, _term_freqs

__all__ = ["contributions", "wand_audit"]

K1 = 1.2
B = 0.75


def contributions(docs: DataFrame, terms: list[str], *,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per (doc, query term): the BM25 score contribution `_s` —
    identical formula and evaluation order as search.bm25_topk."""
    tset = sorted(set(terms))
    dl = (docs.select(
        F.col(id_col),
        F.size(F.filter(F.split(F.col(text_col), _TOKEN_SPLIT),
                        lambda t: t != "")).cast("double").alias("dl")))
    stats = dl.agg(F.count(F.lit(1)).cast("double").alias("n"),
                   F.avg("dl").alias("avgdl"))
    tf = (_term_freqs(docs.select(id_col, text_col), id_col, text_col)
          .filter(F.col("term").isin(tset)))
    df_t = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df"))
    return (tf
            .join(F.broadcast(df_t), "term")
            .join(dl, id_col)
            .crossJoin(F.broadcast(stats))
            .withColumn(
                "_idf",
                F.log(F.lit(1.0) + (F.col("n") - F.col("df") + 0.5)
                      / (F.col("df") + 0.5)))
            .withColumn(
                "_s",
                F.col("_idf") * F.col("tf") * (K1 + 1.0)
                / (F.col("tf") + K1 * (1.0 - B
                                       + B * F.col("dl") / F.col("avgdl")))))


def _micro(c):
    return F.round(c * 1e6, 0).cast("bigint")


def wand_audit(docs: DataFrame, terms: list[str], *, k: int = 10,
               block: int = 32, id_col: str = "doc_id",
               text_col: str = "text") -> dict[str, DataFrame]:
    """Returns {'bounds', 'cands'}:

    bounds — per term: df, global upper bound (micro), max per-block
    upper bound, n_blocks.
    cands — per candidate doc: exact score (micro), WAND bound sum,
    BMW bound sum (the doc's own block), in_topk, prunable flags.
    """
    con = contributions(docs, terms, id_col=id_col, text_col=text_col)
    con = con.withColumn("s_micro", _micro(F.col("_s"))) \
             .withColumn("blk", F.expr(f"{id_col} div {block}"))

    ub = (con.groupBy("term")
          .agg(F.count(F.lit(1)).cast("bigint").alias("df"),
               _micro(F.max("_s")).alias("ub_micro"),
               F.countDistinct("blk").cast("bigint").alias("n_blocks")))
    bub = (con.groupBy("term", "blk")
           .agg(_micro(F.max("_s")).alias("bub_micro")))

    exact = (con.groupBy(id_col)
             .agg(_micro(F.sum("_s")).alias("score_micro")))
    theta = (exact.orderBy(F.desc("score_micro"), F.asc(id_col))
             .limit(k)
             .agg(F.min("score_micro").alias("theta_micro"),
                  F.max(F.col(id_col)).alias("_ignore"))
             .select("theta_micro"))

    per_doc = (con.select(id_col, "term", "blk").distinct()
               .join(F.broadcast(ub.select("term", "ub_micro")), "term")
               .join(F.broadcast(bub), ["term", "blk"])
               .groupBy(id_col)
               .agg(F.sum("ub_micro").cast("bigint").alias("wand_ub"),
                    F.sum("bub_micro").cast("bigint").alias("bmw_ub")))

    topk = (exact.orderBy(F.desc("score_micro"), F.asc(id_col))
            .limit(k).select(F.col(id_col), F.lit(True).alias("in_topk")))

    cands = (exact.join(per_doc, id_col)
             .join(topk, id_col, "left")
             .crossJoin(F.broadcast(theta))
             .select(F.col(id_col),
                     "score_micro", "wand_ub", "bmw_ub",
                     F.coalesce("in_topk", F.lit(False)).alias("in_topk"),
                     (F.col("wand_ub") < F.col("theta_micro"))
                     .alias("wand_prunable"),
                     (F.col("bmw_ub") < F.col("theta_micro"))
                     .alias("bmw_prunable"),
                     "theta_micro"))
    return {"bounds": ub.join(
        bub.groupBy("term").agg(F.max("bub_micro").alias("max_bub")),
        "term"), "cands": cands}
