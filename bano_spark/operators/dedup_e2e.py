"""End-to-end corpus dedup composition (VERDICT r4 item 8): ONE
auditable per-document lineage through the four dedup/curation stages
the engine gates separately — exact -> MinHash-LSH -> char-winnow ->
per-source token budget — with the FIRST failing stage recorded as
the drop attribution (the lineage table a production curation run
materializes; cf. operators/curation.py for the lang/quality variant
and operators/dedup.py / chardedup.py for the single-stage pieces).

Stage rules (all deterministic, all non-iterative — every stage is a
"link to the minimum surviving id" decision so the whole pipeline is
aggregates + joins, no fixpoint):

1. exact_dup — md5(text) groups; the smallest doc_id per group
   survives (operators/dedup.exact_dedup's keeper rule).
2. minhash_dup — banded minwise sketch (8 hashes, 4 bands of 2,
   operators/dedup.minhash_signature/band_keys) over exact
   survivors; a doc is dropped when ANY of its band buckets contains
   a smaller surviving doc_id. NOTE the scale shape: this needs only
   the PER-BUCKET MIN (one aggregate + a join back), never the
   bucket self-join — the mega-bucket quadratic blowup the capped
   pair generators guard against cannot occur here at all.
3. winnow_dup — Schleimer winnowing anchors (k=16, w=8,
   operators/chardedup.winnow_anchor_table) over minhash survivors;
   a doc is dropped when at least half its anchors are shared
   (n_dup * 2 >= n_anchors) AND some smaller surviving doc shares an
   anchor with it (min-over-anchors of per-anchor min doc_id <
   doc_id). Docs too short to produce grams have no anchors and are
   never winnow-dropped (NULL min comparison).
4. budget — per-source prefix cutoff over winnow survivors in
   (n_chars DESC, doc_id) order: kept while the running whitespace-
   token total stays within `budget_words` (the curation.py prefix-
   cutoff semantics, documented there: an overflowing doc still
   consumes budget for later docs).

Returns one row per input doc: (doc_id, source, n_words, stage) with
stage in ('kept', 'exact_dup', 'minhash_dup', 'winnow_dup',
'budget').

Scale shape: md5 window + one sketch aggregate + per-bucket min +
anchor window + per-anchor min + one per-source budget window — every
stage a single shuffle on a bounded key, no self-joins, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from bano_spark.operators.chardedup import winnow_anchor_table
from bano_spark.operators.dedup import (band_keys, minhash_signature,
                                        tokens)

__all__ = ["corpus_dedup_e2e"]


def corpus_dedup_e2e(docs: DataFrame, *, budget_words: int = 2000,
                     k: int = 16, w: int = 8) -> DataFrame:
    """Compose exact -> LSH -> winnow -> budget; see module doc."""
    d = docs.select("doc_id", "text", "source", "n_chars",
                    F.size(tokens(F.col("text"))).cast("bigint")
                    .alias("n_words"))

    # stage 1: exact
    w_hash = Window.partitionBy(F.md5("text"))
    d = d.withColumn("_keep1",
                     F.col("doc_id") == F.min("doc_id").over(w_hash))

    s1 = d.filter("_keep1").select("doc_id", "text")

    # stage 2: minhash band buckets -> per-bucket min survivor
    sig = minhash_signature(s1)
    bands = band_keys(sig)
    bmin = bands.groupBy("band", "key").agg(
        F.min("doc_id").alias("_bmin"))
    mh = (bands.join(bmin, ["band", "key"])
          .groupBy("doc_id")
          .agg(F.min("_bmin").alias("_mhmin")))
    d = d.join(mh, "doc_id", "left")
    d = d.withColumn("_keep2", F.col("_keep1")
                     & (F.col("_mhmin") >= F.col("doc_id")))

    s2 = d.filter("_keep2").select("doc_id", "text")

    # stage 3: winnow anchors -> per-anchor min survivor + dup ratio
    anch = winnow_anchor_table(s2, k=k, w=w)
    amin = anch.groupBy("anchor").agg(
        F.min("doc_id").alias("_amin"),
        F.countDistinct("doc_id").alias("_adocs"))
    per_doc = (anch.join(amin, "anchor")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("_na"),
                    F.sum(F.when(F.col("_adocs") >= 2, 1).otherwise(0))
                    .alias("_nd"),
                    F.min("_amin").alias("_wmin")))
    d = d.join(per_doc, "doc_id", "left")
    winnow_drop = ((F.col("_nd") * 2 >= F.col("_na"))
                   & (F.col("_wmin") < F.col("doc_id")))
    d = d.withColumn("_keep3", F.col("_keep2")
                     & ~F.coalesce(winnow_drop, F.lit(False)))

    # stage 4: per-source budget (prefix cutoff — curation.py
    # semantics)
    wb = (Window.partitionBy("source")
          .orderBy(F.col("n_chars").desc(), F.col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0))
    d = d.withColumn(
        "_cum", F.sum(F.when(F.col("_keep3"), F.col("n_words"))
                      .otherwise(0)).over(wb))
    d = d.withColumn("_keep4", F.col("_keep3")
                     & (F.col("_cum") <= budget_words))

    stage = (F.when(~F.col("_keep1"), "exact_dup")
             .when(~F.col("_keep2"), "minhash_dup")
             .when(~F.col("_keep3"), "winnow_dup")
             .when(~F.col("_keep4"), "budget")
             .otherwise("kept"))
    return (d.select("doc_id", "source", "n_words",
                     stage.alias("stage"))
            .orderBy("doc_id"))
