"""Character-level exact-substring duplication — the Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better") acting
twin at CHARACTER granularity, closing the word-13-gram blind spot:
a copied span that is shorter than 13 words, crosses word boundaries
at a shifted offset, or is re-wrapped in new surrounding text shares
NO word 13-gram with its source, but every character k-gram inside it
matches exactly.

Two operators, one contract:

  char_dup_spans    stride-1 character k-grams; a position is COVERED
                    when its k-gram occurs in >= 2 distinct docs; the
                    longest run of covered positions + k - 1 is the
                    longest exactly-duplicated character span. EXACT
                    for any shared span >= k chars, any alignment —
                    the suffix-array answer re-expressed as groupBy +
                    gaps-and-islands. Cost: len(text) gram rows per
                    doc (the honest price of exactness; bound the scan
                    with a length cap upstream).

  char_winnow_anchors  true winnowing (Schleimer et al. 2003 §4) over
                    the SAME char k-gram stream: every w-window of
                    consecutive gram hashes selects its minimum
                    (leftmost on hash ties via (hash, pos) argmin), so
                    any shared substring of length >= w + k - 1 chars
                    is GUARANTEED to share an anchor hash. The 100 TB
                    path: ~len/w anchors per doc instead of len grams
                    cross the shuffle, a (2/(w+1)) expected density.

Both stay in codegen'd column expressions end to end: substr + md5 on
an exploded position sequence, keyed windows, keyed groupBys — no
Python crosses the row path. Ref: bano has no text dedup; this extends
operators/webtext.dup_span_stats (word-gram, ref-parity docstring
there) down to character granularity per the round-3 verdict item 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _char_grams(docs: DataFrame, text_col: str, id_col: str,
                k: int) -> DataFrame:
    """(id, pos, g): md5 of the k-char gram at every 1-based position.
    Docs shorter than k chars contribute no rows (explicit filter —
    Spark's sequence(1, 0) would COUNT DOWN, not return empty)."""
    return (docs
            .filter(F.length(text_col) >= k)
            .select(F.col(id_col),
                    F.explode(F.sequence(
                        F.lit(1), F.length(text_col) - (k - 1))).alias("pos"),
                    F.col(text_col))
            .select(id_col, "pos",
                    F.md5(F.expr(f"substring({text_col}, pos, {k})"))
                    .alias("g")))


def char_dup_spans(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", k: int = 16) -> DataFrame:
    """Per doc: n_pos (gram positions), n_dup_pos (positions whose
    k-gram occurs in >= 2 distinct docs), longest_dup_span (longest
    covered run + k - 1 chars; 0 when nothing is shared). Cross-doc
    only — within-doc repeats do not mark a position (the cross-doc
    contamination case; a within-doc variant is repetition_stats').

    Shape: one groupBy on the gram hash (map-side combined), one
    equi-join back on the hash, keyed windows on id — every exchange
    is on a key, no global order, no pair explosion (the join carries
    one row per (doc, pos), never doc x doc)."""
    grams = _char_grams(docs, text_col, id_col, k)
    per_gram = grams.groupBy("g").agg(
        F.countDistinct(id_col).alias("n_docs"))
    j = grams.join(per_gram, "g").select(
        id_col, "pos", (F.col("n_docs") >= 2).alias("dup"))
    cov = j.filter("dup").select(id_col, "pos")
    w_prev = Window.partitionBy(id_col).orderBy("pos")
    runs = (cov
            .withColumn("prev", F.lag("pos").over(w_prev))
            .withColumn("new_run",
                        F.when(F.col("prev").isNull()
                               | (F.col("pos") > F.col("prev") + 1), 1)
                        .otherwise(0))
            .withColumn("run_id", F.sum("new_run").over(
                Window.partitionBy(id_col).orderBy("pos")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    span = (runs.groupBy(id_col, "run_id")
            .agg((F.max("pos") - F.min("pos") + k).alias("span"))
            .groupBy(id_col)
            .agg(F.max("span").alias("longest_dup_span")))
    tot = j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.sum(F.col("dup").cast("int")).alias("n_dup_pos"))
    return (tot.join(span, id_col, "left")
            .select(id_col,
                    F.col("n_pos").cast("bigint").alias("n_pos"),
                    F.col("n_dup_pos").cast("bigint").alias("n_dup_pos"),
                    F.coalesce(F.col("longest_dup_span"), F.lit(0))
                    .cast("bigint").alias("longest_dup_span")))


def winnow_anchor_table(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 16,
                        w: int = 8) -> DataFrame:
    """(id, anchor) — the winnowing-selected k-gram hashes per doc
    (distinct). Each w-window of consecutive gram hashes selects its
    (hash, pos)-argmin — encoded as min(hash || zero-padded pos) over
    a CURRENT..w-1 FOLLOWING keyed window, then DISTINCT — so the
    Schleimer guarantee holds: sharing any substring of w + k - 1
    chars implies sharing an anchor hash. Shared by
    char_winnow_anchors and the corpus_dedup_e2e composition."""
    grams = _char_grams(docs, text_col, id_col, k)
    key = F.concat(F.col("g"), F.lpad(F.col("pos").cast("string"), 8, "0"))
    w_fwd = (Window.partitionBy(id_col).orderBy("pos")
             .rowsBetween(Window.currentRow, w - 1))
    return (grams
            .withColumn("k2", key)
            .withColumn("nxt", F.count(F.lit(1)).over(w_fwd))
            .withColumn("wmin", F.min("k2").over(w_fwd))
            # only FULL windows select; a doc with fewer than w
            # grams keeps one anchor: its global (hash, pos) min,
            # read off the pos-1 truncated window
            .filter((F.col("nxt") == w) | (F.col("pos") == 1))
            .select(id_col, F.substring("wmin", 1, 32).alias("anchor"))
            .distinct())


def char_winnow_anchors(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 16,
                        w: int = 8) -> DataFrame:
    """Per doc: n_grams, n_anchors (winnowing-selected positions),
    n_dup_anchors (anchor hashes shared with >= 1 other doc); see
    winnow_anchor_table for the selection rule."""
    grams = _char_grams(docs, text_col, id_col, k)
    n_grams = grams.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"))
    anchors = winnow_anchor_table(docs, text_col, id_col, k, w)
    per_anchor = anchors.groupBy("anchor").agg(
        F.countDistinct(id_col).alias("n_docs"))
    per_doc = (anchors.join(per_anchor, "anchor")
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_anchors"),
                    F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0))
                    .alias("n_dup_anchors")))
    return (n_grams.join(per_doc, id_col, "left")
            .select(id_col,
                    F.col("n_grams").cast("bigint").alias("n_grams"),
                    F.coalesce("n_anchors", F.lit(0)).cast("bigint")
                    .alias("n_anchors"),
                    F.coalesce("n_dup_anchors", F.lit(0)).cast("bigint")
                    .alias("n_dup_anchors")))
