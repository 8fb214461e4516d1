"""Character-trigram language identification.

The brief's text-analysis axis asks for an n-gram language-ID
heuristic (the Common-Crawl preprocessing step that routes documents
to per-language pipelines — CLD/langid.py-style, reduced to its
relational core). The classifier here is the textbook profile method
(Cavnar & Trenkle 1994 "N-Gram-Based Text Categorization"): score a
document against each language by how many of its character trigrams
hit that language's marker-trigram profile, predict the argmax.

Reference anchor: generalizes the reference's per-language
normalization dictionaries (bano/dictionnaires/*.txt select rewrite
rules by corpus language) from lookup to classification.

Scale shape: one explode of char trigrams (rows ~= total chars, each
carrying a 3-char string + ids), a BROADCAST join against the profile
table (|langs| x |markers| rows — always tiny), one hash aggregation
with map-side partial combine, and a per-doc argmax window over
|langs| rows. Document text never shuffles; no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Marker trigrams per language — weight-1 presence profiles over the
# most discriminative function-word trigrams. Public knowledge (any
# frequency table of the languages); kept small so the profile join
# is always a broadcast.
LANG_TRIGRAM_PROFILES: dict[str, list[str]] = {
    "en": ["the", "he ", "ing", " wi", "are", "ren", "ick", "dog"],
    "fr": ["le ", " la", "ans", "une", "enf", "ave", "ist", "et "],
    "de": ["der", "die", "und", "sch", "ein", "uch", "ule", " be"],
    "es": ["el ", "los", "sus", "rro", "esc", "rca", " y ", "ado"],
    "it": ["il ", "gli", "lla", "ell", "ino", "amb", "gat", "tta"],
}


def profiles_df(spark) -> DataFrame:
    rows = [(lang, tri) for lang, tris in LANG_TRIGRAM_PROFILES.items()
            for tri in tris]
    return spark.createDataFrame(rows, "lang string, tri string")


def profiles_values_sql() -> str:
    """The same profile table as a SQL VALUES list (lang, tri) — one
    source of truth for engine and oracle."""
    return ", ".join(f"('{lang}', '{tri}')"
                     for lang, tris in LANG_TRIGRAM_PROFILES.items()
                     for tri in tris)


def langid_trigram(docs: DataFrame, profiles: DataFrame,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Predict a language per document: explode the document's char
    trigrams, broadcast-join ``profiles`` (lang, tri), count hits per
    (doc, lang), keep the argmax (ties broken by lang asc so the
    answer is deterministic). Documents with zero profile hits drop
    (undecidable — the caller's routing policy owns that bucket).

    Returns (id, pred_lang, best_score)."""
    tris = docs.select(
        F.col(id_col),
        F.explode(F.expr(
            f"transform(sequence(1, length({text_col}) - 2),"
            f" i -> substring({text_col}, i, 3))")).alias("tri"))
    scores = (tris.join(F.broadcast(profiles), "tri")
              .groupBy(id_col, "lang")
              .agg(F.count(F.lit(1)).cast("bigint").alias("score")))
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("lang"))
    return (scores.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select(id_col, F.col("lang").alias("pred_lang"),
                    F.col("score").alias("best_score")))


def langid_segments(docs: DataFrame, profiles: DataFrame,
                    seg_tokens: int, *, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Code-switching detection: language ID per NON-OVERLAPPING
    ``seg_tokens``-token segment, rolled up per document — mixed-
    language pages (boilerplate in one language, body in another)
    defeat whole-document language ID, and segment-level voting is
    the standard fix (CLD-style chunked classification). Segments
    whose trigrams match no profile (too short, symbols) drop from
    the rollup.

    Returns (id, n_segments, n_langs, langs, mixed): langs is the
    sorted comma-joined distinct predictions; mixed = n_langs > 1.

    Scale shape: one bounded sequence explode per doc for the
    segments + the langid profile join (broadcast) — everything is
    column algebra."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    d = (docs.select(F.col(id_col), toks.alias("_t"))
         .withColumn("_n", F.size("_t"))
         .filter(F.col("_n") > 0))
    starts = F.sequence(F.lit(1), F.col("_n"), F.lit(int(seg_tokens)))
    segs = (d.select(id_col, "_t",
                     F.posexplode(starts).alias("_k", "_s"))
            .select(id_col, (F.col("_k") + 1).alias("_seg"),
                    F.array_join(
                        F.slice(F.col("_t"), F.col("_s"),
                                int(seg_tokens)), " ").alias("text"))
            .withColumn("_sid", F.concat_ws("#", F.col(id_col).cast("string"),
                                            F.col("_seg").cast("string"))))
    pred = langid_trigram(segs.select(F.col("_sid").alias("doc_id"),
                                      "text"), profiles)
    lab = (segs.join(pred.withColumnRenamed("doc_id", "_sid"), "_sid")
           .select(id_col, "pred_lang"))
    return (lab.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_segments"),
                 F.countDistinct("pred_lang").cast("bigint")
                 .alias("n_langs"),
                 F.array_join(F.array_sort(
                     F.collect_set("pred_lang")), ",").alias("langs"))
            .withColumn("mixed", F.col("n_langs") > 1))
