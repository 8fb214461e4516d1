"""Multinomial Naive Bayes with quantized integer log-scores.

The classic text classifier (McCallum & Nigam 1998) trained and
evaluated entirely relationally: per-(class, token) Laplace-smoothed
log-probabilities and per-class log-priors are QUANTIZED to integer
micro-nats (round(ln(p) * 1e6)), so per-document scores are integer
SUMS — associative, order-free, bit-identical on any topology — and
the argmax is exact with an explicit (score DESC, class ASC)
tie-break.  The only floats ever computed are single ln() calls on
identical rationals; quantization noise (<= 5e-7 nats/token) is
documented and shared with the oracle.

Ref parity: the reference decides each address's source by fixed
per-source priority weights (bano/core.py rapprochement order); NB is
the learned version — evidence-weighted voting per token.

Scale shape: training is two hash aggregations (token counts by
(class, token); class totals) — map-side combinable, the shuffle
carries (class, token, count), never documents.  Scoring joins the
exploded test tokens to the broadcast-or-shuffled model keyed by
token, aggregates by (doc, class), and picks the per-doc argmax with
a window over <= n_classes rows per doc.  Nothing quadratic, no
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SCALE = 1_000_000


def _tokens(df: DataFrame, id_col: str, label_col: str,
            text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc"), F.col(label_col).alias("label"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                          r"\s+")).alias("tok")).filter(F.col("tok")
                                                        != "")


def naive_bayes_predictions(docs: DataFrame, *, id_col: str = "doc_id",
                            label_col: str = "lang",
                            text_col: str = "text",
                            split_mod: int = 3) -> DataFrame:
    """Train on id % split_mod != 0, score id % split_mod == 0.
    Returns one row per test doc: (doc, label, pred, score)."""
    train = docs.filter(F.col(id_col) % split_mod != 0)
    test = docs.filter(F.col(id_col) % split_mod == 0)

    ttok = _tokens(train, id_col, label_col, text_col)
    counts = (ttok.groupBy("label", "tok")
              .agg(F.count("*").cast("bigint").alias("c")))
    totals = (counts.groupBy("label")
              .agg(F.sum("c").cast("bigint").alias("t")))
    vocab = counts.select("tok").distinct().agg(
        F.count("*").cast("bigint").alias("v"))
    ndocs = (train.groupBy(F.col(label_col).alias("label"))
             .agg(F.count("*").cast("bigint").alias("nl")))
    ntot = train.agg(F.count("*").cast("bigint").alias("n"))

    lnq = (F.round(F.log(F.col("c1").cast("double")
                         / F.col("tv").cast("double")) * SCALE)
           .cast("bigint"))
    model = (counts.join(totals, "label").crossJoin(F.broadcast(vocab))
             .select("label", "tok",
                     (F.col("c") + 1).alias("c1"),
                     (F.col("t") + F.col("v")).alias("tv"))
             .select("label", "tok", lnq.alias("w")))
    classes = (totals.join(ndocs, "label")
               .crossJoin(F.broadcast(vocab))
               .crossJoin(F.broadcast(ntot))
               .select(
                   "label",
                   F.round(F.log(F.lit(1.0)
                                 / (F.col("t") + F.col("v"))
                                 .cast("double")) * SCALE)
                   .cast("bigint").alias("d"),
                   F.round(F.log(F.col("nl").cast("double")
                                 / F.col("n").cast("double")) * SCALE)
                   .cast("bigint").alias("prior")))

    stok = _tokens(test, id_col, label_col, text_col)
    cand = (stok.crossJoin(F.broadcast(
                classes.select(F.col("label").alias("cls"),
                               "d", "prior")))
            .join(model.select(F.col("label").alias("cls"),
                               "tok", "w"), ["cls", "tok"], "left")
            .groupBy("doc", "label", "cls", "prior")
            .agg(F.sum(F.coalesce(F.col("w"), F.col("d")))
                 .cast("bigint").alias("tsum")))
    scored = cand.select("doc", "label", "cls",
                         (F.col("prior") + F.col("tsum")).alias("score"))
    w = Window.partitionBy("doc").orderBy(F.col("score").desc(),
                                          F.col("cls").asc())
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc", "label", F.col("cls").alias("pred"),
                    "score"))


def naive_bayes_confusion(docs: DataFrame, **kw) -> DataFrame:
    pred = naive_bayes_predictions(docs, **kw)
    return (pred.groupBy(F.col("label").alias("true_lang"),
                         F.col("pred").alias("pred_lang"))
            .agg(F.count("*").cast("bigint").alias("n"))
            .orderBy("true_lang", "pred_lang"))


def naive_bayes_class_metrics(docs: DataFrame, **kw) -> DataFrame:
    pred = naive_bayes_predictions(docs, **kw)
    per_true = (pred.groupBy(F.col("label").alias("cls"))
                .agg(F.count("*").cast("bigint").alias("n_true"),
                     F.sum(F.when(F.col("pred") == F.col("label"), 1)
                           .otherwise(0)).cast("bigint").alias("tp")))
    per_pred = (pred.groupBy(F.col("pred").alias("cls"))
                .agg(F.count("*").cast("bigint").alias("n_pred")))
    j = per_true.join(per_pred, "cls", "left").fillna(0, ["n_pred"])
    prec = F.when(F.col("n_pred") > 0,
                  F.col("tp") / F.col("n_pred")).otherwise(F.lit(0.0))
    rec = F.col("tp") / F.col("n_true")
    f1 = F.when(F.col("tp") > 0,
                2.0 * prec * rec / (prec + rec)).otherwise(F.lit(0.0))
    return (j.select(F.col("cls").alias("lang"), "n_true", "n_pred",
                     "tp",
                     (F.round(prec, 6) + F.lit(0.0)).alias("precision"),
                     (F.round(rec, 6) + F.lit(0.0)).alias("recall"),
                     (F.round(f1, 6) + F.lit(0.0)).alias("f1"))
            .orderBy("lang"))
