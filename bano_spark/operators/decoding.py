"""Sequence decoding and distributed online learning.

``viterbi_decode`` — exact MAP state-sequence decoding for a hidden
Markov model over per-group ordered observation sequences, with the
model given as INTEGER log-scores (scaled log-probabilities).  The DP
is a pure integer fold, so the decoded path is bit-identical on any
engine and any topology.

``perceptron_ipm`` / ``perceptron_ipm_eval`` — the distributed
(averaged-by-mixing) perceptron of McDonald, Hall & Mann (NAACL 2010,
"Distributed Training Strategies for the Structured Perceptron"):
shard the training set, run the classic sequential perceptron fold
inside each shard, then mix (sum) the per-shard weight vectors.  With
integer features and labels in {-1,+1} every update is integer
arithmetic, and because ``sign(w.x)`` is invariant under positive
scaling, the *summed* mixture classifies identically to the averaged
one — so evaluation is exact too.

Ref parity: the reference resolves conflicting address sources with
hand-tuned sequential rules per commune (bano/core.py rapprochement
loop); an HMM decode over a user's event stream is the probabilistic
generalization of that "best consistent labeling of a sequence", and
the perceptron is the trainable version of its fixed scoring weights
(bano/models.py poids/score fields).

Scale shape (both): one shuffle to group rows by sequence/shard key,
a bounded ``collect_list`` per group (sequences are per-user /
per-shard bounded, NOT corpus-sized), one ``aggregate()`` fold that
runs entirely inside the JVM, then an O(#groups) rollup.  No window
over a global ordering, no driver-side loop, no Python in the hot
path.  At 10^12 events the fold state is O(K^2) per task for Viterbi
and O(d) for the perceptron — constant memory regardless of scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

NEG_INF = -(1 << 40)  # effectively -inf for integer log-scores


def _arr(vals) -> str:
    return "array(" + ", ".join(str(int(v)) + "L" for v in vals) + ")"


def _arr2(mat) -> str:
    return "array(" + ", ".join(_arr(row) for row in mat) + ")"


def viterbi_decode(df: DataFrame, group_col: str, order_col: str,
                   obs_col: str, init: list[int],
                   trans: list[list[int]],
                   emit: list[list[int]]) -> DataFrame:
    """MAP decode per group. ``obs_col`` must already be an integer
    observation index in [0, n_obs_symbols).  ``init[k]``,
    ``trans[i][j]`` and ``emit[j][o]`` are integer log-scores (higher
    is better).  Ties broken toward the LOWER state index (strict-``>``
    fold), identically at init, transition and final argmax.

    Returns one row per group: (group, n_obs, best_score, path) where
    path is the '>'-joined decoded state indices.
    """
    k = len(init)
    assert len(trans) == k and len(emit) == k

    row = F.struct(F.col(order_col).cast("bigint").alias("o"),
                   F.col(obs_col).cast("int").alias("x"))
    per = (df.groupBy(F.col(group_col).alias("k"))
           .agg(F.array_sort(F.collect_list(row)).alias("seq")))

    init_s = _arr(init)
    trans_s = _arr2(trans)
    emit_s = _arr2(emit)

    # Fold state: array of K structs (score, path). Step: for each
    # destination j, pick argmax_i acc[i].score + trans[i][j] (strict >
    # keeps the lowest i), add emit[j][obs]. First element initializes.
    fold = F.expr(f"""
        aggregate(
          seq,
          named_struct(
            'started', false,
            'cells', transform(sequence(0, {k - 1}),
                       j -> named_struct('score', CAST({NEG_INF} AS BIGINT),
                                         'path', CAST('' AS STRING)))),
          (acc, r) -> named_struct(
            'started', true,
            'cells',
            IF(NOT acc.started,
               transform(sequence(0, {k - 1}),
                 j -> named_struct(
                        'score', {init_s}[j] + {emit_s}[j][r.x],
                        'path', CAST(j AS STRING))),
               transform(sequence(0, {k - 1}),
                 j -> aggregate(sequence(0, {k - 1}),
                        named_struct('score', CAST({NEG_INF} AS BIGINT),
                                     'path', CAST('' AS STRING)),
                        (b, i) -> IF(acc.cells[i].score + {trans_s}[i][j]
                                       > b.score,
                                     named_struct(
                                       'score', acc.cells[i].score
                                                  + {trans_s}[i][j],
                                       'path', concat(acc.cells[i].path,
                                                      '>', CAST(j AS STRING))),
                                     named_struct('score', b.score,
                                                  'path', b.path)),
                        b -> named_struct(
                               'score', b.score + {emit_s}[j][r.x],
                               'path', b.path))))),
          acc -> aggregate(acc.cells,
                   named_struct('score', CAST({NEG_INF} AS BIGINT),
                                'path', CAST('' AS STRING)),
                   (b, c) -> IF(c.score > b.score,
                                named_struct('score', c.score,
                                             'path', c.path),
                                named_struct('score', b.score,
                                             'path', b.path)),
                   b -> b))
    """)
    return (per.select(F.col("k").alias(group_col),
                       F.size("seq").cast("bigint").alias("n_obs"),
                       fold.alias("v"))
            .select(group_col, "n_obs",
                    F.col("v.score").alias("best_score"),
                    F.col("v.path").alias("path"))
            .orderBy(group_col))


def decoded_state_obs_counts(decoded: DataFrame, df: DataFrame,
                             group_col: str, order_col: str,
                             obs_col: str) -> DataFrame:
    """Join the decoded path back to the observations positionally and
    count (state, obs) co-occurrences — the empirical emission table of
    the decode.  Positional join via posexplode of the split path vs a
    per-group row_number; both integer-exact."""
    from pyspark.sql import Window

    states = decoded.select(
        group_col,
        F.posexplode(F.split("path", ">")).alias("pos", "state"))
    w = Window.partitionBy(group_col).orderBy(F.col(order_col))
    obs = df.select(group_col, F.col(obs_col).alias("x"),
                    (F.row_number().over(w) - 1).alias("pos"))
    return (states.join(obs, [group_col, "pos"])
            .groupBy(F.col("state").cast("bigint").alias("state"),
                     F.col("x").cast("bigint").alias("obs"))
            .agg(F.count("*").cast("bigint").alias("n"))
            .orderBy("state", "obs"))


def perceptron_ipm(df: DataFrame, shard_col: str, order_col: str,
                   feat_cols: list[str], label_col: str) -> DataFrame:
    """One epoch of the sequential perceptron inside each shard
    (examples visited in ``order_col`` order), integer arithmetic
    throughout: on a mistake or margin-0 hit (y * (w.x) <= 0),
    w += y * x.  Returns one row per shard: (shard, n_examples,
    n_updates, w_0..w_{d-1}).
    """
    d = len(feat_cols)
    row = F.struct(
        F.col(order_col).cast("bigint").alias("o"),
        F.array(*[F.col(c).cast("bigint") for c in feat_cols]).alias("x"),
        F.col(label_col).cast("bigint").alias("y"))
    per = (df.groupBy(F.col(shard_col).alias("shard"))
           .agg(F.array_sort(F.collect_list(row)).alias("ex")))
    fold = F.expr(f"""
        aggregate(
          ex,
          named_struct('w', transform(sequence(1, {d}),
                              i -> CAST(0 AS BIGINT)),
                       'upd', CAST(0 AS BIGINT)),
          (acc, r) -> IF(
            r.y * aggregate(zip_with(acc.w, r.x, (wi, xi) -> wi * xi),
                            CAST(0 AS BIGINT), (s, v) -> s + v) <= 0,
            named_struct('w', zip_with(acc.w, r.x,
                                       (wi, xi) -> wi + r.y * xi),
                         'upd', acc.upd + 1),
            named_struct('w', transform(acc.w, wi -> wi),
                         'upd', acc.upd)),
          acc -> acc)
    """)
    out = per.select("shard", F.size("ex").cast("bigint").alias("n_examples"),
                     fold.alias("m"))
    cols = [F.col("m.w")[i].alias(f"w_{i}") for i in range(d)]
    return (out.select("shard", "n_examples",
                       F.col("m.upd").alias("n_updates"), *cols)
            .orderBy("shard"))


def perceptron_ipm_eval(df: DataFrame, shard_weights: DataFrame,
                        feat_cols: list[str],
                        label_col: str) -> DataFrame:
    """Evaluate the MIXED (summed) per-shard weight vector on the full
    training set.  sign(w.x) with the 0 boundary predicting -1 (strict
    > 0 for +1) — exact integers, so the confusion counts are exact.
    The mixed vector is a d-element broadcast join (a 1-row frame)."""
    d = len(feat_cols)
    mix = shard_weights.agg(
        *[F.sum(f"w_{i}").cast("bigint").alias(f"mw_{i}")
          for i in range(d)])
    scored = df.crossJoin(F.broadcast(mix)).withColumn(
        "score",
        sum(F.col(f"mw_{i}") * F.col(feat_cols[i]).cast("bigint")
            for i in range(d)))
    pred = F.when(F.col("score") > 0, F.lit(1)).otherwise(F.lit(-1))
    y = F.col(label_col).cast("bigint")
    return scored.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when((pred == 1) & (y == 1), 1).otherwise(0))
        .cast("bigint").alias("tp"),
        F.sum(F.when((pred == 1) & (y == -1), 1).otherwise(0))
        .cast("bigint").alias("fp"),
        F.sum(F.when((pred == -1) & (y == -1), 1).otherwise(0))
        .cast("bigint").alias("tn"),
        F.sum(F.when((pred == -1) & (y == 1), 1).otherwise(0))
        .cast("bigint").alias("fn"),
        F.round(F.sum(F.when(pred == y, 1).otherwise(0))
                / F.count("*"), 6).alias("accuracy"))
