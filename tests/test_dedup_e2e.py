"""Kernel tests for wave 154: stage precedence and each drop rule of
the composed exact -> LSH -> winnow -> budget lineage on a hand-built
corpus with known outcomes."""

from __future__ import annotations

from bano_spark.operators.dedup_e2e import corpus_dedup_e2e

LONG_A = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")
LONG_B = ("one two three four five six seven eight nine ten eleven "
          "twelve thirteen fourteen fifteen sixteen seventeen")


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, s, len(t)) for i, t, s in rows],
        "doc_id: bigint, text: string, source: string, n_chars: bigint")


def test_exact_stage_wins_precedence(spark):
    # ids 1 and 2 are byte-identical: 2 must be exact_dup even though
    # it would also be an LSH/winnow duplicate of 1
    df = _docs(spark, [(1, LONG_A, "s"), (2, LONG_A, "s"),
                       (3, LONG_B, "s")])
    out = {r.doc_id: r.stage for r in
           corpus_dedup_e2e(df, budget_words=10**6).collect()}
    assert out == {1: "kept", 2: "exact_dup", 3: "kept"}


def test_minhash_stage_links_to_min_survivor(spark):
    # 11 is LONG_A with one token changed: same 3-shingle stream for
    # most positions -> shares a band with 1 -> minhash_dup
    near = LONG_A.replace("omicron", "OMICRON-VARIANT")
    df = _docs(spark, [(1, LONG_A, "s"), (11, near, "s"),
                       (3, LONG_B, "s")])
    out = {r.doc_id: r.stage for r in
           corpus_dedup_e2e(df, budget_words=10**6).collect()}
    assert out[1] == "kept" and out[3] == "kept"
    assert out[11] == "minhash_dup"


def test_budget_prefix_cutoff_per_source(spark):
    # three distinct docs in one source, 22/17/22 words, budget 40:
    # order is n_chars DESC; the cumulative sum crosses 40 at the
    # second doc -> everything from there drops as 'budget'
    third = ("red orange yellow green blue indigo violet cyan "
             "magenta pearl amber coral jade onyx quartz slate "
             "topaz ruby opal flint ash birch")
    df = _docs(spark, [(1, LONG_A, "s"), (2, LONG_B, "s"),
                       (3, third, "s")])
    out = {r.doc_id: r.stage for r in
           corpus_dedup_e2e(df, budget_words=40).collect()}
    kept = [k for k, v in out.items() if v == "kept"]
    dropped = [k for k, v in out.items() if v == "budget"]
    assert len(kept) >= 1 and len(dropped) >= 1
    assert len(kept) + len(dropped) == 3
    # the longest doc (first in n_chars DESC order) always survives a
    # budget >= its own length
    row = {r.doc_id: r for r in
           corpus_dedup_e2e(df, budget_words=40).collect()}
    longest = max(row, key=lambda i: (len({1: LONG_A, 2: LONG_B,
                                           3: third}[i]), -i))
    assert row[longest].stage == "kept"


def test_short_docs_never_winnow_dropped(spark):
    # < 16 chars -> no char grams -> no anchors -> NULL min
    # comparison must not drop them
    df = _docs(spark, [(1, "tiny", "s"), (2, "small", "s"),
                       (3, LONG_A, "s")])
    out = {r.doc_id: r.stage for r in
           corpus_dedup_e2e(df, budget_words=10**6).collect()}
    assert out == {1: "kept", 2: "kept", 3: "kept"}
