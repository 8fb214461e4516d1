"""Kernel tests for wave 150: stage precedence, dedup keeps the
smallest id, budget greediness, and funnel conservation."""

from __future__ import annotations

from bano_spark.operators.curation import curation_funnel, curation_plan


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id: bigint, text: string, lang: string, "
              "source: string, n_chars: bigint")


def _doc(i, text, lang="en", source="s", n_chars=None):
    return (i, text, lang, source,
            n_chars if n_chars is not None else len(text) + 100)


def test_stage_precedence_and_reasons(spark):
    rows = [
        _doc(1, "alpha beta gamma delta eps one two", lang="fr"),
        _doc(2, "alpha beta gamma delta eps one two", n_chars=10),
        _doc(3, "rep rep rep rep rep rep rep rep rep rep"),  # low div
        _doc(4, "alpha beta gamma delta eps one two"),
        _doc(5, "alpha beta gamma delta eps other tail"),  # same pfx
    ]
    got = {r["doc_id"]: r for r in
           curation_plan(_df(spark, rows)).collect()}
    assert got[1]["drop_reason"] == "lang"
    assert got[2]["drop_reason"] == "quality"
    assert got[3]["drop_reason"] == "quality"
    assert got[4]["kept"] and got[4]["drop_reason"] is None
    assert got[5]["drop_reason"] == "duplicate"  # 4 < 5, same prefix


def test_budget_greedy_by_length(spark):
    # three long distinct docs, budget 300 words: longest kept first
    def words(n, tag):
        return " ".join(f"{tag}{i}" for i in range(n))
    rows = [_doc(1, words(150, "a"), n_chars=500),
            _doc(2, words(150, "b"), n_chars=400),
            _doc(3, words(150, "c"), n_chars=300)]
    got = {r["doc_id"]: r for r in
           curation_plan(_df(spark, rows),
                         budget_words=300).collect()}
    assert got[1]["kept"] and got[2]["kept"]
    assert got[3]["drop_reason"] == "budget"


def test_funnel_conserves_docs(spark):
    rows = [_doc(i, " ".join(f"w{i}_{j}" for j in range(20)),
                 lang=("en" if i % 2 else "de"))
            for i in range(1, 21)]
    fun = curation_funnel(_df(spark, rows)).collect()
    assert sum(r["n_docs"] for r in fun) == 20
    stages = {r["stage"] for r in fun}
    assert "lang" in stages and "kept" in stages
