"""Exact set-similarity self-join via prefix filtering (AllPairs).

MinHash-LSH (`operators/dedup.py`) finds near-duplicate pairs
PROBABILISTICALLY; this operator finds every pair with token-set
Jaccard >= tau EXACTLY, using the AllPairs/PPJoin prefix-filtering
bound (Bayardo et al. 2007, public formulation): order each document's
distinct tokens by global rarity; if jaccard(A, B) >= tau then A and B
must share a token among their first |d| - ceil(tau*|d|) + 1 rarest
tokens. Candidate generation is therefore an equi-join on PREFIX
tokens only — the rare end of the vocabulary — instead of an all-pairs
product or a join on every token (whose hot end is the stopword
blowup).

Scale shape (10^9 docs):
  - the global token order is (df, token) — one vocabulary-sized
    aggregate, joined back by token (vocabulary joins are the small
    side: broadcast-able far beyond 10^9 docs).
  - candidates come from ONE equi-join on prefix tokens; prefix
    tokens are rare by construction (df-ascending order), so bucket
    sizes are bounded by rare-token df, not corpus size. The
    candidate count is the algorithm's output-sensitivity term —
    standard practice layers a band-cap disclosure like
    `minhash_lsh_safe_pairs` when tau is low.
  - verification joins each candidate pair to the two docs'
    sorted-token arrays (co-partitioned on doc id) and computes
    |A∩B| via `array_intersect` — per-pair work O(|A|+|B|), pure
    codegen, no Python.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F


def allpairs_jaccard(docs: DataFrame, tau: float, *,
                     id_col: str = "doc_id", text_col: str = "text",
                     round_to: int = 6) -> DataFrame:
    """All pairs (a, b), a < b, with Jaccard(tokens(a), tokens(b)) >=
    tau over DISTINCT whitespace tokens. Returns (id_a, id_b, jac)."""
    tok = (docs.select(F.col(id_col),
                       F.explode(F.split(F.col(text_col), r"\s+"))
                       .alias("term"))
           .filter(F.col("term") != "")
           .distinct())

    # global rarity order: the lexicographic pair (df asc, term asc) IS
    # a deterministic total order over tokens — no dense integer rank
    # (and so no single-partition global window) is ever needed: the
    # per-doc ordering sorts by the pair, and candidate equality joins
    # on the token itself (rank and term are 1:1)
    vocab = tok.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # no broadcast hint: vocabularies are usually small enough that
    # AQE broadcasts on its own, but a web-scale token universe (ids,
    # hashes, typos) is not — forcing the hint would drive the driver
    # into the 8 GB broadcast wall; let the optimizer size it
    ranked = tok.join(vocab, "term")

    sized = ranked.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
    # prefix length p = n - ceil(tau * n) + 1; positions per doc in
    # (df, term) order — a PARTITIONED window, parallel across docs
    pref = (sized.withColumn(
        "pos", F.row_number().over(
            Window.partitionBy(id_col).orderBy(F.asc("df"), F.asc("term"))))
        .filter(F.col("pos")
                <= F.col("n") - F.ceil(F.lit(tau) * F.col("n")) + 1))

    cand = (pref.alias("a").join(
        pref.alias("b"),
        (F.col("a.term") == F.col("b.term"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"))
        .distinct())

    sets = (ranked.groupBy(id_col)
            .agg(F.array_sort(F.collect_set("term")).alias("toks"),
                 F.count(F.lit(1)).alias("n")))
    out = (cand
           .join(sets.select(F.col(id_col).alias("id_a"),
                             F.col("toks").alias("ta"),
                             F.col("n").alias("na")), "id_a")
           .join(sets.select(F.col(id_col).alias("id_b"),
                             F.col("toks").alias("tb"),
                             F.col("n").alias("nb")), "id_b")
           .withColumn("inter",
                       F.size(F.array_intersect("ta", "tb")).cast("double"))
           .withColumn("_jac_raw",
                       F.col("inter")
                       / (F.col("na") + F.col("nb") - F.col("inter")))
           # threshold on the RAW ratio (ints in, identical double
           # out in any engine); round only for display
           .filter(F.col("_jac_raw") >= tau)
           .select("id_a", "id_b",
                   F.round("_jac_raw", round_to).alias("jac")))
    return out


def _prefix_len(n: int, tau: float) -> int:
    """Python mirror of the prefix bound (for tests)."""
    return n - math.ceil(tau * n) + 1


def containment_pairs(docs: DataFrame, tau: float, *,
                      id_col: str = "doc_id", text_col: str = "text",
                      round_to: int = 6) -> DataFrame:
    """Directed near-CONTAINMENT pairs: (a, b), a != b, with
    C(a in b) = |tokens(a) & tokens(b)| / |tokens(a)| >= tau.

    Jaccard misses doc-in-doc inclusion (a snippet quoted inside a
    long page has tiny Jaccard but containment ~1) — the asymmetric
    twin every dedup stack carries next to the symmetric one.

    Prefix filter for containment (Bayardo et al. 2007 adapted): if
    C(a in b) >= tau then a misses at most floor((1-tau)*|a|) of its
    own tokens in b, so among a's first floor((1-tau)*|a|) + 1 RAREST
    tokens at least one appears in b. Candidates = equi-join of a's
    prefix tokens against b's FULL token lists — but only postings of
    a-prefix terms (the rare end of the vocabulary) are ever touched,
    so bucket sizes stay bounded by rare-token df exactly as in
    :func:`allpairs_jaccard`."""
    tok = (docs.select(F.col(id_col),
                       F.explode(F.split(F.col(text_col), r"\s+"))
                       .alias("term"))
           .filter(F.col("term") != "")
           .distinct())
    vocab = tok.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    ranked = tok.join(vocab, "term")

    sized = ranked.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
    pref = (sized.withColumn(
        "pos", F.row_number().over(
            Window.partitionBy(id_col).orderBy(F.asc("df"), F.asc("term"))))
        # +1e-9 before floor: in doubles (1 - 0.9) * 50 is
        # 4.999999999999999, which would floor to 4 and cut the prefix
        # one token short of the bound. Lengthening is always SAFE
        # (more candidates, same exact final filter); shortening loses
        # pairs.
        .filter(F.col("pos")
                <= F.floor(F.lit(1.0 - tau) * F.col("n") + F.lit(1e-9)) + 1))

    cand = (pref.alias("a").join(
        ranked.alias("b"),
        (F.col("a.term") == F.col("b.term"))
        & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"))
        .distinct())

    sets = (ranked.groupBy(id_col)
            .agg(F.array_sort(F.collect_set("term")).alias("toks"),
                 F.count(F.lit(1)).alias("n")))
    return (cand
            .join(sets.select(F.col(id_col).alias("id_a"),
                              F.col("toks").alias("ta"),
                              F.col("n").alias("na")), "id_a")
            .join(sets.select(F.col(id_col).alias("id_b"),
                              F.col("toks").alias("tb")), "id_b")
            .withColumn("inter",
                        F.size(F.array_intersect("ta", "tb")).cast("double"))
            .withColumn("_c_raw", F.col("inter") / F.col("na"))
            .filter(F.col("_c_raw") >= tau)
            .select("id_a", "id_b",
                    F.round("_c_raw", round_to).alias("containment")))
