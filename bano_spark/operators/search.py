"""Full-text retrieval over the documents table: inverted index + BM25.

A training-data pipeline needs corpus-level retrieval for targeted
decontamination, near-query filtering, and seeded quality curation;
these two operators are the standard pair (a postings index and the
BM25 ranking function, Robertson & Spärck Jones / Okapi — public
formulations).

Scale shape (10^10 docs):
  - tokenisation is a codegen split+explode — no Python anywhere.
  - the postings build is ONE shuffle on (term, doc) for tf, then one
    on term; both benefit from map-side partial aggregation. The
    per-term posting list is the only unbounded term: `max_df` drops
    stopword-class terms (df above the cap) BEFORE the list is
    assembled — the drop is disclosed by `df` itself, not silent, and
    mirrors production stoplist practice (a posting list of half the
    corpus is useless for retrieval and quadratic to materialize).
  - BM25 scores only the query terms: the tf scan filters on the
    term literal set FIRST (predicate pushdown into the explode), so
    the shuffle carries O(docs_containing_query_terms) rows, not the
    corpus. The df/idf side is O(|query|) and broadcast. Top-k is
    orderBy+limit — Spark plans TakeOrderedAndProject (per-partition
    heap + driver merge of k rows), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_TOKEN_SPLIT = r"\s+"


def _term_freqs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, term, tf) via codegen split/explode; empty tokens dropped."""
    return (docs
            .select(F.col(id_col),
                    F.explode(F.split(F.col(text_col), _TOKEN_SPLIT))
                    .alias("term"))
            .filter(F.col("term") != "")
            .groupBy(id_col, "term")
            .agg(F.count(F.lit(1)).alias("tf")))


def inverted_index(docs: DataFrame, *, id_col: str = "doc_id",
                   text_col: str = "text",
                   max_df: int | None = None) -> DataFrame:
    """Build a postings table: one row per term with document
    frequency, total term frequency, and the doc-ordered posting list
    serialized as "id:tf,id:tf,..." (a deterministic, engine-neutral
    encoding — an array<struct> would be equivalent but hashes
    differently across engines).

    ``max_df`` (optional) drops terms whose df exceeds the cap after
    counting — df/total_tf are still exact for kept terms.
    """
    tf = _term_freqs(docs, id_col, text_col)
    idx = (tf.groupBy("term")
           .agg(F.count(F.lit(1)).cast("bigint").alias("df"),
                F.sum("tf").cast("bigint").alias("total_tf"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct(F.col(id_col).alias("id"), "tf"))),
                        lambda s: F.concat_ws(":", s["id"], s["tf"])),
                    ",").alias("postings")))
    if max_df is not None:
        idx = idx.filter(F.col("df") <= max_df)
    return idx


def bm25_topk(docs: DataFrame, query_terms: list[str], *, k: int = 20,
              id_col: str = "doc_id", text_col: str = "text",
              k1: float = 1.2, b: float = 0.75,
              round_to: int = 6) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25:

        score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
        idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))

    dl = whitespace token count of the document, avgdl its corpus
    mean, N the corpus size. Scores are rounded to ``round_to``
    decimals and ties broken by ascending doc id, so the top-k is
    deterministic and engine-reproducible.
    """
    terms = sorted(set(query_terms))
    dl = (docs.select(
        F.col(id_col),
        F.size(F.filter(F.split(F.col(text_col), _TOKEN_SPLIT),
                        lambda t: t != "")).cast("double").alias("dl")))
    stats = dl.agg(F.count(F.lit(1)).cast("double").alias("n"),
                   F.avg("dl").alias("avgdl"))

    # tf restricted to query terms BEFORE any shuffle
    tf = (_term_freqs(
        docs.select(id_col, text_col), id_col, text_col)
        .filter(F.col("term").isin(terms)))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))

    scored = (tf
              .join(F.broadcast(df_t), "term")
              .join(dl, id_col)
              .crossJoin(F.broadcast(stats))
              .withColumn(
                  "_idf",
                  F.log(F.lit(1.0) + (F.col("n") - F.col("df") + 0.5)
                        / (F.col("df") + 0.5)))
              .withColumn(
                  "_s",
                  F.col("_idf") * F.col("tf") * (k1 + 1.0)
                  / (F.col("tf") + k1 * (1.0 - b
                                         + b * F.col("dl") / F.col("avgdl"))))
              .groupBy(id_col)
              .agg(F.round(F.sum("_s"), round_to).alias("score")))
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def phrase_search(docs: DataFrame, phrases: DataFrame, *,
                  text_col: str = "text", phrase_col: str = "phrase",
                  qid_col: str = "qid") -> DataFrame:
    """Exact positional phrase matching — the inverted-index member
    classic term search (bm25_topk, inverted_index) can't express:
    a doc matches a phrase when every phrase term appears at
    consecutive positions. The standard positional-postings algebra:
    align each (term, phrase-offset) posting pair on (doc,
    start = pos - offset) and keep starts covered by ALL phrase
    terms.

    Scale shape: the phrase table is tiny (broadcast); postings join
    query terms FIRST (query-term pushdown — only matching terms'
    postings survive the scan), then one groupBy(qid, doc, start)
    counting coverage. Duplicate phrase terms are weighted by their
    multiplicity so 'a b a' needs BOTH a-positions. Returns
    (qid, doc_id, n_matches) for docs with >= 1 match."""
    post = (docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.lower(text_col)), r"\s+"))
        .alias("p", "w"))
        .filter(F.col("w") != ""))
    q = (phrases.select(
        F.col(qid_col).alias("_q"),
        F.posexplode(F.split(F.trim(F.lower(phrase_col)), r"\s+"))
        .alias("_qp", "w")))
    qlen = q.groupBy("_q").agg(F.count(F.lit(1)).alias("_qlen"))
    hits = (post.join(F.broadcast(q), "w")
            .select("_q", "doc_id", (F.col("p") - F.col("_qp"))
                    .alias("_start"), "_qp"))
    # a start matches when all _qlen offsets are covered (offsets are
    # distinct by construction, so count == qlen is exact coverage)
    cover = (hits.groupBy("_q", "doc_id", "_start")
             .agg(F.countDistinct("_qp").alias("_cov"))
             .join(F.broadcast(qlen), "_q")
             .filter((F.col("_cov") == F.col("_qlen"))
                     & (F.col("_start") >= 0)))
    return (cover.groupBy(F.col("_q").alias(qid_col),
                          F.col("doc_id"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_matches")))


def prf_expand(docs: DataFrame, query_terms: list[str], *,
               fb_docs: int = 10, expand_n: int = 8,
               id_col: str = "doc_id", text_col: str = "text",
               round_to: int = 6) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (the RM1-lite step
    of every classic IR stack): run BM25 for the query, take the top
    ``fb_docs`` feedback documents, and score candidate expansion
    terms by feedback-set term frequency x corpus idf
    (ln((N+1)/(df+1))), excluding the original query terms. Returns
    the ``expand_n`` best (term, fb_tf, df, score) rows — score
    rounded, ties to ascending term, so the expansion is
    deterministic in any engine.

    Scale shape: BM25's own discipline (query-term pushdown before
    any shuffle) + one semi-join of term rows against the tiny
    feedback id set + a broadcast df table; the final top-n is a
    TakeOrdered, never a global sort."""
    top = bm25_topk(docs, query_terms, k=fb_docs,
                    id_col=id_col, text_col=text_col)
    fb_ids = top.select(id_col)
    term_rows = (docs.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(text_col)), r"\s+"))
        .alias("term"))
        .filter(F.col("term") != ""))
    n_docs = docs.select(id_col).distinct().count()
    df_t = (term_rows.select(id_col, "term").distinct()
            .groupBy("term").agg(F.count(F.lit(1)).alias("df")))
    qset = sorted(set(t.lower() for t in query_terms))
    fb_tf = (term_rows.join(F.broadcast(fb_ids), id_col)
             .filter(~F.col("term").isin(qset))
             .groupBy("term").agg(F.count(F.lit(1)).alias("fb_tf")))
    scored = (fb_tf.join(df_t, "term")
              .select("term",
                      F.col("fb_tf").cast("bigint").alias("fb_tf"),
                      F.col("df").cast("bigint").alias("df"),
                      F.round(F.col("fb_tf")
                              * F.log((float(n_docs) + 1.0)
                                      / (F.col("df") + 1.0)),
                              round_to).alias("score")))
    return scored.orderBy(F.desc("score"), F.asc("term")).limit(expand_n)


def ql_dirichlet_topk(docs: DataFrame, query_terms: list[str], *,
                      k: int = 20, mu: float = 2000.0,
                      id_col: str = "doc_id", text_col: str = "text",
                      round_to: int = 6) -> DataFrame:
    """Top-k documents under query-likelihood ranking with
    Dirichlet-prior smoothing (Zhai & Lafferty 2001), the standard LM
    alternative to BM25, in its rank-equivalent matched-term form:

        score(d) = sum_{t in q, tf>0} ln(1 + tf / (mu * cf_t / C))
                   + |q| * ln(mu / (dl + mu))

    with cf_t the corpus frequency of term t, C the total corpus
    token count, dl the document length. Candidates are documents
    matching at least one query term (the standard top-k candidate
    contract — a no-match document can never outrank a match under
    this form; disclosed).

    Scale shape mirrors bm25_topk: the tf scan filters on the query
    term literals BEFORE any shuffle, cf/C are O(|q|)+O(1) broadcast
    scalars, and top-k plans TakeOrderedAndProject."""
    terms = sorted(set(query_terms))
    nq = float(len(terms))
    dl = (docs.select(
        F.col(id_col),
        F.size(F.filter(F.split(F.col(text_col), _TOKEN_SPLIT),
                        lambda t: t != "")).cast("double").alias("dl")))
    ctot = dl.agg(F.sum("dl").alias("ctot"))
    tf = (_term_freqs(docs.select(id_col, text_col), id_col, text_col)
          .filter(F.col("term").isin(terms)))
    cf = tf.groupBy("term").agg(F.sum("tf").cast("double").alias("cf"))
    scored = (tf
              .join(F.broadcast(cf), "term")
              .crossJoin(F.broadcast(ctot))
              .withColumn(
                  "_p",
                  F.log(F.lit(1.0)
                        + F.col("tf") / (mu * F.col("cf")
                                         / F.col("ctot"))))
              .groupBy(id_col)
              .agg(F.sum("_p").alias("_m"))
              .join(dl, id_col)
              .select(F.col(id_col),
                      F.round(F.col("_m")
                              + nq * F.log(F.lit(mu)
                                           / (F.col("dl") + mu)),
                              round_to).alias("score")))
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def rrf_fuse(list_a: DataFrame, list_b: DataFrame, *,
             id_col: str = "doc_id", c: float = 60.0, k: int = 20,
             round_to: int = 6) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of
    two bounded ranked lists (id, score) — the standard hybrid
    retrieval combiner (e.g. BM25 + a second ranker):

        rrf(d) = sum_r 1 / (c + rank_r(d))

    ranks 1-based by (score desc, id asc) WITHIN each list; a
    document missing from a list contributes nothing for it.

    Scale shape: inputs are top-k lists (k rows each, already
    TakeOrdered); ranks are derived with a broadcast non-equi
    strictly-better count over the k-row list (<= k^2 comparisons,
    BuildRight nested loop) — never a global window, so no
    SinglePartition exchange."""
    def _rank(df: DataFrame, out: str) -> DataFrame:
        x = df.select(F.col(id_col).alias("_id"),
                      F.col("score").alias("_s"))
        y = x.select(F.col("_id").alias("_jd"), F.col("_s").alias("_js"))
        return (x.join(F.broadcast(y),
                       (F.col("_js") > F.col("_s"))
                       | ((F.col("_js") == F.col("_s"))
                          & (F.col("_jd") < F.col("_id"))), "left")
                .groupBy("_id")
                .agg((F.count("_jd") + 1).cast("bigint").alias(out)))
    ra = _rank(list_a, "rank_a")
    rb = _rank(list_b, "rank_b")
    fused = (ra.join(rb, "_id", "full_outer")
             .select(F.col("_id").alias(id_col), "rank_a", "rank_b",
                     F.round(
                         F.coalesce(F.lit(1.0) / (F.lit(c)
                                                  + F.col("rank_a")),
                                    F.lit(0.0))
                         + F.coalesce(F.lit(1.0) / (F.lit(c)
                                                    + F.col("rank_b")),
                                      F.lit(0.0)),
                         round_to).alias("rrf_score")))
    return fused.orderBy(F.desc("rrf_score"), F.asc(id_col)).limit(k)


def rank_biased_overlap(list_a: DataFrame, list_b: DataFrame, *,
                        id_col: str = "doc_id", k: int = 20,
                        p: float = 0.9,
                        round_to: int = 6) -> DataFrame:
    """Extrapolated rank-biased overlap (Webber, Moffat & Zobel 2010)
    of two top-k rankings — the top-weighted indefinite-ranking
    similarity used to compare retrieval systems:

        RBO_ext = (X_k / k) p^k + (1-p)/p * sum_{d=1..k} (X_d / d) p^d

    with X_d the overlap of the two depth-d prefixes. Ranks are
    1-based by (score desc, id asc) within each list.

    Scale shape: both inputs are k-row TakeOrdered lists; ranks come
    from the same broadcast strictly-better count as rrf_fuse, the
    prefix-overlap counts from a broadcast depth x pair non-equi join
    (<= k^2 rows) — bounded arithmetic, no global window. Returns one
    row (k, overlap_k, rbo_ext)."""
    spark = list_a.sparkSession

    def _rank(df: DataFrame, out: str) -> DataFrame:
        x = df.select(F.col(id_col).alias("_id"),
                      F.col("score").alias("_s"))
        y = x.select(F.col("_id").alias("_jd"), F.col("_s").alias("_js"))
        return (x.join(F.broadcast(y),
                       (F.col("_js") > F.col("_s"))
                       | ((F.col("_js") == F.col("_s"))
                          & (F.col("_jd") < F.col("_id"))), "left")
                .groupBy("_id")
                .agg((F.count("_jd") + 1).cast("bigint").alias(out)))

    pairs = (_rank(list_a, "ra").join(_rank(list_b, "rb"), "_id")
             .select(F.greatest("ra", "rb").alias("_m")))
    depths = spark.range(1, k + 1).select(F.col("id").alias("_d"))
    xd = (depths.join(F.broadcast(pairs), F.col("_m") <= F.col("_d"),
                      "left")
          .groupBy("_d")
          .agg(F.count("_m").cast("double").alias("_x")))
    agg = xd.agg(
        F.sum((F.col("_x") / F.col("_d"))
              * F.pow(F.lit(p), F.col("_d"))).alias("_s"),
        F.max(F.when(F.col("_d") == k, F.col("_x"))).alias("_xk"))
    return agg.select(
        F.lit(k).cast("bigint").alias("k"),
        F.col("_xk").cast("bigint").alias("overlap_k"),
        F.round((F.col("_xk") / k) * F.lit(p) ** k
                + (1.0 - p) / p * F.col("_s"), round_to)
        .alias("rbo_ext"))
