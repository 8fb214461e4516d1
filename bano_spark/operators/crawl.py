"""Crawl-infrastructure operators: registrable-domain (public-suffix
longest-match), robots.txt longest-prefix decisions, politeness
frontier scheduling, and link-graph extraction from raw HTML.

The reference pipeline harvests its sources from the open web (ref
`bano/sources/cadastre_gouv.py:14-45` scrapes per-department pages);
these operators are the Spark-native generalization a 100 TB
Common-Crawl-style corpus needs: every one is a broadcast equi-join
or a per-host window — no global windows, no per-row Python.

Scale shape:
- ``registrable_domain``: candidate suffixes are the last 1..3 labels
  of each host (a bounded explode, <=3 rows/host), joined broadcast
  against the public-suffix table (~9k rows in production), longest
  match picked by one max_by per row id. No shuffle beyond the final
  groupBy(id) — and that groupBy is map-side combinable.
- ``robots_decide``: the rule table (one site's robots.txt rules,
  thousands at most per host, millions overall) is deduped then
  broadcast; the prefix test is ``substr(path, 1, len(prefix)) =
  prefix`` evaluated inside the join, so codegen keeps it JVM-side.
  Longest-prefix-wins via max_by over (prefix_len, !allow) — the
  disallow-wins tiebreak of the Google robots.txt spec's "least
  restrictive on tie" INVERTED deliberately: a conservative crawler
  treats a tied allow/disallow as disallow (documented choice).
- ``frontier_waves``: one window per host (politeness: wave k = the
  k-th fetch from that host), never a global row_number — the global
  schedule is (wave, priority DESC) which any range-partitioned sort
  realizes without a single-partition exchange.
- ``extract_links``: regexp_extract_all (JVM codegen) + explode; the
  HTML column never crosses into Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def suffix_candidates(host_col: str, max_labels: int = 3) -> Column:
    """Array of the last 1..max_labels dot-joined label groups of a
    host — the candidate public suffixes, longest first.
    'h1.d4.co.uk' -> ['d4.co.uk', 'co.uk', 'uk'] (max_labels=3)."""
    parts = F.split(F.col(host_col), r"\.")
    n = F.size(parts)
    return F.filter(
        F.transform(
            F.sequence(F.lit(1), F.least(n, F.lit(max_labels))),
            lambda k: F.array_join(F.slice(parts, n - k + 1, k), "."),
        ),
        lambda s: s != "",
    )


def registrable_domain(df: DataFrame, suffixes: DataFrame,
                       host_col: str = "host",
                       id_col: str = "doc_id") -> DataFrame:
    """Longest public-suffix match per host: returns
    (id, host, suffix, registrable) where registrable is the label
    immediately left of the matched suffix joined back on
    ('example' + '.co.uk'). Hosts matching no suffix are dropped
    (unknown TLD — production crawlers quarantine these).

    ``suffixes`` must have a single 'suffix' string column; it is
    always broadcast (the full publicsuffix.org list is ~9k rows).
    """
    # two-step select: referencing the 'host' alias inside the same
    # select's explode resolves as a lateral column alias, which Spark
    # cannot place under a Generate node
    base = df.select(F.col(id_col), F.col(host_col).alias("host"))
    cand = base.select(
        F.col(id_col), F.col("host"),
        F.explode(suffix_candidates("host")).alias("suffix"))
    hit = cand.join(F.broadcast(suffixes.select("suffix").distinct()),
                    "suffix")
    best = (hit.groupBy(id_col)
            .agg(F.max_by(F.struct("suffix", "host"),
                          F.length("suffix")).alias("m"))
            .select(id_col, F.col("m.host").alias("host"),
                    F.col("m.suffix").alias("suffix")))
    rest = F.expr("substring(host, 1, length(host) - length(suffix) - 1)")
    label = F.element_at(F.split(rest, r"\."), -1)
    return best.withColumn(
        "registrable", F.concat(label, F.lit("."), F.col("suffix")))


def dedupe_rules(rules: DataFrame) -> DataFrame:
    """Collapse duplicate (host, prefix) robots rules: disallow wins
    (min over booleans = AND)."""
    return rules.groupBy("host", "prefix").agg(F.min("allow").alias("allow"))


def robots_decide(urls: DataFrame, rules: DataFrame,
                  id_col: str = "doc_id", host_col: str = "host",
                  path_col: str = "path") -> DataFrame:
    """Longest-prefix robots decision per URL: the applicable rule is
    the longest prefix of ``path`` among the URL's host's rules;
    length ties break toward disallow; URLs with no applicable rule
    default to allowed (the robots.txt spec default).

    Returns (id, host, path, matched_prefix, allowed)."""
    r = dedupe_rules(rules)
    u = urls.select(id_col, host_col, path_col)
    j = u.join(
        F.broadcast(r),
        (u[host_col] == r["host"])
        & (F.expr(f"substring({path_col}, 1, length(prefix))")
           == r["prefix"]),
        "left",
    ).select(u[id_col], u[host_col].alias("host"), u[path_col].alias("path"),
             r["prefix"], r["allow"])
    best = (j.groupBy(id_col, "host", "path")
            .agg(F.max_by(
                F.struct("prefix", "allow"),
                # no rule -> length -1 sorts below every real rule;
                # disallow outranks allow at equal length
                F.struct(
                    F.coalesce(F.length("prefix"), F.lit(-1)).alias("l"),
                    F.when(F.col("allow") == False, 1)  # noqa: E712
                     .otherwise(0).alias("d"))).alias("m")))
    return best.select(
        id_col, "host", "path",
        F.col("m.prefix").alias("matched_prefix"),
        F.coalesce(F.col("m.allow"), F.lit(True)).alias("allowed"))


def frontier_waves(urls: DataFrame, host_col: str = "host",
                   priority_col: str = "priority",
                   id_col: str = "doc_id") -> DataFrame:
    """Politeness scheduling: wave k = the k-th URL fetched from its
    host (per-host rank by priority DESC, id ASC for determinism).
    The realized global order is (wave, priority DESC, id) — a
    range-partitioned sort, never a global row_number."""
    w = Window.partitionBy(host_col).orderBy(
        F.col(priority_col).desc(), F.col(id_col))
    return urls.withColumn("wave", F.row_number().over(w).cast("bigint"))


_HREF_RE = r'<a href="([^"]+)">([^<]*)</a>'


def extract_links(pages: DataFrame, html_col: str = "html",
                  src_col: str = "src_host",
                  id_col: str = "doc_id") -> DataFrame:
    """(src_host, href, anchor, dst_host) edge list from raw HTML via
    one regexp_extract_all pass (JVM codegen; the HTML column never
    reaches Python). Relative hrefs get dst_host = src_host."""
    hrefs = F.expr(f"regexp_extract_all({html_col}, '{_HREF_RE}', 1)")
    anchors = F.expr(f"regexp_extract_all({html_col}, '{_HREF_RE}', 2)")
    e = (pages.select(
            F.col(id_col), F.col(src_col),
            F.explode(F.arrays_zip(hrefs.alias("href"),
                                   anchors.alias("anchor"))).alias("l"))
         .select(id_col, src_col, F.col("l.href").alias("href"),
                 F.col("l.anchor").alias("anchor")))
    dst = F.when(F.col("href").startswith("https://"),
                 F.regexp_extract("href", r"https://([^/]+)", 1)) \
           .otherwise(F.col(src_col))
    return e.withColumn("dst_host", dst)


def path_depth_stats(urls: DataFrame, host_col: str = "host",
                     path_col: str = "path") -> DataFrame:
    """Crawl-trap detection features per host: URL count, max path
    depth (number of '/'-separated segments), mean depth, distinct
    paths, and the distinct-path ratio. Calendar/session traps show
    up as deep paths with a distinct ratio near 1 at high volume.

    One groupBy(host) with map-side combinable aggregates; depth is
    pure string arithmetic (no split-explode needed).
    """
    depth = (F.length(path_col)
             - F.length(F.regexp_replace(F.col(path_col), "/", "")))
    return (urls
            .select(host_col, depth.alias("_d"), F.col(path_col))
            .groupBy(host_col)
            .agg(F.count(F.lit(1)).alias("n_urls"),
                 F.max("_d").alias("max_depth"),
                 (F.sum("_d") / F.count(F.lit(1))).alias("mean_depth"),
                 F.countDistinct(path_col).alias("n_paths"))
            .withColumn("distinct_ratio",
                        F.col("n_paths") / F.col("n_urls")))


def link_reciprocity(edges: DataFrame, src_col: str = "src_host",
                     dst_col: str = "dst_host") -> DataFrame:
    """Host-graph reciprocity: of the distinct directed host->host
    edges (self-loops excluded), the fraction whose reverse edge also
    exists — one distinct + one self-equi-join on the reversed key,
    never a cross product. Returns a single row
    (n_edges, n_reciprocal, reciprocity)."""
    e = (edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
         .filter(F.col("a") != F.col("b")).distinct())
    rev = e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    rec = e.join(rev, ["a", "b"], "left_semi")
    return (e.agg(F.count(F.lit(1)).alias("n_edges"))
            .crossJoin(F.broadcast(
                rec.agg(F.count(F.lit(1)).alias("n_reciprocal"))))
            .select("n_edges", "n_reciprocal",
                    (F.col("n_reciprocal") / F.col("n_edges"))
                    .alias("reciprocity")))


def change_rate(captures: DataFrame, now: str, *,
                page_col: str = "page_key", ts_col: str = "ts",
                version_col: str = "version",
                order_cols: list | None = None) -> DataFrame:
    """Recrawl scheduling from capture history: per page, the observed
    content-change rate (changes between consecutive captures / days
    of observed span — the MLE of a Poisson change process sampled at
    the capture instants) and the staleness priority
    rate * days_since_last_capture = the expected number of missed
    changes, the classic freshness-driven recrawl ordering (Cho &
    Garcia-Molina 2003's uniform-vs-proportional allocation takes
    this as input).

    One partitioned lag window + one groupBy(page); ``now`` is an
    explicit literal so runs are reproducible. Pages with a
    degenerate span (a single capture) get rate 0 — never NULL/inf.
    """
    from pyspark.sql.window import Window

    order_cols = order_cols or [F.col(ts_col)]
    w = Window.partitionBy(page_col).orderBy(*order_cols)
    changed = (F.lag(version_col).over(w).isNotNull()
               & (F.col(version_col) != F.lag(version_col).over(w)))
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    per = (captures
           .withColumn("_chg", F.when(changed, 1).otherwise(0))
           .groupBy(page_col)
           .agg(F.count(F.lit(1)).alias("n_captures"),
                F.sum("_chg").alias("n_changes"),
                F.min(us).alias("_first_us"),
                F.max(us).alias("_last_us")))
    day_us = 86400.0 * 1e6
    span_days = (F.col("_last_us") - F.col("_first_us")) / F.lit(day_us)
    now_us = F.unix_micros(F.to_timestamp(F.lit(now)))
    age_days = (now_us - F.col("_last_us")) / F.lit(day_us)
    rate = F.when(span_days > 0,
                  F.col("n_changes") / span_days).otherwise(F.lit(0.0))
    return per.select(
        page_col, "n_captures", "n_changes",
        rate.alias("change_rate_per_day"),
        age_days.alias("age_days"),
        (rate * age_days).alias("priority"))


def anchor_text_rollup(links: DataFrame, k: int = 3, *,
                       dst_col: str = "dst_host",
                       src_col: str = "src_host",
                       anchor_col: str = "anchor") -> DataFrame:
    """Per-target anchor-text aggregation (the search-engine signal:
    how the WEB describes a page beats how the page describes
    itself — Brin-Page 1998 §2.2): for each destination host, the
    inlink count, distinct source-host count, and the top-``k``
    anchor strings by (count desc, anchor asc) — the table-valued
    top-k extension of the wave-9 ``anchor_text_profile`` query
    (which reduces to ONE dominant anchor per host and has no source
    diversity; this rollup feeds BM25F-style field indexing, that
    profile feeds link-spam screening).

    Scale shape: two hash aggregations keyed by (dst, anchor) then
    dst — the per-dst anchor vocabulary is bounded (anchors are short
    strings), so the top-k window partitions freely; no self-join,
    no explode beyond the upstream link extraction.

    Returns (dst_host, n_inlinks, n_src_hosts, rnk, anchor,
    n_anchor)."""
    from pyspark.sql import Window

    per = (links.groupBy(dst_col, anchor_col)
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_anchor")))
    tot = (links.groupBy(dst_col)
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_inlinks"),
                F.countDistinct(src_col).cast("bigint")
                .alias("n_src_hosts")))
    w = Window.partitionBy(dst_col).orderBy(
        F.desc("n_anchor"), F.col(anchor_col))
    top = (per.withColumn("rnk", F.row_number().over(w))
           .filter(F.col("rnk") <= k))
    return (top.join(tot, dst_col)
            .select(dst_col, "n_inlinks", "n_src_hosts", "rnk",
                    anchor_col, "n_anchor"))


def waterfill_budget(demands: DataFrame, budget: float, *,
                     key_col: str = "host", demand_col: str = "demand",
                     round_to: int = 6) -> DataFrame:
    """Max-min fair (water-filling) allocation of a global crawl
    budget across hosts: every host gets min(demand, theta) pages,
    where the water level theta solves sum_h min(d_h, theta) =
    budget (theta = +inf when total demand fits).

    Same allocation as :func:`bano_spark.operators.selection.
    waterfill_allocation` (the two are cross-checked equal in
    tests/test_wave17.py) with a different scale shape: that operator
    prefix-sums the PER-HOST frame (two distributed cumsums over
    billions of rows); this one finds theta over DISTINCT demand
    values only — the unique theta lands in the demand-level interval
    where cum_below + m * d >= budget first, found via the bucketed
    distributed cumsum over a level frame whose cardinality is tiny
    next to the host count — so the host frame is never ordered at
    all. Integer demands keep every cumulative sum exact, so theta is
    a deterministic double.

    Returns (key, demand, alloc) with sum(alloc) = budget whenever
    total demand >= budget."""
    from .selection import distributed_cumsum

    d = demands.select(F.col(key_col), F.col(demand_col).alias("_d"))
    lv = (d.groupBy("_d")
          .agg(F.count(F.lit(1)).cast("bigint").alias("_c"),
               F.sum("_d").cast("bigint").alias("_s")))
    lv = distributed_cumsum(lv, "_d", [F.col("_d")], "_s",
                            out_col="_cs")
    lv = distributed_cumsum(lv, "_d", [F.col("_d")], "_c",
                            out_col="_cc")
    tot = lv.agg(F.sum("_c").alias("_tc"))  # bounded global agg
    lv = (lv.crossJoin(F.broadcast(tot))
          .withColumn("_cum_s", F.col("_cs") - F.col("_s"))
          .withColumn("_m", F.col("_tc") - (F.col("_cc") - F.col("_c"))))
    b = float(budget)
    feas = lv.filter(F.col("_cum_s").cast("double")
                     + F.col("_m").cast("double")
                     * F.col("_d").cast("double") >= b)
    theta_row = (feas.agg(F.min(F.struct(
        F.col("_d").alias("d"), F.col("_cum_s").alias("cs"),
        F.col("_m").alias("m"))).alias("t"))
        .select(((F.lit(b) - F.col("t.cs").cast("double"))
                 / F.col("t.m").cast("double")).alias("_theta")))
    return (d.crossJoin(F.broadcast(theta_row))  # 1-row level frame
            .select(key_col, F.col("_d").alias("demand"),
                    F.round(F.least(F.col("_d").cast("double"),
                                    F.coalesce(F.col("_theta"),
                                               F.col("_d").cast("double"))),
                            round_to).alias("alloc")))


def token_bucket_admission(fetches: DataFrame, capacity: float,
                           refill_per_sec: float, *,
                           host_col: str = "host", ts_col: str = "t",
                           round_to: int = 6):
    """Per-host token-bucket politeness admission (the production
    crawl rate limiter frontier_waves schedules AROUND): the bucket
    starts full, refills at ``refill_per_sec`` up to ``capacity``,
    each fetch needs one token — admitted if available, deferred (no
    token burn) otherwise. Returns per host: request / admitted /
    deferred counts and the final token level.

    Execution discipline as holt/croston: one groupBy collects each
    host's fetch times into a sorted array, ONE aggregate() fold
    replays the bucket — state (tokens, last_t, n_admitted) advances
    in timestamp order, so the arithmetic is engine-independent when
    capacity/refill are dyadic (use 0.25, 0.5 — not 0.1). Memory
    contract: per-host array; pre-bucket unbounded hosts first."""
    from pyspark.sql import functions as F

    cap = repr(float(capacity))
    r = repr(float(refill_per_sec))
    agged = (fetches.groupBy(host_col)
             .agg(F.array_sort(F.collect_list(
                 F.col(ts_col).cast("double"))).alias("ts")))
    fold = (f"aggregate(slice(ts, 2, size(ts) - 1), "
            f"named_struct('tok', CAST({cap} AS DOUBLE) - 1, "
            f"             'lt', ts[0], "
            f"             'adm', CAST(1 AS BIGINT)), "
            f"(s, t) -> IF("
            f"  least(CAST({cap} AS DOUBLE), "
            f"        s.tok + (t - s.lt) * CAST({r} AS DOUBLE)) >= 1, "
            f"  named_struct("
            f"    'tok', least(CAST({cap} AS DOUBLE), "
            f"           s.tok + (t - s.lt) * CAST({r} AS DOUBLE)) - 1, "
            f"    'lt', t, 'adm', s.adm + 1), "
            f"  named_struct("
            f"    'tok', least(CAST({cap} AS DOUBLE), "
            f"           s.tok + (t - s.lt) * CAST({r} AS DOUBLE)), "
            f"    'lt', t, 'adm', s.adm)))")
    st = F.expr(fold)
    return (agged.filter(F.size("ts") >= 1)
            .select(host_col,
                    F.size("ts").cast("bigint").alias("n_requests"),
                    st.alias("_st"))
            .select(host_col, "n_requests",
                    F.col("_st.adm").alias("n_admitted"),
                    (F.col("n_requests") - F.col("_st.adm"))
                    .cast("bigint").alias("n_deferred"),
                    F.round(F.col("_st.tok"), round_to)
                    .alias("final_tokens")))


def hreflang_reciprocity(pages: DataFrame, *, url_col: str = "page_url",
                         lang_col: str = "page_lang",
                         html_col: str = "html",
                         round_to: int = 6) -> DataFrame:
    """hreflang alternate-cluster consistency audit (the check every
    multilingual-site crawler runs: Google only honors hreflang pairs
    that RECIPROCATE): extract <link rel="alternate" hreflang=...>
    tags with one JVM regexp pass, dedup to distinct (src_url,
    dst_lang, dst_url) annotations, and mark each reciprocal iff a
    return annotation dst_url -> src_url exists. Rolled up per
    (src_lang, dst_lang) ordered pair: n_links, n_reciprocal, ratio.

    Scale shape: regexp + explode stay in codegen (HTML never crosses
    to Python); the reciprocity check is one self-equi-join of the
    deduped annotation table on (dst_url, src_url) = (src_url,
    dst_url) — shuffle on url pairs, no skew beyond genuinely hot
    pages (salt upstream if a page lists millions of alternates)."""
    pat = ('<link rel="alternate" hreflang="([a-z]+)" '
           'href="([^"]+)">')
    langs = F.expr(f"regexp_extract_all({html_col}, '{pat}', 1)")
    hrefs = F.expr(f"regexp_extract_all({html_col}, '{pat}', 2)")
    links = (pages.select(
        F.col(url_col).alias("src_url"),
        F.col(lang_col).alias("src_lang"),
        F.explode(F.arrays_zip(langs.alias("dst_lang"),
                               hrefs.alias("dst_url"))).alias("l"))
        .select("src_url", "src_lang",
                F.col("l.dst_lang").alias("dst_lang"),
                F.col("l.dst_url").alias("dst_url"))
        .distinct())
    back = (links.select(F.col("src_url").alias("dst_url"),
                         F.col("dst_url").alias("src_url"))
            .distinct()
            .withColumn("has_back", F.lit(1)))
    marked = links.join(back, ["src_url", "dst_url"], "left")
    out = (marked.groupBy("src_lang", "dst_lang").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.sum(F.coalesce("has_back", F.lit(0))).alias("n_reciprocal"))
        .select("src_lang", "dst_lang",
                F.col("n_links").cast("bigint").alias("n_links"),
                F.col("n_reciprocal").cast("bigint")
                .alias("n_reciprocal"),
                F.round(F.col("n_reciprocal")
                        / F.col("n_links").cast("double"), round_to)
                .alias("reciprocity")))
    return out.orderBy("src_lang", "dst_lang")
