"""Wave-8 driver queries: crawl infrastructure (public-suffix
registrable domains, robots.txt longest-prefix decisions, politeness
frontier waves, link-graph extraction), C4-style line dedup, winnowing
fingerprints, time-series resampling (gap fill / time-weighted average
/ CUSUM drift detection), Ripley's K, IDW interpolation, discrete
Hausdorff track distance, and the corpus Zipf slope — each with a
DuckDB oracle over the shared synth fixtures (one emitter, two
dialects).

Reference anchors: the crawl family generalizes the reference's web
harvesting (bano/sources/cadastre_gouv.py:14-45 scrapes department
pages; these are the Spark-shaped versions of what a 100 TB
Common-Crawl corpus needs); the spatial family extends the PIP/tile
kernels of bano/sql/* to point-pattern statistics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from bano_spark import synth

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    _read(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(synth.urls_select_sql("spark"))


def _suffixes(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(s,) for s in synth.URL_SUFFIXES], "suffix string")


_SUFFIX_VALUES = ", ".join(f"('{s}')" for s in synth.URL_SUFFIXES)

# DuckDB tokenizer idiom shared with the wave-2 dedup oracles
_TOKS = "string_split_regex(trim(lower(text)), '\\s+')"
_GRAMS3 = (f"CASE WHEN len({_TOKS}) >= 3 THEN "
           f"list_transform(generate_series(0, len({_TOKS}) - 3), "
           f"i -> array_to_string(list_slice({_TOKS}, i + 1, i + 3), ' ')) "
           f"ELSE [array_to_string({_TOKS}, ' ')] END")


# ---------------------------------------------------------------------------
# x01 — registrable domain via longest public-suffix match (the PLD
# grouping key of every host-level crawl statistic). Engine:
# operators/crawl.registrable_domain (bounded label explode +
# broadcast suffix join + one max_by). Oracle: the same candidate
# expansion in DuckDB list algebra.
# ---------------------------------------------------------------------------

_X01_ORACLE = f"""
WITH u AS ({synth.urls_select_sql('duckdb')}),
sx(suffix) AS (VALUES {_SUFFIX_VALUES}),
parts AS (
  SELECT doc_id, host, string_split(host, '.') AS p,
         len(string_split(host, '.')) AS n
  FROM u
),
cand AS (
  SELECT doc_id, host, p, n,
         unnest(generate_series(1, LEAST(n, 3))) AS k
  FROM parts
),
c2 AS (
  SELECT doc_id, host,
         array_to_string(p[n - k + 1 : n], '.') AS suffix
  FROM cand
),
best AS (
  SELECT c2.doc_id, c2.host, c2.suffix
  FROM c2 JOIN sx USING (suffix)
  QUALIFY row_number() OVER (PARTITION BY doc_id
                             ORDER BY length(suffix) DESC) = 1
)
SELECT doc_id, host, suffix,
       string_split(substring(host, 1, length(host) - length(suffix) - 1),
                    '.')[-1] || '.' || suffix AS registrable
FROM best ORDER BY doc_id
"""


@register("registrable_domain", _X01_ORACLE)
def x_registrable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bano_spark.operators.crawl import registrable_domain

    out = registrable_domain(_urls(spark, sf_dir), _suffixes(spark))
    return out.select("doc_id", "host", "suffix", "registrable") \
              .orderBy("doc_id")


# ---------------------------------------------------------------------------
# x02 — robots.txt longest-prefix decision per frontier URL
# (disallow wins length ties; no applicable rule defaults to allow).
# ---------------------------------------------------------------------------

_X02_ORACLE = f"""
WITH u AS ({synth.urls_select_sql('duckdb')}),
rr AS ({synth.robots_rules_select_sql('duckdb')}),
r AS (SELECT host, prefix, bool_and(allow) AS allow
      FROM rr GROUP BY host, prefix),
j AS (
  SELECT u.doc_id, u.host, u.path, r.prefix, r.allow
  FROM u LEFT JOIN r
    ON u.host = r.host
   AND substring(u.path, 1, length(r.prefix)) = r.prefix
),
best AS (
  SELECT * FROM j
  QUALIFY row_number() OVER (
      PARTITION BY doc_id
      ORDER BY coalesce(length(prefix), -1) DESC,
               CASE WHEN allow THEN 1 ELSE 0 END ASC) = 1
)
SELECT doc_id, host, path, prefix AS matched_prefix,
       coalesce(allow, TRUE) AS allowed
FROM best ORDER BY doc_id
"""


@register("robots_longest_prefix", _X02_ORACLE)
def x_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bano_spark.operators.crawl import robots_decide

    _read(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    urls = _urls(spark, sf_dir)
    rules = spark.sql(synth.robots_rules_select_sql("spark"))
    return robots_decide(urls, rules).orderBy("doc_id")


# ---------------------------------------------------------------------------
# x03 — politeness frontier waves: wave k = k-th fetch from a host
# (per-host priority rank; the global schedule sort is range-
# partitioned, never a single-partition row_number).
# ---------------------------------------------------------------------------

_X03_ORACLE = f"""
WITH u AS ({synth.urls_select_sql('duckdb')})
SELECT doc_id, host, priority,
       CAST(row_number() OVER (PARTITION BY host
                               ORDER BY priority DESC, doc_id) AS BIGINT)
           AS wave
FROM u ORDER BY doc_id
"""


@register("frontier_politeness", _X03_ORACLE)
def x_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bano_spark.operators.crawl import frontier_waves

    out = frontier_waves(_urls(spark, sf_dir))
    return out.select("doc_id", "host", "priority", "wave").orderBy("doc_id")


# ---------------------------------------------------------------------------
# x04 — link-graph extraction from raw HTML: one regexp_extract_all
# pass (JVM codegen), explode, absolute-vs-relative host resolution.
# ---------------------------------------------------------------------------

_X04_ORACLE = f"""
WITH h AS ({synth.link_html_select_sql('duckdb')}),
e AS (
  SELECT doc_id, src_host,
         unnest(regexp_extract_all(html,
             '<a href="([^"]+)">([^<]*)</a>', 1)) AS href,
         unnest(regexp_extract_all(html,
             '<a href="([^"]+)">([^<]*)</a>', 2)) AS anchor
  FROM h
)
SELECT doc_id, src_host, href, anchor,
       CASE WHEN href LIKE 'https://%'
            THEN regexp_extract(href, 'https://([^/]+)', 1)
            ELSE src_host END AS dst_host
FROM e ORDER BY doc_id, href
"""


@register("link_graph_extract", _X04_ORACLE)
def x_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bano_spark.operators.crawl import extract_links

    _read(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    pages = spark.sql(synth.link_html_select_sql("spark"))
    out = extract_links(pages)
    return (out.select("doc_id", "src_host", "href", "anchor", "dst_host")
            .orderBy("doc_id", "href"))


# ---------------------------------------------------------------------------
# x05 — C4-style global line dedup: a line occurrence survives iff it
# is the corpus-wide first by (doc_id, line_no). Engine:
# operators/webtext.line_dedup (groupBy-min keeper + hash join back —
# skew-robust against mega-duplicated boilerplate). The fixture
# plants 7 boilerplate lines across ~1/3 of all line slots.
# ---------------------------------------------------------------------------

_X05_ORACLE = f"""
WITH l AS ({synth.lines_select_sql('duckdb')}),
k AS (
  SELECT doc_id, line_no, line,
         row_number() OVER (PARTITION BY line
                            ORDER BY doc_id, line_no) AS rn
  FROM l
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       coalesce(string_agg(CASE WHEN rn = 1 THEN line END, chr(10)
                           ORDER BY line_no), '') AS kept_text
FROM k GROUP BY doc_id ORDER BY doc_id
"""


@register("c4_line_dedup", _X05_ORACLE)
def x_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bano_spark.operators.webtext import line_dedup

    _read(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    lines = spark.sql(synth.lines_select_sql("spark"))
    return line_dedup(lines).orderBy("doc_id")


# ---------------------------------------------------------------------------
# x06 — winnowing fingerprints (Schleimer et al. 2003): min hash of
# each w-window of k-gram hashes; guarantees any shared run of
# >= w + k - 1 tokens produces a shared fingerprint — the
# shifted/partial-overlap coverage the word-13-gram dup spans miss
# (VERDICT r3 missing #2).
# ---------------------------------------------------------------------------

_X06_ORACLE = f"""
WITH t AS (SELECT doc_id, {_GRAMS3} AS sh FROM documents),
h AS (SELECT doc_id,
             list_transform(sh, s -> substr(md5('w|' || s), 1, 8)) AS hs
      FROM t),
w AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(hs) - 3),
                j -> list_min(hs[j : j + 3]))) AS fp
  FROM h
)
SELECT DISTINCT doc_id, fp FROM w ORDER BY doc_id, fp
"""


@register("winnowing_fingerprints", _X06_ORACLE)
def x_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bano_spark.operators.dedup import winnowing_fingerprints

    docs = _read(spark, sf_dir, "documents")
    return winnowing_fingerprints(docs, k=3, w=4).orderBy("doc_id", "fp")


# ---------------------------------------------------------------------------
# x07 — time-series gap fill: resample each user's event series onto
# a daily grid with forward fill (last observation at-or-before each
# grid instant). Engine: operators/temporal.gap_fill (grid-marker
# union + one partitioned ordered window — no as-of join).
# ---------------------------------------------------------------------------

_X07_ORACLE = """
WITH g AS (
  SELECT user_id, unnest(generate_series(0, 29)) AS day
  FROM (SELECT DISTINCT user_id FROM events)
),
m AS (
  SELECT user_id, day,
         TIMESTAMP '2024-01-01' + day * INTERVAL 1 DAY AS ts,
         CAST(NULL AS DOUBLE) AS v, 1 AS is_grid
  FROM g
  UNION ALL
  SELECT user_id, CAST(NULL AS BIGINT), ts, value, 0 FROM events
),
f AS (
  SELECT user_id, day, is_grid,
         last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, is_grid
             ROWS UNBOUNDED PRECEDING) AS filled
  FROM m
)
SELECT user_id, day, filled FROM f WHERE is_grid = 1
ORDER BY user_id, day
"""


@register("timeseries_gap_fill", _X07_ORACLE)
def x_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bano_spark.operators.temporal import gap_fill

    ev = _read(spark, sf_dir, "events")
    grid = (ev.select("user_id").distinct()
            .select("user_id",
                    F.explode(F.sequence(F.lit(0), F.lit(29))).alias("day"))
            .select("user_id",
                    F.expr("timestampadd(DAY, day, "
                           "timestamp'2024-01-01 00:00:00')").alias("ts")))
    out = gap_fill(ev.select("user_id", "ts", "value"),
                   "user_id", "ts", "value", grid)
    return (out.select(
                "user_id",
                F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
                 .cast("bigint").alias("day"),
                "filled")
            .orderBy("user_id", "day"))


# ---------------------------------------------------------------------------
# x08 — per-user time-weighted average of the event value series
# (left-Riemann step integral / elapsed time) — the correct mean for
# irregularly sampled gauges, where the arithmetic mean over-weights
# bursts.
# ---------------------------------------------------------------------------

_X08_ORACLE = """
WITH s AS (
  SELECT user_id, value,
         (epoch_us(lead(ts) OVER w) - epoch_us(ts)) / 1e6 AS dt
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, round(sum(value * dt) / sum(dt), 6) AS twa,
       round(sum(dt), 6) AS span_sec
FROM s WHERE dt IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


@register("time_weighted_avg", _X08_ORACLE)
def x_twa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bano_spark.operators.temporal import time_weighted_average

    ev = _read(spark, sf_dir, "events")
    out = time_weighted_average(ev, "user_id", "ts", "value",
                                order_cols=[F.col("ts"), F.col("event_id")])
    return (out.select("user_id", F.round("twa", 6).alias("twa"),
                       F.round("span_sec", 6).alias("span_sec"))
            .orderBy("user_id"))


# ---------------------------------------------------------------------------
# x09 — one-sided CUSUM drift detection (Page 1954) over the
# integer-valued series fixture with a +300 level shift injected
# after observation 50. The recursion S_i = max(0, S_{i-1} + y_i) is
# rewritten as the reflection identity cs - min(0, running_min(cs)) —
# two ordered windows, exact for integer series, no per-key loop.
# ---------------------------------------------------------------------------

_X09_ORACLE = f"""
WITH t AS ({synth.series_select_sql('duckdb')}),
c AS (
  SELECT user_id, seq,
         SUM(v - 250.0) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS cs
  FROM t
),
s AS (
  SELECT user_id, seq,
         cs - LEAST(0.0, MIN(cs) OVER (PARTITION BY user_id ORDER BY seq
                                       ROWS UNBOUNDED PRECEDING)) AS sv
  FROM c
)
SELECT user_id, max(sv) AS max_cusum,
       CAST(min(CASE WHEN sv > 2000.0 THEN seq END) AS BIGINT)
           AS first_alarm_seq,
       CAST(sum(CASE WHEN sv > 2000.0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_alarms
FROM s GROUP BY user_id ORDER BY user_id
"""


@register("cusum_drift", _X09_ORACLE)
def x_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bano_spark.operators.temporal import cusum

    _read(spark, sf_dir, "events").createOrReplaceTempView("events")
    series = spark.sql(synth.series_select_sql("spark"))
    out = cusum(series, "user_id", "v", [F.col("ts"), F.col("event_id")],
                target=200.0, slack=50.0, threshold=2000.0)
    return (out.select("user_id", "max_cusum",
                       F.col("first_alarm_seq").cast("bigint")
                        .alias("first_alarm_seq"),
                       "n_alarms")
            .orderBy("user_id"))


# ---------------------------------------------------------------------------
# x10 — Ripley's K point-pattern statistic at r in {100, 250, 500}
# over the clustered dense-point fixture (naive estimator, no edge
# correction). Engine: operators/spatialstats.ripley_k — k-ring
# bucketed pair counting at cell size max(r), never O(n^2); oracle:
# the O(n^2) self-join DuckDB can afford at gate scale.
# ---------------------------------------------------------------------------

_RIPLEY_RS = [100.0, 250.0, 500.0]
_RIPLEY_AREA = 4000.0 * 4000.0

_X10_ORACLE = f"""
WITH p AS ({synth.dense_points_select_sql('duckdb')}),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM p),
d AS (
  SELECT (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
  FROM p a, p b WHERE a.event_id <> b.event_id
),
c AS (
  {" UNION ALL ".join(
    f"SELECT CAST({r} AS DOUBLE) AS r, "
    f"CAST(sum(CASE WHEN d2 <= {r * r} THEN 1 ELSE 0 END) AS BIGINT) "
    f"AS n_pairs FROM d"
    for r in _RIPLEY_RS)}
)
SELECT r, round({_RIPLEY_AREA} * n_pairs / (n * (n - 1.0)), 6) AS k_est,
       n_pairs
FROM c, n ORDER BY r
"""


@register("ripley_k_function", _X10_ORACLE)
def x_ripley(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bano_spark.operators.spatialstats import ripley_k

    _read(spark, sf_dir, "events").createOrReplaceTempView("events")
    pts = spark.sql(synth.dense_points_select_sql("spark"))
    out = ripley_k(pts, _RIPLEY_RS, _RIPLEY_AREA)
    return (out.select("r", F.round("k_est", 6).alias("k_est"), "n_pairs")
            .orderBy("r"))


# ---------------------------------------------------------------------------
# x11 — inverse-distance-weighted surface (Shepard 1968) of the
# dense-point values at the 8x8 lattice nodes, radius 600, power 2.
# Engine: operators/interpolation.idw_interpolate (k-ring bucketed
# node<->sample join); oracle: the full cross join DuckDB can afford.
# ---------------------------------------------------------------------------

_X11_ORACLE = f"""
WITH nd AS ({synth.grid_nodes_select_sql('duckdb')}),
s AS ({synth.dense_points_select_sql('duckdb')}),
j AS (
  SELECT node_id, nx, ny, 1.0 / d2 AS w, value / d2 AS wv
  FROM (SELECT n.node_id, n.nx, n.ny, s.value,
               (n.nx - s.x) * (n.nx - s.x)
             + (n.ny - s.y) * (n.ny - s.y) AS d2
        FROM nd n, s)
  WHERE d2 <= 360000.0
)
SELECT node_id, nx, ny, round(sum(wv) / sum(w), 6) AS idw_value,
       CAST(count(*) AS BIGINT) AS n_samples
FROM j GROUP BY node_id, nx, ny ORDER BY node_id
"""


@register("idw_surface", _X11_ORACLE)
def x_idw(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bano_spark.operators.interpolation import idw_interpolate

    _read(spark, sf_dir, "events").createOrReplaceTempView("events")
    _read(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    samples = spark.sql(synth.dense_points_select_sql("spark"))
    nodes = spark.sql(synth.grid_nodes_select_sql("spark"))
    out = idw_interpolate(nodes, samples, radius=600.0, power=2)
    return (out.select("node_id", "nx", "ny",
                       F.round("idw_value", 6).alias("idw_value"),
                       "n_samples")
            .orderBy("node_id"))


# ---------------------------------------------------------------------------
# x12 — discrete Hausdorff distance between paired user tracks
# (consecutive even/odd user ids): H = max of the two directed
# max-min distances. Engine: operators/spatialstats.hausdorff_pairs —
# the point join is confined within each pair, squared distances
# until the final sqrt.
# ---------------------------------------------------------------------------

_X12_ORACLE = f"""
WITH t AS ({synth.traj_select_sql('duckdb')}),
u AS (SELECT DISTINCT user_id FROM t),
prs AS (
  SELECT a.user_id AS id_a, b.user_id AS id_b
  FROM u a JOIN u b ON b.user_id = a.user_id + 1
  WHERE a.user_id % 2 = 0
),
j AS (
  SELECT p.id_a, p.id_b, pa.x AS ax, pa.y AS ay, pb.x AS bx2, pb.y AS by2,
         (pa.x - pb.x) * (pa.x - pb.x)
       + (pa.y - pb.y) * (pa.y - pb.y) AS d2
  FROM prs p
  JOIN t pa ON pa.user_id = p.id_a
  JOIN t pb ON pb.user_id = p.id_b
),
hab AS (
  SELECT id_a, id_b, max(dmin) AS h FROM (
    SELECT id_a, id_b, ax, ay, min(d2) AS dmin
    FROM j GROUP BY id_a, id_b, ax, ay) GROUP BY id_a, id_b
),
hba AS (
  SELECT id_a, id_b, max(dmin) AS h FROM (
    SELECT id_a, id_b, bx2, by2, min(d2) AS dmin
    FROM j GROUP BY id_a, id_b, bx2, by2) GROUP BY id_a, id_b
)
SELECT hab.id_a, hab.id_b,
       round(sqrt(GREATEST(hab.h, hba.h)), 3) AS hausdorff
FROM hab JOIN hba ON hab.id_a = hba.id_a AND hab.id_b = hba.id_b
ORDER BY hab.id_a
"""


@register("hausdorff_track_pairs", _X12_ORACLE)
def x_hausdorff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bano_spark.operators.spatialstats import hausdorff_pairs

    _read(spark, sf_dir, "events").createOrReplaceTempView("events")
    traj = spark.sql(synth.traj_select_sql("spark"))
    users = traj.select("user_id").distinct()
    pairs = (users.filter(F.col("user_id") % 2 == 0)
             .select(F.col("user_id").alias("id_a"),
                     (F.col("user_id") + 1).alias("id_b"))
             .join(users.select(F.col("user_id").alias("id_b")), "id_b")
             .select("id_a", "id_b"))
    out = hausdorff_pairs(traj, pairs)
    return (out.select("id_a", "id_b",
                       F.round("hausdorff", 3).alias("hausdorff"))
            .orderBy("id_a"))


# ---------------------------------------------------------------------------
# x13 — corpus Zipf slope: OLS fit of ln(freq) on ln(rank) over the
# unigram distribution. Engine rank comes from
# selection.distributed_cumsum (bucketed composite prefix sum — no
# single-partition window); the oracle's plain row_number produces
# the identical integers.
# ---------------------------------------------------------------------------

_X13_ORACLE = f"""
WITH toks AS (SELECT unnest({_TOKS}) AS t FROM documents),
freq AS (SELECT t, count(*) AS f FROM toks GROUP BY t),
ranked AS (
  SELECT ln(CAST(row_number() OVER (ORDER BY f DESC, t) AS DOUBLE)) AS lx,
         ln(CAST(f AS DOUBLE)) AS ly
  FROM freq
)
SELECT round((sum(lx * ly) - sum(lx) * sum(ly) / count(*))
           / (sum(lx * lx) - sum(lx) * sum(lx) / count(*)), 6)
           AS zipf_slope,
       CAST(count(*) AS BIGINT) AS n_vocab
FROM ranked
"""


@register("zipf_slope", _X13_ORACLE)
def x_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bano_spark.operators.textstats import zipf_slope

    docs = _read(spark, sf_dir, "documents")
    out = zipf_slope(docs)
    return out.select(F.round("zipf_slope", 6).alias("zipf_slope"),
                      "n_vocab")
