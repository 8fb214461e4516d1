"""Deterministic synthetic geography + point derivation.

Per FIXTURES.md ("Synthetic geography"): a seeded grid of communes in
two fake departements plus one Paris-like commune made of 9
arrondissements (admin_level 9) drawing ~37% of all points — the skew
case. Everything lives natively in EPSG:3857 meters and every derived
value is produced by integer arithmetic followed by exact double
conversions, so the Spark pipeline and the DuckDB oracle compute
bit-identical coordinates from the same table (`events`).

The same constants emit both the Spark DataFrames and the oracle SQL
text — one source of truth, zero drift.

Commune layout (x strips, all sharing one y band):

    01001..01004   dept 01, admin_level 8, slots 0..3
    97405          dept 974 (DOM — 3-char dept per helpers.py:97-101),
                   admin_level 8, slot 4: keeps the C9 overseas rule
                   live through every end-to-end path (pages -> cumul
                   -> conciliation -> publish), per VERDICT r3 item 2
    02001..02005   dept 02, admin_level 8, slots 5..9  (02005 is 'IMAG')
    75056          level 8 umbrella over slots 10..18 (excluded from
                   tiling per the reference's NOT IN list,
                   bano/models.py:346)
    75101..75109   level 9 arrondissements, slots 10..18
    02099          level 8, off-grid commune that receives no points
"""

from __future__ import annotations

REG0 = 1000003.0  # x origin (odd offset: keeps edges off tile boundaries)
REGY0 = 2000003.0  # y origin of the point band
CY0 = REGY0 - 3.0  # commune band ymin
CY1 = REGY0 + 9503.0  # commune band ymax
W = 10000.0  # commune strip width
PARIS0 = REG0 + 10 * W

# (insee_com, dept, admin_level, xmin, ymin, xmax, ymax, format_cadastre)
COMMUNES: list[tuple[str, str, int, float, float, float, float, str]] = (
    [
        (f"0100{i + 1}", "01", 8, REG0 + i * W, CY0, REG0 + (i + 1) * W, CY1, "VECT")
        for i in range(4)
    ]
    + [("97405", "974", 8, REG0 + 4 * W, CY0, REG0 + 5 * W, CY1, "VECT")]
    + [
        (f"0200{i + 1}", "02", 8, REG0 + (5 + i) * W, CY0, REG0 + (6 + i) * W, CY1,
         "IMAG" if i == 4 else "VECT")
        for i in range(5)
    ]
    + [("75056", "75", 8, PARIS0, CY0, PARIS0 + 9 * W, CY1, "VECT")]
    + [
        (f"7510{i + 1}", "75", 9, PARIS0 + i * W, CY0, PARIS0 + (i + 1) * W, CY1, "VECT")
        for i in range(9)
    ]
    + [("02099", "02", 8, REG0 - 2 * W, CY0, REG0 - W, CY1, "VECT")]
)

# Nested postal polygons; `area_rank` is derived from area (smallest wins,
# replacing the reference's insertion-order serial id — SURVEY.md §4).
# (code_postal, xmin, ymin, xmax, ymax)
POSTAL: list[tuple[str, float, float, float, float]] = [
    ("01000", REG0, CY0, REG0 + 3 * W, CY1),
    ("01210", REG0 + 12000.0, REGY0 + 1000.0, REG0 + 15000.0, REGY0 + 4000.0),
    ("02000", REG0 + 5 * W, CY0, REG0 + 10 * W, CY1),
    ("75000", PARIS0, CY0, PARIS0 + 9 * W, CY1),
]

# Street-name vocabulary used by name-derivation queries: raw -> the
# reference normalize() output (goldens checked in tests/test_normalize.py).
STREETS: list[tuple[str, str]] = [
    ("Boulevard de Sébastopol", "BD SEBASTOPOL"),
    ("Rue du Général Leclerc", "RUE GAL LECLERC"),
    ("Avenue des Champs-Élysées", "AV CHAMPS ELYSEES"),
    ("Place de l'Église", "PL EGLISE"),
    ("Impasse du 8 Mai 1945", "IMP HUIT MAI UNNEUFQUATRECINQ"),
    ("Chemin de la Fontaine", "CHE FONTAINE"),
    ("Route Nationale 7", "RTE NATIONALE SEPT"),
    ("Allée des Acacias", "ALL ACACIAS"),
    ("Grande Rue", "GR RUE"),
    ("Quai Saint-Vincent", "QUAI ST VINCENT"),
    ("Rue du Docteur Schweitzer", "RUE DOC SCHWEITZER"),
    ("Square Louis XIV", "SQ LOUIS UNQUATRE"),
]


# format_toponyme(normalize(raw)) goldens for STREETS, generated from the
# reference implementation (bano/helpers.py:24-76) — display-casing parity
TOPONYMES: list[str] = [
    "Bd Sebastopol", "Rue Gal Leclerc", "Av Champs Elysees", "Pl Église",
    "Imp Huit Mai Unneufquatrecinq", "Che Fontaine", "Rte Nationale Sept",
    "All Acacias", "Gr Rue", "Quai St Vincent", "Rue Doc Schweitzer",
    "Sq Louis Unquatre",
]


def _ii(v: float) -> str:
    """Exact SQL literal for our integer-valued doubles."""
    return repr(v)


def communes_values_sql() -> str:
    rows = ",\n    ".join(
        f"('{c[0]}','{c[1]}',{c[2]},{_ii(c[3])},{_ii(c[4])},{_ii(c[5])},{_ii(c[6])},'{c[7]}')"
        for c in COMMUNES
    )
    return (
        "(VALUES\n    " + rows +
        ") AS c(insee_com, dept, admin_level, xmin, ymin, xmax, ymax, format_cadastre)"
    )


def postal_values_sql() -> str:
    rows = ",\n    ".join(
        f"('{p[0]}',{_ii(p[1])},{_ii(p[2])},{_ii(p[3])},{_ii(p[4])})" for p in POSTAL
    )
    return "(VALUES\n    " + rows + ") AS pp(code_postal, xmin, ymin, xmax, ymax)"


def points_select_sql(dialect: str, table: str = "events", id_col: str = "event_id",
                      salt: int = 0) -> str:
    """SELECT deriving one deterministic EPSG:3857 point per row of
    ``table`` (keyed by ``id_col``; ``salt`` decorrelates derivations).

    Identical integer arithmetic in Spark SQL and DuckDB; the only
    dialect difference is the integer-division operator.
    """
    d = " div " if dialect == "spark" else " // "
    return f"""
SELECT {id_col},
       CAST(CASE WHEN u % 16 < 10
            THEN {REG0!r} + (u % 16) * {W!r}
            ELSE {PARIS0!r} + ((u{d}16) % 9) * {W!r}
       END + ((u{d}144) % 9000) + 0.5 AS DOUBLE) AS x,
       CAST({REGY0!r} + ((u{d}1296000) % 9000) + 0.25 AS DOUBLE) AS y
FROM (SELECT {id_col}, ({id_col} * 2654435761 + {salt}) % 2147483648 AS u FROM {table})
"""


def communes_df(spark):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("insee_com", T.StringType()),
        T.StructField("dept", T.StringType()),
        T.StructField("admin_level", T.IntegerType()),
        T.StructField("xmin", T.DoubleType()),
        T.StructField("ymin", T.DoubleType()),
        T.StructField("xmax", T.DoubleType()),
        T.StructField("ymax", T.DoubleType()),
        T.StructField("format_cadastre", T.StringType()),
    ])
    return spark.createDataFrame([tuple(c) for c in COMMUNES], schema)


def commune_polygons_df(spark):
    """Communes as generic polygons (closed rings) for the spatial-join
    engine path — rectangles here, but the engine treats them as
    arbitrary rings."""
    from pyspark.sql import types as T

    rows = []
    for c in COMMUNES:
        insee, dept, lvl, x0, y0, x1, y1, fmt = c
        ring = [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]
        rows.append((insee, dept, lvl, ring))
    schema = T.StructType([
        T.StructField("insee_com", T.StringType()),
        T.StructField("dept", T.StringType()),
        T.StructField("admin_level", T.IntegerType()),
        T.StructField("verts", T.ArrayType(T.ArrayType(T.DoubleType()))),
    ])
    return spark.createDataFrame(rows, schema)


def postal_polygons_df(spark):
    """Postal polygons as generic rings + area column (smallest-wins
    containment, W5 — area-ordered, SURVEY.md §4)."""
    from pyspark.sql import types as T

    rows = []
    for cp, x0, y0, x1, y1 in POSTAL:
        ring = [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]
        rows.append((cp, (x1 - x0) * (y1 - y0), ring))
    schema = T.StructType([
        T.StructField("code_postal", T.StringType()),
        T.StructField("area", T.DoubleType()),
        T.StructField("verts", T.ArrayType(T.ArrayType(T.DoubleType()))),
    ])
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# Non-axis-aligned / non-convex refine fixtures (VERDICT r1 item 10).
#
# Derived points always sit at x = i + 0.5, y = j + 0.25 (i, j int), so
# edges on integer vertices with slopes in {0, inf, +-2} can never pass
# through a point: a slope +-2 line through integers has integer y at
# x = i + 0.5, and the points' y is j + 0.25. No boundary ambiguity —
# the oracle's strict half-plane inequalities and the engine's ray-cast
# agree exactly.
#
# T1-T3: isoceles triangles (slope +-2 edges) in strips 0, 7 and Paris
# arr 3 — convex, non-axis-aligned, exercising the exact PIP refine.
# L1: a concave L-shape = union of two axis-aligned rectangles — the
# multi-crossing ray-cast case, SQL-expressible as an OR of boxes.
# ---------------------------------------------------------------------------

_TRI_SPECS = [  # (poly_id, x0, y0, half_base)
    ("T1", REG0 + 500.0, REGY0 + 1000.0, 3000.0),
    ("T2", REG0 + 7 * W + 500.0, REGY0 + 1000.0, 3000.0),
    ("T3", PARIS0 + 2 * W + 500.0, REGY0 + 1000.0, 3000.0),
]
_L_SPEC = ("L1", REG0 + 3 * W + 500.0, REGY0 + 1000.0)  # rects 4000x2000 + 1500x6000


def refine_polygons_df(spark):
    """The refine fixture polygons as generic closed rings for
    spatial_join — same engine path as the commune rectangles."""
    from pyspark.sql import types as T

    rows = []
    for pid, x0, y0, h in _TRI_SPECS:
        ring = [[x0, y0], [x0 + 2 * h, y0], [x0 + h, y0 + 2 * h], [x0, y0]]
        rows.append((pid, ring))
    pid, x0, y0 = _L_SPEC
    ring = [[x0, y0], [x0 + 4000.0, y0], [x0 + 4000.0, y0 + 2000.0],
            [x0 + 1500.0, y0 + 2000.0], [x0 + 1500.0, y0 + 6000.0],
            [x0, y0 + 6000.0], [x0, y0]]
    rows.append((pid, ring))
    schema = T.StructType([
        T.StructField("poly_id", T.StringType()),
        T.StructField("verts", T.ArrayType(T.ArrayType(T.DoubleType()))),
    ])
    return spark.createDataFrame(rows, schema)


def refine_membership_sql(px: str = "p.x", py: str = "p.y") -> str:
    """UNION ALL of (point, poly_id) memberships as strict half-plane
    inequalities (triangles) and box unions (L-shape) — the oracle's
    independent statement of the same containment."""
    parts = []
    for pid, x0, y0, h in _TRI_SPECS:
        parts.append(
            f"SELECT p.event_id, '{pid}' AS poly_id FROM pts p"
            f" WHERE {py} > {y0!r}"
            f" AND {py} < {y0!r} + 2 * ({px} - {x0!r})"
            f" AND {py} < {y0!r} - 2 * ({px} - {x0 + 2 * 3000.0!r})"
        )
    pid, x0, y0 = _L_SPEC
    parts.append(
        f"SELECT p.event_id, '{pid}' AS poly_id FROM pts p"
        f" WHERE ({px} > {x0!r} AND {px} < {x0 + 4000.0!r}"
        f" AND {py} > {y0!r} AND {py} < {y0 + 2000.0!r})"
        f" OR ({px} > {x0!r} AND {px} < {x0 + 1500.0!r}"
        f" AND {py} > {y0!r} AND {py} < {y0 + 6000.0!r})"
    )
    return " UNION ALL ".join(parts)


def points_df(spark, sf_dir: str):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.createOrReplaceTempView("events")
    return spark.sql(points_select_sql("spark"))


# ---------------------------------------------------------------------------
# Wave-5 fixtures: trajectories, coverage-gap points, street segments.
# Same one-source-of-truth discipline as points_select_sql: a single
# emitter produces both dialects, integer arithmetic end-to-end so the
# engine and the oracle derive bit-identical coordinates.
# ---------------------------------------------------------------------------

# unit step vectors of the 8 compass sectors, index = (u div 10) % 8
_SECTOR_UNITS = [(0, 1), (1, 1), (1, 0), (1, -1),
                 (0, -1), (-1, -1), (-1, 0), (-1, 1)]


def traj_select_sql(dialect: str, table: str = "events") -> str:
    """Per-user trajectory points from ``table``: each user walks from
    a home cell; 60% of pings dwell (<= ~14 m wobble), 40% jump
    500-1100 m in one of 8 compass directions. Every coordinate is an
    integer-valued double built from window sums of integers —
    bit-identical across engines.

    Emits a SELECT with (user_id, ts, event_id, seq, x, y)."""
    d = " div " if dialect == "spark" else " // "
    ux = "CASE (u" + d + "10) % 8 " + " ".join(
        f"WHEN {i} THEN {vx}" for i, (vx, _) in enumerate(_SECTOR_UNITS)
    ) + " END"
    uy = "CASE (u" + d + "10) % 8 " + " ".join(
        f"WHEN {i} THEN {vy}" for i, (_, vy) in enumerate(_SECTOR_UNITS)
    ) + " END"
    return f"""
SELECT user_id, ts, event_id,
       CAST(seq AS INT) AS seq,
       CAST(1000003.0 + (user_id % 97) * 20000
            + SUM(jx) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            + wx AS DOUBLE) AS x,
       CAST(2000003.0 + ((user_id * 31) % 53) * 20000
            + SUM(jy) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            + wy AS DOUBLE) AS y
FROM (
  SELECT user_id, ts, event_id, u,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq,
         CASE WHEN u % 10 < 6 THEN 0
              ELSE (500 + (u % 7) * 100) * ({ux}) END AS jx,
         CASE WHEN u % 10 < 6 THEN 0
              ELSE (500 + (u % 7) * 100) * ({uy}) END AS jy,
         u % 11 AS wx, (u{d}11) % 11 AS wy
  FROM (SELECT user_id, ts, event_id,
               (event_id * 2654435761 + 11) % 2147483648 AS u
        FROM {table})
)
"""


def gap_points_select_sql(dialect: str, table: str = "events") -> str:
    """Point derivation that deliberately spills OUTSIDE the commune
    band: x slots 0..20 (19-20 lie east of Paris) and y up to
    REGY0 + 12000 (the band ends at REGY0 + 9503) — the coverage-gap
    fixture for the spatial anti-join. Offsets 0.5 / 0.25 keep every
    point strictly off polygon edges (synth.py refine notes)."""
    d = " div " if dialect == "spark" else " // "
    return f"""
SELECT {"event_id"},
       CAST({REG0!r} + (u % 21) * {W!r} + ((u{d}21) % 9000) + 0.5
            AS DOUBLE) AS x,
       CAST({REGY0!r} + ((u{d}189000) % 12000) + 0.25 AS DOUBLE) AS y
FROM (SELECT event_id, (event_id * 2654435761 + 23) % 2147483648 AS u
      FROM {table})
"""


def segments_select_sql(dialect: str, table: str = "orders") -> str:
    """Deterministic street segments inside the commune band: one per
    distinct ``o_orderkey % 500``, anchored in an x slot 0..18 with an
    integer direction/length drawn from the key hash. Endpoints are
    integer-valued doubles; segment lengths span 100..2000 m."""
    d = " div " if dialect == "spark" else " // "
    return f"""
SELECT DISTINCT seg_id,
       CAST({REG0!r} + (v % 19) * {W!r} + ((v{d}19) % 8000) AS DOUBLE) AS x1,
       CAST({REGY0!r} + ((v{d}152000) % 8000) AS DOUBLE) AS y1,
       CAST({REG0!r} + (v % 19) * {W!r} + ((v{d}19) % 8000)
            + (100 + (v{d}3) % 1900) * (CASE (v{d}7) % 3
                 WHEN 0 THEN -1 WHEN 1 THEN 0 ELSE 1 END) AS DOUBLE) AS x2,
       CAST({REGY0!r} + ((v{d}152000) % 8000)
            + (100 + (v{d}5) % 1900) * (CASE (v{d}11) % 3
                 WHEN 0 THEN -1 WHEN 1 THEN 0 ELSE 1 END) AS DOUBLE) AS y2
FROM (SELECT o_orderkey % 500 AS seg_id,
             ((o_orderkey % 500) * 2654435761 + 37) % 2147483648 AS v
      FROM {table})
"""


# ---------------------------------------------------------------------------
# Wave-8 fixtures: crawl-infrastructure URLs, robots rules, and link
# HTML. Same one-source-of-truth discipline: one emitter per fixture
# produces both dialects; every derived value is integer/string
# arithmetic that is bit-identical in Spark SQL and DuckDB (both
# accept CAST(x AS STRING) and '||' concatenation).
# ---------------------------------------------------------------------------

# public-suffix sample: mixes one- and two-label suffixes so the
# longest-suffix-match operator has real work to do (after the
# publicsuffix.org list shape; the real list is ~9k rows and would be
# broadcast the same way)
URL_SUFFIXES = ["com", "org", "io", "fr", "co.uk", "gouv.fr"]


def _host_expr(dialect: str, v: str) -> str:
    """Host from an integer hash expression ``v``: optional 'h<k>.'
    sub-label (4 of 5 hosts), a 'd<k>' domain label, and a suffix
    drawn from URL_SUFFIXES (including two-label suffixes)."""
    d = " div " if dialect == "spark" else " // "
    suffix = ("CASE (" + v + d + "11) % 6 " + " ".join(
        f"WHEN {i} THEN '{s}'" for i, s in enumerate(URL_SUFFIXES)) + " END")
    sub = (f"CASE WHEN ({v}) % 5 = 0 THEN '' "
           f"ELSE 'h' || CAST(({v}) % 7 AS STRING) || '.' END")
    dom = f"'d' || CAST(({v}{d}5) % 50 AS STRING)"
    return f"({sub} || {dom} || '.' || ({suffix}))"


def urls_select_sql(dialect: str, table: str = "documents") -> str:
    """One deterministic crawl-frontier URL per document:
    (doc_id, url, host, path, priority)."""
    d = " div " if dialect == "spark" else " // "
    host = _host_expr(dialect, "u")
    return f"""
SELECT doc_id,
       'https://' || {host} || '/p/' || CAST((u{d}13) % 23 AS STRING)
           || '/page' || CAST(u % 97 AS STRING) AS url,
       {host} AS host,
       '/p/' || CAST((u{d}13) % 23 AS STRING)
           || '/page' || CAST(u % 97 AS STRING) AS path,
       CAST((u{d}3) % 100 AS BIGINT) AS priority
FROM (SELECT doc_id, (doc_id * 2654435761 + 71) % 2147483648 AS u
      FROM {table})
"""


def robots_rules_select_sql(dialect: str, table: str = "supplier") -> str:
    """Deterministic robots.txt path rules keyed by supplier:
    (host, prefix, allow). Hosts share the construction of
    urls_select_sql so a useful fraction of frontier URLs has at
    least one applicable rule; prefixes nest ('/p' vs '/p/<k>') so
    longest-prefix-wins is exercised, and duplicated (host, prefix)
    pairs with conflicting allow bits exercise the disallow-wins
    dedup."""
    d = " div " if dialect == "spark" else " // "
    host = _host_expr(dialect, "v")
    return f"""
SELECT {host} AS host,
       CASE WHEN v % 4 = 0 THEN '/p'
            ELSE '/p/' || CAST((v{d}17) % 23 AS STRING) END AS prefix,
       (v{d}2) % 3 > 0 AS allow
FROM (SELECT (s_suppkey * 2654435761 + 71) % 2147483648 AS v
      FROM {table})
"""


def link_html_select_sql(dialect: str, table: str = "documents") -> str:
    """Synthetic page HTML with 1-2 anchor tags per document:
    (doc_id, src_host, html). Target hosts reuse _host_expr under
    fresh salts; anchor text is a small token vocabulary."""
    d = " div " if dialect == "spark" else " // "
    src = _host_expr(dialect, "u")
    h1 = _host_expr(dialect, "w1")
    h2 = _host_expr(dialect, "w2")
    return f"""
SELECT doc_id, {src} AS src_host,
       '<p>intro</p><a href="https://' || {h1} || '/l/'
         || CAST(w1 % 13 AS STRING) || '">w' || CAST(w1 % 50 AS STRING)
         || '</a> filler text'
         || CASE WHEN u % 3 = 0 THEN '' ELSE
            ' <a href="https://' || {h2} || '/l/'
            || CAST(w2 % 13 AS STRING) || '">w' || CAST(w2 % 50 AS STRING)
            || '</a>' END AS html
FROM (SELECT doc_id,
             (doc_id * 2654435761 + 71) % 2147483648 AS u,
             (doc_id * 2654435761 + 101) % 2147483648 AS w1,
             (doc_id * 2654435761 + 131) % 2147483648 AS w2
      FROM {table})
"""


# ---------------------------------------------------------------------------
# Wave-8 fixtures (continued): document lines, clustered dense points,
# lattice nodes, and an integer-valued drifting series. Everything is
# integer/string arithmetic, bit-identical across engines; doubles
# appear only as exact integer-valued casts.
# ---------------------------------------------------------------------------


def lines_select_sql(dialect: str, table: str = "documents",
                     chunk: int = 8) -> str:
    """Chunk each document's token stream into ``chunk``-token pseudo
    lines (doc_id, line_no, line). Every third line (by a doc/line
    hash) is replaced with one of 7 boilerplate strings so the corpus
    carries the heavy cross-document line duplication C4-style line
    dedup exists to remove; the remaining lines are near-unique.
    """
    if dialect == "spark":
        toks = "split(text, ' ')"
        return f"""
SELECT doc_id, line_no,
       CASE WHEN (doc_id * 7 + line_no) % 3 = 0
            THEN 'boiler plate line ' || CAST((doc_id div 11 + line_no) % 7 AS STRING)
            ELSE array_join(slice({toks}, line_no * {chunk} + 1, {chunk}), ' ')
       END AS line
FROM (SELECT doc_id, text FROM {table}) t
LATERAL VIEW explode(sequence(0,
    CAST(ceil(size({toks}) / {chunk}.0) AS INT) - 1)) e AS line_no
"""
    return f"""
SELECT doc_id, line_no,
       CASE WHEN (doc_id * 7 + line_no) % 3 = 0
            THEN 'boiler plate line ' || CAST((doc_id // 11 + line_no) % 7 AS STRING)
            ELSE array_to_string(
                   toks[line_no * {chunk} + 1 : line_no * {chunk} + {chunk}], ' ')
       END AS line
FROM (SELECT doc_id,
             unnest(generate_series(0,
                 CAST(ceil(len(toks) / {chunk}.0) AS INT) - 1)) AS line_no,
             toks
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM {table}))
"""


def dense_points_select_sql(dialect: str, table: str = "events",
                            modulus: int = 19) -> str:
    """A bounded clustered point set in the 4000 x 4000 unit box:
    ~70% of points fall within +-200 of one of 25 cluster centres,
    30% are uniform — the clustering Ripley's K exists to detect.
    Sampled as event_id % modulus = 3 so the oracle's O(n^2)
    self-join stays small at gate scale. (value) is an integer-valued
    double for the IDW fixture."""
    d = " div " if dialect == "spark" else " // "
    cx = f"(400 + ((u{d}7) % 5) * 700)"
    cy = f"(400 + ((u{d}13) % 5) * 700)"
    return f"""
SELECT event_id,
       CAST(CASE WHEN u % 10 < 7
            THEN {cx} + ((u{d}10) % 401) - 200
            ELSE (u{d}10) % 4000 END + 0.5 AS DOUBLE) AS x,
       CAST(CASE WHEN u % 10 < 7
            THEN {cy} + ((u{d}4010) % 401) - 200
            ELSE (u{d}4010) % 4000 END + 0.25 AS DOUBLE) AS y,
       CAST((u{d}31) % 100 AS DOUBLE) AS value
FROM (SELECT event_id, (event_id * 2654435761 + 47) % 2147483648 AS u
      FROM {table} WHERE event_id % {modulus} = 3)
"""


def grid_nodes_select_sql(dialect: str, table: str = "supplier") -> str:
    """An 8 x 8 lattice of interpolation nodes over the same 4000-unit
    box as dense_points_select_sql (node spacing 500, offset 250)."""
    d = " div " if dialect == "spark" else " // "
    return f"""
SELECT DISTINCT s_suppkey % 64 AS node_id,
       CAST(250 + ((s_suppkey % 64) % 8) * 500 AS DOUBLE) AS nx,
       CAST(250 + ((s_suppkey % 64){d}8) * 500 AS DOUBLE) AS ny
FROM {table}
"""


def series_select_sql(dialect: str, table: str = "events") -> str:
    """Per-user integer-valued measurement series with an injected
    +300 level shift after the 50th observation — the CUSUM drift
    fixture. (user_id, ts, event_id, seq, v); v stays integer so
    running sums are exact in both engines."""
    return f"""
SELECT user_id, ts, event_id, seq,
       CAST((u % 400) + CASE WHEN seq > 50 THEN 300 ELSE 0 END AS DOUBLE) AS v
FROM (SELECT user_id, ts, event_id,
             (event_id * 2654435761 + 5) % 2147483648 AS u,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS seq
      FROM {table})
"""


def captures_select_sql(dialect: str, table: str = "events") -> str:
    """Per-page capture history for recrawl scheduling: 8 consecutive
    event ids form one logical page's captures at the events table's
    real timestamps; ``version`` is a small-alphabet content hash
    whose alphabet size (2-5) varies per page, so observed change
    rates spread across pages. Single-capture degenerate pages do not
    occur (ids are contiguous), but the operator guards span 0
    anyway."""
    d = " div " if dialect == "spark" else " // "
    return f"""
SELECT event_id, event_id{d}8 AS page_key, ts,
       CAST(u % ((event_id{d}8) % 4 + 2) AS BIGINT) AS version
FROM (SELECT event_id, ts,
             (event_id * 2654435761 + 11) % 2147483648 AS u
      FROM {table})
"""


def alt_html_select_sql(dialect: str, table: str = "documents") -> str:
    """Synthetic page HTML carrying hreflang alternate links:
    (doc_id, page_url, page_lang, html). Each document IS one language
    edition of a (domain, pid) page and lists the other three
    editions as <link rel="alternate" hreflang=...> tags — except
    that 'fr' editions of pid % 5 = 0 pages OMIT their 'en' alternate
    (a deterministic reciprocity defect for the audit to find).
    Editions exist only where the doc hash lands, so organic one-way
    links appear too. Pure integer/string arithmetic, identical in
    both dialects."""
    # md5-derived fields, NOT linear congruences: sequential doc_ids
    # under linear maps walk a lattice whose joint (lang, dom, pid)
    # has period lcm(4,40,25) = 200, so editions cluster on 5% of the
    # grid and measured reciprocity collapsed to ~2% vs the ~12%
    # slot-occupancy expectation; md5 mixes, restoring independence
    if dialect == "spark":
        def h(salt: str) -> str:
            return (f"CAST(conv(substr(md5(concat('{salt}|', "
                    f"CAST(doc_id AS STRING))), 1, 8), 16, 10) "
                    f"AS BIGINT)")
    else:
        def h(salt: str) -> str:
            return (f"CAST(CAST(concat('0x', substr(md5('{salt}|' || "
                    f"CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) "
                    f"AS BIGINT)")
    lang = (f"CASE (u % 4) WHEN 0 THEN 'en' WHEN 1 THEN 'fr' "
            f"WHEN 2 THEN 'de' ELSE 'es' END")
    dom = f"CAST(u2 % 40 AS STRING)"
    pid = f"CAST(u3 % 25 AS STRING)"

    def url(lg: str) -> str:
        return (f"'https://' || {lg} || '.d' || {dom}"
                f" || '.example/p/' || {pid}")

    def tag(lg: str) -> str:
        return (f"'<link rel=\"alternate\" hreflang=\"' || {lg}"
                f" || '\" href=\"' || {url(lg)} || '\">'")

    alts = []
    for i, lg in enumerate(["'en'", "'fr'", "'de'", "'es'"]):
        cond = (f"CASE WHEN lang <> {lg} AND NOT (lang = 'fr' "
                f"AND {lg} = 'en' AND (u3 % 25) % 5 = 0) "
                f"THEN {tag(lg)} ELSE '' END")
        alts.append(cond)
    body = " || ".join(alts)
    return f"""
SELECT doc_id, page_url, lang AS page_lang,
       '<head>' || {body} || '</head>' AS html
FROM (SELECT doc_id, u, u2, u3, {lang} AS lang,
             {url('lang')} AS page_url
      FROM (SELECT doc_id,
                   {h('la')} AS u,
                   {h('do')} AS u2,
                   {h('pi')} AS u3
            FROM {table}))
"""
