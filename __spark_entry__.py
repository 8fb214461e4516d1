"""Driver contract: entry / queries / oracle_sql.

Each query exercises one engine operator from SURVEY.md §2 over the
driver's parquet tables. Geometry-bearing inputs are *derived
deterministically* from those tables with integer-exact arithmetic (see
bano_spark/synth.py) so the DuckDB oracle can reproduce them
bit-for-bit; the Spark side runs the real engine code path (cell-cover
spatial joins, pandas-UDF normalization, ...), the oracle re-expresses
the same semantics in independent ANSI SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bano_spark import synth
from bano_spark.functions.normalize import normalize_udf
from bano_spark.geo import tiles
from bano_spark.operators import conciliation as conc
from bano_spark.operators import tiling
from bano_spark.operators.pip_join import spatial_join

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# ---------------------------------------------------------------------------
# shared derivation SQL (dialect differences: integer division, cast name)
# ---------------------------------------------------------------------------

def _pts_cte(dialect: str) -> str:
    return "pts AS (" + synth.points_select_sql(dialect) + ")"


def _spark_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synth.points_df(spark, sf_dir)


Z = tiles.DEFAULT_ZOOM  # 16
_CELL = tiles.cell_size(Z)

# ---------------------------------------------------------------------------
# q01 — cell-bucketed point-in-polygon join (J1), counts per commune
# ---------------------------------------------------------------------------

_Q01_ORACLE = f"""
WITH {_pts_cte('duckdb')}
SELECT c.insee_com, c.dept, c.admin_level, COUNT(*) AS n_points
FROM pts p
JOIN {synth.communes_values_sql()}
  ON p.x >= c.xmin AND p.x < c.xmax AND p.y >= c.ymin AND p.y < c.ymax
GROUP BY 1, 2, 3
ORDER BY 1
"""


@register("pip_count_per_commune", _Q01_ORACLE)
def q_pip(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _spark_points(spark, sf_dir)
    polys = synth.commune_polygons_df(spark)
    joined = spatial_join(pts, polys, x="x", y="y", id_col="insee_com",
                          verts_col="verts", zoom=12)
    return (
        joined.groupBy("insee_com", "dept", "admin_level")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .orderBy("insee_com")
    )


# ---------------------------------------------------------------------------
# q02 — z16 tile assignment of points (M5), per-tile counts
# ---------------------------------------------------------------------------

_Q02_ORACLE = f"""
WITH {_pts_cte('duckdb')}
SELECT CAST(floor((x - ({tiles.ORIGIN!r})) / {_CELL!r}) AS BIGINT) AS tx,
       CAST(floor(({-tiles.ORIGIN!r} - y) / {_CELL!r}) AS BIGINT) AS ty,
       COUNT(*) AS n
FROM pts
GROUP BY 1, 2
"""


@register("tile_assignment_counts", _Q02_ORACLE)
def q_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _spark_points(spark, sf_dir)
    return (
        pts.select(
            tiles.tile_x(F.col("x"), Z).alias("tx"),
            tiles.tile_y(F.col("y"), Z).alias("ty"),
        )
        .groupBy("tx", "ty")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# q03 — expired-tile -> commune assignment (J14) with the reference's
# admin-level special-casing (bano/models.py:339-360)
# ---------------------------------------------------------------------------

_Q03_ORACLE = f"""
WITH {_pts_cte('duckdb')},
et AS (
  SELECT DISTINCT
      CAST(floor((x - ({tiles.ORIGIN!r})) / {_CELL!r}) AS BIGINT) AS tx,
      CAST(floor(({-tiles.ORIGIN!r} - y) / {_CELL!r}) AS BIGINT) AS ty
  FROM pts
),
boxes AS (
  SELECT ({tiles.ORIGIN!r}) + {_CELL!r} * tx AS xmin,
         ({tiles.ORIGIN!r}) + {_CELL!r} * (tx + 1) AS xmax,
         ({-tiles.ORIGIN!r}) - {_CELL!r} * (ty + 1) AS ymin,
         ({-tiles.ORIGIN!r}) - {_CELL!r} * ty AS ymax
  FROM et
)
SELECT DISTINCT c.insee_com
FROM boxes e
JOIN {synth.communes_values_sql()}
  ON e.xmin <= c.xmax AND e.xmax >= c.xmin AND e.ymin <= c.ymax AND e.ymax >= c.ymin
WHERE (c.admin_level = 8 AND c.insee_com NOT IN ('13055','69123','75056'))
   OR (c.admin_level = 9 AND (c.insee_com LIKE '132__' OR c.insee_com LIKE '6938_'
                              OR c.insee_com LIKE '751__'))
ORDER BY 1
"""


@register("expired_tiles_to_insee", _Q03_ORACLE)
def q_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _spark_points(spark, sf_dir)
    tiles_df = pts.select(
        F.lit(Z).alias("z"),
        tiles.tile_x(F.col("x"), Z).alias("x"),
        tiles.tile_y(F.col("y"), Z).alias("y"),
    ).distinct()
    return tiling.expired_tiles_to_insee(tiles_df, synth.commune_polygons_df(spark), Z)


# ---------------------------------------------------------------------------
# q04 — street-name normalization (C1) via the byte-exact pandas UDF;
# oracle maps the bounded vocabulary to pre-verified goldens
# ---------------------------------------------------------------------------

def _street_case(col: str, idx: int) -> str:
    """CASE mapping key%len(STREETS) -> raw or normalized literal."""
    whens = "\n    ".join(
        f"WHEN {col} % {len(synth.STREETS)} = {i} THEN '{(s[idx]).replace(chr(39), chr(39) * 2)}'"
        for i, s in enumerate(synth.STREETS)
    )
    return f"CASE {whens} END"


_Q04_ORACLE = f"""
SELECT c_custkey,
       {_street_case('c_custkey', 0)} AS nom,
       {_street_case('c_custkey', 1)} AS nom_norm
FROM customer
ORDER BY c_custkey
"""


@register("normalize_street", _Q04_ORACLE)
def q_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _read(spark, sf_dir, "customer")
    raw = F.element_at(
        F.array(*[F.lit(s[0]) for s in synth.STREETS]),
        (F.col("c_custkey") % len(synth.STREETS)).cast("int") + 1,
    )
    return (
        cust.select("c_custkey", raw.alias("nom"))
        .withColumn("nom_norm", normalize_udf(F.col("nom")))
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# q05 — housenumber canonicalization chain (C3), pure built-ins
# ---------------------------------------------------------------------------

_NUMS = ["2 BIS", "04", "10 TER", "99999", "3 QUATER", "5;7", "1à3", "0012 bis",
         "7 quat", ""]


def _num_case(col: str) -> str:
    whens = "\n    ".join(
        f"WHEN {col} % {len(_NUMS)} = {i} THEN '{n}'" for i, n in enumerate(_NUMS))
    return f"CASE {whens} END"


_Q05_ORACLE = f"""
SELECT o_orderkey,
       replace(replace(replace(replace(replace(replace(replace(replace(
         regexp_replace(upper({_num_case('o_orderkey')}), '^0*', ''),
         'BIS','B'),'TER','T'),'QUATER','Q'),'QUAT','Q'),' ',''),'à','-'),';',','),'"','')
       AS num
FROM orders
ORDER BY o_orderkey
"""


@register("housenumber_canon", _Q05_ORACLE)
def q_num(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders")
    raw = F.element_at(
        F.array(*[F.lit(n) for n in _NUMS]),
        (F.col("o_orderkey") % len(_NUMS)).cast("int") + 1,
    )
    return orders.select(
        "o_orderkey", conc.canonical_num(raw).alias("num")
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# q06 — multi-housenumber split + explode (C4)
# ---------------------------------------------------------------------------

_MULTI = ["2,4", "2-8", "2à6", "12", "1;3;5", "9/11"]


def _multi_case(col: str) -> str:
    whens = "\n    ".join(
        f"WHEN {col} % {len(_MULTI)} = {i} THEN '{n}'" for i, n in enumerate(_MULTI))
    return f"CASE {whens} END"


_Q06_ORACLE = f"""
SELECT o_orderkey, u.part AS num
FROM (SELECT o_orderkey, {_multi_case('o_orderkey')} AS numero FROM orders) t,
     UNNEST(str_split_regex(t.numero, '[,à;/*-]')) AS u(part)
ORDER BY o_orderkey, num
"""


@register("multinumber_explode", _Q06_ORACLE)
def q_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders")
    raw = F.element_at(
        F.array(*[F.lit(n) for n in _MULTI]),
        (F.col("o_orderkey") % len(_MULTI)).cast("int") + 1,
    )
    return (
        orders.select("o_orderkey", raw.alias("numero"))
        .select("o_orderkey", F.explode(conc.split_multinumber(F.col("numero"))).alias("num"))
        .orderBy("o_orderkey", "num")
    )


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the north-rule pipeline (extract -> cell index -> PIP
    join -> per-commune counts) at sf0.001."""
    return q_pip(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
