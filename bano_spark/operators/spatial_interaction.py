"""Spatial-interaction models: Huff market shares and doubly-
constrained gravity balancing (iterative proportional fitting).

BANO assigns every address to exactly one commune (hard PIP
containment, `bano/sql/...` point-in-polygon); retail/catchment
analytics over the same geography want the PROBABILISTIC assignment —
Huff (1963): P(i→j) = A_j d_ij^-β / Σ_k A_k d_ik^-β over candidate
sites k — and OD seed matrices balanced to known margins — the
classic doubly-constrained gravity model solved by IPF (Deming &
Stephan 1940; Wilson 1970), the same alternating row/column scaling
used for survey raking.

Scale shape:
- Huff candidate sets come from a bounded k-ring equi-join on the
  coarse cell key (the engine's standard blocking discipline — never
  demand × all-sites); the per-point normalization is a partitioned
  window sum, and top-share selection a row_number window on the same
  partitioning, so one shuffle on point id serves both.
- IPF scales per-iteration by margin factors computed with ONE
  groupBy per axis; factors are O(|rows| + |cols|) and broadcast back
  — the big OD frame shuffles once per scaling step on a key with
  uniform fan-out, and iterations are a fixed driver-side loop (the
  model converges geometrically; 3-5 steps is standard practice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def huff_shares(points: DataFrame, sites: DataFrame, cell: float, *,
                px: str = "x", py: str = "y", pid: str = "event_id",
                sx: str = "nx", sy: str = "ny", sid: str = "node_id",
                attract_col: str = "attract", beta_dsq: bool = True,
                ring: int = 1, round_to: int = 6) -> DataFrame:
    """Top Huff-model site per demand point with its choice
    probability, over candidate sites in the (2·ring+1)² coarse-cell
    neighborhood (documented truncation — distant sites contribute
    ~d^-2 mass and are dropped by the same k-ring discipline as
    `nearest_site_join`). Weight = attract / d² (β = 2, the standard
    retail decay). Ties break by site id."""
    pc = points.select(
        pid, px, py,
        F.floor(F.col(px) / cell).cast("bigint").alias("_cx"),
        F.floor(F.col(py) / cell).cast("bigint").alias("_cy"))
    offs = [(dx, dy) for dx in range(-ring, ring + 1)
            for dy in range(-ring, ring + 1)]
    arr = F.array(*[F.struct(F.lit(a).alias("dx"), F.lit(b).alias("dy"))
                    for a, b in offs])
    sc = (sites.select(
        sid, sx, sy, F.col(attract_col).alias("_a"),
        F.floor(F.col(sx) / cell).cast("bigint").alias("_bx"),
        F.floor(F.col(sy) / cell).cast("bigint").alias("_by"),
        F.explode(arr).alias("o"))
        .select(sid, sx, sy, "_a",
                (F.col("_bx") + F.col("o.dx")).alias("_cx"),
                (F.col("_by") + F.col("o.dy")).alias("_cy")))
    dsq = ((F.col(px) - F.col(sx)) * (F.col(px) - F.col(sx))
           + (F.col(py) - F.col(sy)) * (F.col(py) - F.col(sy)))
    cand = (pc.join(sc, ["_cx", "_cy"])
            .select(pid, sid, (F.col("_a") / dsq).alias("_w")))
    wp = Window.partitionBy(pid)
    share = (F.col("_w") / F.sum("_w").over(wp))
    # rank by raw weight: share is monotone in _w within a point (the
    # denominator is constant per partition), so this is the same order
    # as share desc without referencing a lateral alias in the window
    ranked = cand.select(
        pid, sid, share.alias("_share"),
        F.count(F.lit(1)).over(wp).cast("bigint").alias("n_candidates"),
        F.row_number().over(
            Window.partitionBy(pid)
            .orderBy(F.desc("_w"), F.asc(sid))).alias("_rn"))
    return (ranked.filter(F.col("_rn") == 1)
            .select(pid, F.col(sid).alias("best_site"), "n_candidates",
                    F.round("_share", round_to).alias("share")))


def ipf_balance(seed: DataFrame, row_targets: DataFrame,
                col_targets: DataFrame, iters: int = 3, *,
                i_col: str = "i", j_col: str = "j", t_col: str = "t",
                o_col: str = "o_target", d_col: str = "d_target",
                round_to: int = 6) -> DataFrame:
    """Doubly-constrained IPF: alternately scale rows of the seed OD
    matrix to `row_targets` and columns to `col_targets`, ``iters``
    full (row+column) passes, finishing on the column step. Margin
    factor frames are tiny and broadcast; the OD frame is the only
    big operand and shuffles once per step. Each full pass ends on a
    localCheckpoint — the engine's iterative-loop discipline
    (components.py): without it the lineage doubles per pass and
    Catalyst planning goes super-linear past ~4 passes."""
    cur = seed.select(i_col, j_col, F.col(t_col).cast("double").alias("_t"))
    rt = F.broadcast(row_targets.select(i_col, F.col(o_col).alias("_ot")))
    ct = F.broadcast(col_targets.select(j_col, F.col(d_col).alias("_dt")))
    for _ in range(iters):
        rows = cur.groupBy(i_col).agg(F.sum("_t").alias("_rs"))
        cur = (cur.join(F.broadcast(rows.join(rt, i_col)), i_col)
               .select(i_col, j_col,
                       (F.col("_t") * F.col("_ot") / F.col("_rs"))
                       .alias("_t")))
        cols = cur.groupBy(j_col).agg(F.sum("_t").alias("_cs"))
        cur = (cur.join(F.broadcast(cols.join(ct, j_col)), j_col)
               .select(i_col, j_col,
                       (F.col("_t") * F.col("_dt") / F.col("_cs"))
                       .alias("_t"))
               .localCheckpoint(eager=False))
    return cur.select(i_col, j_col,
                      F.round("_t", round_to).alias("t_balanced"))


def two_step_fca(demand: DataFrame, supply: DataFrame, d0: float, *,
                 did: str = "event_id", dx: str = "x", dy: str = "y",
                 dw: str = "demand", sid: str = "node_id",
                 sx: str = "nx", sy: str = "ny", sw: str = "supply",
                 round_to: int = 6) -> DataFrame:
    """Two-step floating catchment area accessibility (Luo & Wang
    2003): step 1 gives each supply site its ratio R_j = S_j /
    (sum of demand within d0); step 2 gives each demand point
    A_i = sum of R_j over sites within d0 — the standard
    supply-vs-need accessibility surface (clinics per capita within
    reach, mirrors per crawl region).

    Scale shape: BOTH catchment joins are the engine's 3x3 coarse-cell
    ring at cell size d0 (every pair within d0 shares a ring —
    complete, never a cross product) with the exact d^2 <= d0^2
    refine; each step is one equi-join + one groupBy. Demand points
    with no reachable supply keep A_i = 0 (left join, documented)."""
    c = float(d0)
    dd = demand.select(
        F.col(did), F.col(dx), F.col(dy),
        F.col(dw).cast("double").alias("_dw"),
        F.floor(F.col(dx) / c).cast("bigint").alias("_cx"),
        F.floor(F.col(dy) / c).cast("bigint").alias("_cy"))
    offs = F.array(*[F.struct(F.lit(a).alias("dx"), F.lit(b).alias("dy"))
                     for a in (-1, 0, 1) for b in (-1, 0, 1)])
    ss = (supply.select(
        F.col(sid), F.col(sx), F.col(sy),
        F.col(sw).cast("double").alias("_sw"),
        F.floor(F.col(sx) / c).cast("bigint").alias("_bx"),
        F.floor(F.col(sy) / c).cast("bigint").alias("_by"),
        F.explode(offs).alias("o"))
        .select(sid, sx, sy, "_sw",
                (F.col("_bx") + F.col("o.dx")).alias("_cx"),
                (F.col("_by") + F.col("o.dy")).alias("_cy")))
    d2 = ((F.col(dx) - F.col(sx)) * (F.col(dx) - F.col(sx))
          + (F.col(dy) - F.col(sy)) * (F.col(dy) - F.col(sy)))
    within = dd.join(ss, ["_cx", "_cy"]).filter(d2 <= F.lit(c * c))
    ratio = (within.groupBy(sid)
             .agg(F.first("_sw").alias("_sw"),
                  F.sum("_dw").alias("_dsum"))
             .select(sid, (F.col("_sw") / F.col("_dsum")).alias("_r")))
    acc = (within.select(did, sid)
           .join(ratio, sid)
           .groupBy(did).agg(F.sum("_r").alias("_a")))
    return (demand.select(did)
            .join(acc, did, "left")
            .select(did,
                    F.round(F.coalesce("_a", F.lit(0.0)), round_to)
                    .alias("accessibility")))


def distance_decay_fit(flows: DataFrame, *, t_col: str = "t",
                       mi_col: str = "mi", mj_col: str = "mj",
                       d_col: str = "d",
                       round_to: int = 6) -> DataFrame:
    """Gravity distance-decay calibration: OLS of
    ln(T_ij / (m_i m_j)) on ln d_ij gives intercept ln k and slope
    -beta — the one-predictor calibration (masses absorbed) every
    spatial-interaction model starts from (Wilson 1970; Fotheringham
    & O'Kelly 1989). Zero flows drop (ln undefined — disclosed, the
    standard practice).

    Scale shape: ONE aggregation pass over the OD frame
    (covar/var moments with map-side partials), O(1) closed-form
    solve. Returns one row (n_pairs, ln_k, beta, r2)."""
    lx = F.log(F.col(d_col))
    ly = F.log(F.col(t_col) / (F.col(mi_col) * F.col(mj_col)))
    d = flows.filter((F.col(t_col) > 0) & (F.col(d_col) > 0))
    agg = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
                F.avg(lx).alias("mx"), F.avg(ly).alias("my"),
                F.covar_pop(lx, ly).alias("cxy"),
                F.var_pop(lx).alias("vx"), F.var_pop(ly).alias("vy"))
    slope = F.col("cxy") / F.col("vx")
    return agg.select(
        "n_pairs",
        F.round(F.col("my") - slope * F.col("mx"), round_to)
        .alias("ln_k"),
        F.round(-slope, round_to).alias("beta"),
        F.round(F.col("cxy") * F.col("cxy")
                / (F.col("vx") * F.col("vy")), round_to).alias("r2"))
