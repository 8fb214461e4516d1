"""Local differential privacy: generalized randomized response.

``randomized_response_freq`` — Warner 1965 / the k-ary GRR mechanism
used by RAPPOR-style telemetry: each row reports its TRUE category
with probability 1-p and a uniform category (out of all k) with
probability p.  The collector never sees raw values, yet unbiased
frequencies recover exactly: E[obs_c] = n_c (1-p) + n p / k, so
est_c = (obs_c - n p / k) / (1-p).  With rational p = num/den and a
deterministic hash draw, the estimator reduces to ONE division of
exact integers: est_c = (den*k*obs_c - num*n) / (k*(den - num)).

Ref parity: the reference publishes only aggregated per-commune
counts for privacy (stats.sql aggregates, no raw addresses in munin);
GRR is the collector-side mechanism that would let it gather
per-source telemetry without seeing raw values at all.

Scale shape: the perturbation is a per-row column expression (hash
arithmetic, no Python, no shuffle); estimation is one hash aggregate
over k categories joined with the ground-truth counts (k rows,
broadcast).  At 10^12 rows: one grouped scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def randomized_response_freq(df: DataFrame, cat_col: str, id_col: str,
                             categories: list[str], *, num: int = 1,
                             den: int = 4,
                             salt: int = 191) -> DataFrame:
    """Perturb with p = num/den, then debias.  Returns one row per
    category: (category, true_count, reported_count, est, err)."""
    k = len(categories)
    u1 = (F.col(id_col) * 2654435761 + salt) % 2147483648
    u2 = (F.col(id_col) * 2654435761 + salt + 2) % 2147483648
    flip = (u1 % den) < num
    arr = F.array(*[F.lit(c) for c in categories])
    # high hash bits via shiftright — low bits are periodic in the id
    reported = F.when(flip, F.element_at(
        arr, (F.shiftright(u2.cast("bigint"), 10) % k + 1)
        .cast("int"))).otherwise(F.col(cat_col))
    per = df.select(F.col(cat_col).alias("true_cat"),
                    reported.alias("rep_cat"))
    t = (per.groupBy(F.col("true_cat").alias("category"))
         .agg(F.count("*").cast("bigint").alias("true_count")))
    r = (per.groupBy(F.col("rep_cat").alias("category"))
         .agg(F.count("*").cast("bigint").alias("reported_count")))
    n = per.agg(F.count("*").cast("bigint").alias("n"))
    est = (F.col("reported_count") * (den * k) - F.col("n") * num) \
        .cast("double") / float(k * (den - num))
    return (t.join(r, "category", "full")
            .fillna(0, ["true_count", "reported_count"])
            .crossJoin(F.broadcast(n))
            .select("category", "true_count", "reported_count",
                    (est + F.lit(0.0)).alias("est"),
                    (est - F.col("true_count") + F.lit(0.0))
                    .alias("err"))
            .orderBy("category"))


def t_closeness(df: DataFrame, qi: str, s: str, m: int) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007):
    per equivalence class, the ORDERED Earth-Mover's Distance between
    the class's sensitive-value distribution and the global one —
    EMD = (1/(m-1)) * sum_i |sum_{j<=i} (P_c(j) - Q(j))| for an
    ordinal sensitive attribute with m levels 0..m-1.

    Scale shape: two keyed aggregations (class x level, then class)
    plus an O(m) broadcast of the global distribution; the EMD fold
    runs over the class's SORTED m-length level array inside the JVM
    (fixed order => deterministic double chain; class/level counts are
    exact integers, so P and Q are IEEE divisions — identical bits on
    both engines, shipped unrounded).
    """
    ncs = (df.groupBy(F.col(qi).alias("cls"), F.col(s).alias("lv"))
           .agg(F.count(F.lit(1)).cast("bigint").alias("ncs")))
    nc = ncs.groupBy("cls").agg(F.sum("ncs").cast("bigint").alias("nc"))
    glob = (df.groupBy(F.col(s).alias("lv"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("ns")))
    ntot = df.count()
    spark = df.sparkSession
    dom = (nc.crossJoin(F.broadcast(
        spark.range(m).select(F.col("id").cast("bigint").alias("lv")))))
    full = (dom.join(ncs, ["cls", "lv"], "left")
            .join(F.broadcast(glob), "lv", "left")
            .select("cls", "lv", "nc",
                    F.coalesce("ncs", F.lit(0)).cast("bigint")
                    .alias("ncs"),
                    F.coalesce("ns", F.lit(0)).cast("bigint")
                    .alias("ns")))
    pd_ = (F.col("ncs").cast("double") / F.col("nc").cast("double")
           - F.col("ns").cast("double") / F.lit(float(ntot)))
    fold = F.expr(f"""
        aggregate(seq,
          named_struct('cum', CAST(0 AS DOUBLE), 't', CAST(0 AS DOUBLE)),
          (a, p) -> named_struct('cum', a.cum + p,
                                 't', a.t + abs(a.cum + p)),
          a -> a.t / CAST({m - 1} AS DOUBLE))""")
    return (full
            .groupBy("cls")
            .agg(F.min("nc").alias("n"),
                 F.array_sort(F.collect_list(F.struct("lv", pd_.alias(
                     "pd")))).alias("sq"))
            .withColumn("seq", F.expr("transform(sq, r -> r.pd)"))
            .select("cls", "n", fold.alias("emd")))


def dp_laplace_histogram(df: DataFrame, cat: str, eps: list[float],
                         seed: int = 131) -> DataFrame:
    """Differentially-private histogram with DETERMINISTIC pseudo-noise
    for auditability: per (category, epsilon), Laplace(1/eps) noise via
    the inverse CDF at a uniform derived from a content hash of the
    cell (sum of ids), so the 'draw' is reproducible on any engine.
    noisy = n + b * sign(v) * ln(1 - 2|v|) with v = u/2^31 - 0.5,
    b = -1/eps (sensitivity 1 for disjoint count cells).

    One groupBy over the data; the epsilon grid is a broadcast literal
    cross join. ln() is libm — consumers round to 6.
    """
    spark = df.sparkSession
    base = (df.groupBy(F.col(cat).alias("cat"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("true_n"),
                 F.sum(F.col("event_id")).cast("bigint").alias("idsum")))
    edf = spark.createDataFrame([(e,) for e in eps], "eps: double")
    j = base.crossJoin(F.broadcast(edf))
    u = (F.col("idsum") * F.lit(2654435761) + F.lit(seed)
         + F.ceil(F.col("eps") * 1000).cast("bigint")) % F.lit(2 ** 31)
    # +0.5 keeps v strictly inside (-0.5, 0.5): u = 0 would otherwise
    # land on v = -0.5 exactly and ln(0) = -inf
    v = (u.cast("double") + F.lit(0.5)) / F.lit(float(2 ** 31)) \
        - F.lit(0.5)
    draw = (F.lit(-1.0) / F.col("eps")) * F.signum(v) \
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(v))
    return (j.withColumn("noisy", F.col("true_n").cast("double") + draw)
            .withColumn("abs_err", F.abs(F.col("noisy")
                                         - F.col("true_n"))))
