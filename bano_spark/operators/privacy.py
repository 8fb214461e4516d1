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
