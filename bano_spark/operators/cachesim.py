"""Cache-policy replay — Belady's OPT (clairvoyant, the upper bound)
and LRU over the same access trace — the capacity-planning twin of
lru_stack_distance: "how much of our miss rate is policy, how much is
capacity?" is answered by the OPT-LRU gap at the production cache
size.

Mechanics: next-use times are precomputed with ONE per-(group, key)
lead() window (Belady's classic transformation — the clairvoyance is
just a lag in reverse), then each group's trace folds through a
FIXED-C slot-vector accumulator: C (key, priority) slots where empty
slots carry priority +inf, so "fill an empty slot" and "evict the
max-priority slot" are the same rule. OPT priority = next-use time
(never-used-again = 1e18 sentinel, empty = 1e19); LRU priority =
-last-use time (so max = least recent). Hit = key present; ties break
on the lowest slot index — deterministic because the slot vector
evolves identically on every engine.

Scale shape: one window shuffle on (group, key) + one groupBy shuffle
on group, then an O(C) fold step — no Python, no global state; state
is 2C+1 doubles per group. The trace array is the group's length:
bound groups (shard traces by time window) before folding unbounded
ones. Exactness: hits are integer counts; the only division is the
final hit ratio (round 6).

cite: Belady 1966 (IBM Syst. J. 5-2); the reference has no cache
layer — this is LLM-pipeline ops tooling (feature-store / shard-cache
sizing) per the training-data mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["cache_replay"]

NEVER = 1.0e18
EMPTY = 1.0e19


def _fold(C: int, policy: str) -> str:
    """Build the SQL fold expression over `tr` (array of struct(t, k,
    nu)), returning struct('h', hits, 'k1'..'kC', 'p1'..'pC')."""
    # priority of the incoming access under each policy
    vprio = "v.nu" if policy == "opt" else "(0.0 - v.t)"
    hit = " OR ".join(f"s.k{i} = v.k" for i in range(1, C + 1))
    mx = "greatest(" + ", ".join(f"s.p{i}" for i in range(1, C + 1)) + ")"
    idx = ("CASE " + " ".join(f"WHEN s.p{i} = {mx} THEN {i}.0"
                              for i in range(1, C + 1)) + " END")
    init = ", ".join(f"'k{i}', CAST(-1 AS DOUBLE), 'p{i}', "
                     f"CAST({EMPTY!r} AS DOUBLE)"
                     for i in range(1, C + 1))
    fields = ["'h', s2.h + IF(x.hit, 1.0, 0.0)"]
    for i in range(1, C + 1):
        fields.append(
            f"'k{i}', CASE WHEN x.hit THEN s2.k{i} "
            f"WHEN x.idx = {i}.0 THEN v.k ELSE s2.k{i} END")
        fields.append(
            f"'p{i}', CASE WHEN x.hit THEN "
            f"(CASE WHEN s2.k{i} = v.k THEN {vprio} ELSE s2.p{i} END) "
            f"WHEN x.idx = {i}.0 THEN {vprio} ELSE s2.p{i} END")
    # hit/idx are computed ONCE per step in the single-element array
    # (outer scope: s, v), then the slot rewrite reads them as x.*
    # with the accumulator rebound to s2
    step = (f"aggregate(array(named_struct('hit', {hit}, "
            f"'idx', {idx})), s, (s2, x) -> "
            f"named_struct({', '.join(fields)}))")
    return (f"aggregate(tr, named_struct('h', CAST(0 AS DOUBLE), {init}), "
            f"(s, v) -> {step})")


def cache_replay(df: DataFrame, grp: str, t_col: str, key_col: str, *,
                 capacity: int = 4, policy: str = "opt") -> DataFrame:
    """Replay each group's access trace under `policy` ('opt'|'lru')
    with `capacity` slots. Returns (grp, n_accesses, n_keys, hits,
    hit_ratio).

    Key domain precondition (enforced, loud): keys must lie in
    [0, 2^53]. The slot vector stores keys as doubles with -1.0 as
    the empty-slot sentinel, so a legitimate key of -1 would alias an
    empty slot and keys beyond 2^53 would lose exactness — either
    silently corrupts hit detection. Out-of-domain keys raise at
    execution time via raise_error() rather than mis-replaying.
    """
    if policy not in ("opt", "lru"):
        raise ValueError("cache_replay: policy must be 'opt' or 'lru'")
    if not 1 <= capacity <= 16:
        raise ValueError("cache_replay: capacity must be in 1..16")
    g, t = F.col(grp), F.col(t_col).cast("double")
    # domain guard: negative keys alias the -1.0 empty sentinel and
    # >2^53 keys lose exactness as doubles — fail loudly per row
    k = F.expr(
        f"CASE WHEN {key_col} >= 0 AND {key_col} <= 9007199254740992 "
        f"THEN CAST({key_col} AS DOUBLE) "
        f"ELSE CAST(raise_error(concat('cache_replay: key out of "
        f"[0, 2^53] domain: ', CAST({key_col} AS STRING))) "
        f"AS DOUBLE) END")
    w = Window.partitionBy(grp, key_col).orderBy(t_col)
    d = df.select(
        g.alias("g"), t.alias("t"), k.alias("k"),
        F.coalesce(F.lead(t_col).over(w).cast("double"),
                   F.lit(NEVER)).alias("nu"))
    row = F.struct(F.col("t"), F.col("k"), F.col("nu"))
    agged = (d.groupBy("g")
             .agg(F.array_sort(F.collect_list(row)).alias("tr"),
                  F.countDistinct("k").cast("bigint").alias("n_keys")))
    st = F.expr(_fold(capacity, policy))
    return (agged.select(F.col("g").alias(grp),
                         F.size("tr").cast("bigint").alias("n_accesses"),
                         "n_keys", st.alias("_st"))
            .select(grp, "n_accesses", "n_keys",
                    F.col("_st.h").cast("bigint").alias("hits"),
                    F.round(F.col("_st.h")
                            / F.col("n_accesses").cast("double"), 6)
                    .alias("hit_ratio")))
