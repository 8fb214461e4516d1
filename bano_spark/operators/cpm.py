"""Critical-path method (CPM) scheduling on a task DAG.

Forward pass: earliest start ES(v) = max over predecessors of their
earliest finish EF(u) = ES(u) + dur(u) (0 at sources).  Backward
pass: latest finish LF(u) = min over successors of their latest start
LS(v) = LF(v) - dur(v) (makespan at sinks).  Slack = LF - EF;
critical tasks have slack 0 — the longest-path skeleton of the DAG.

Distributed shape: each relaxation round is one join (edges x current
labels) + one groupBy max/min — the SSSP/Bellman-Ford shape with max
instead of min, keyed on the task id, `localCheckpoint` per round to
keep Catalyst lineage linear (components.py discipline).  Rounds
needed = DAG depth; like k_core (and unlike the pre-advice
sssp_weighted), non-convergence within max_rounds raises LOUDLY
rather than returning silently-wrong labels, and convergence is
detected STRUCTURALLY (no label changed this round — an exact
anti-join count, never a float-sum compare).

Exactness: integer durations -> integer ES/EF/LF/slack everywhere.

Ref parity: the reference's department build pipeline is a dependency
chain of per-source stages executed serially (bano/cron_dept.sh);
CPM is the scheduling algebra of exactly such dependency DAGs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["cpm_forward", "cpm_schedule"]


def _relax(labels: DataFrame, edges: DataFrame, durs: DataFrame,
           max_rounds: int, forward: bool) -> DataFrame:
    """Shared fixpoint: labels (task, x) where x = ES (forward) or
    LF (backward).  Raises RuntimeError when max_rounds is hit without
    a fixpoint (loud runaway guard, not a silent cap)."""
    for _ in range(max_rounds):
        if forward:
            # candidate ES(v) = max over preds EF(u) = x(u) + dur(u)
            cand = (edges
                    .join(labels.withColumnRenamed("task", "src"), "src")
                    .join(durs.withColumnRenamed("task", "src"), "src")
                    .groupBy(F.col("dst").alias("task"))
                    .agg(F.max(F.col("x") + F.col("dur")).alias("c")))
        else:
            # candidate LF(u) = min over succs LS(v) = x(v) - dur(v)
            cand = (edges
                    .join(labels.withColumnRenamed("task", "dst"), "dst")
                    .join(durs.withColumnRenamed("task", "dst"), "dst")
                    .groupBy(F.col("src").alias("task"))
                    .agg(F.min(F.col("x") - F.col("dur")).alias("c")))
        better = F.greatest if forward else F.least
        nxt = (labels.join(cand, "task", "left")
               .select("task",
                       better(F.col("x"), F.coalesce(
                           F.col("c"), F.col("x"))).alias("x"))
               .localCheckpoint(eager=False))
        n_changed = (nxt.withColumnRenamed("x", "x2")
                     .join(labels, "task")
                     .filter(F.col("x2") != F.col("x")).count())
        if n_changed == 0:
            return nxt
        labels = nxt
    raise RuntimeError(
        f"CPM {'forward' if forward else 'backward'} pass did not "
        f"converge in {max_rounds} rounds — cycle or depth exceeds "
        "the guard; raise max_rounds explicitly if the DAG is that "
        "deep.")


def cpm_forward(tasks: DataFrame, edges: DataFrame,
                max_rounds: int = 64) -> DataFrame:
    """(task, dur) x (src, dst) -> (task, dur, es, ef)."""
    durs = tasks.select("task", F.col("dur").cast("bigint").alias("dur"))
    labels = durs.select("task", F.lit(0).cast("bigint").alias("x"))
    es = _relax(labels, edges, durs, max_rounds, forward=True)
    return (durs.join(es, "task")
            .select("task", "dur", F.col("x").alias("es"),
                    (F.col("x") + F.col("dur")).alias("ef")))


def cpm_schedule(tasks: DataFrame, edges: DataFrame,
                 max_rounds: int = 64) -> DataFrame:
    """Full CPM: (task, dur, es, ef, ls, lf, slack, is_critical).

    makespan = max EF; backward labels start at makespan everywhere
    (non-sinks tighten via successors)."""
    fwd = cpm_forward(tasks, edges, max_rounds)
    from bano_spark.cache import keep
    fwd = keep(fwd)
    makespan = fwd.agg(F.max("ef").alias("m"))
    durs = tasks.select("task", F.col("dur").cast("bigint").alias("dur"))
    labels = (durs.crossJoin(F.broadcast(makespan))
              .select("task", F.col("m").cast("bigint").alias("x")))
    lf = _relax(labels, edges, durs, max_rounds, forward=False)
    return (fwd.join(lf, "task")
            .select("task", "dur", "es", "ef",
                    (F.col("x") - F.col("dur")).alias("ls"),
                    F.col("x").alias("lf"),
                    (F.col("x") - F.col("ef")).alias("slack"),
                    (F.col("x") - F.col("ef") == 0).alias("is_critical")))
