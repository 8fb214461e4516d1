"""Explain-plan audit: print the physical plan of each headline query
and check the properties that matter at 100 TB — broadcast joins where
the build side is small, whole-stage codegen coverage, no Cartesian
products, parquet filter/column pushdown. Writes EXPLAIN.md.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from bano_spark.session import get_session

AUDITED = [
    "pip_count_per_commune",
    "end_to_end_csv_export",
    "dup_span_stats",
    "knn_nearest_points",
    "json_voies_export",
    "benchmark_decontamination",
    "canonical_url",
    "street_line_merge",
    "conciliation_export",
    "knn_name_match",
    "postal_smallest_polygon",
    "minhash_lsh_pairs",
    "ann_cosine_topk",
    "ivf_topk",
    "cog_enrichment_join",
    "windowed_event_counts",
    "token_budget_selection",
    "minhash_lsh_safe_pairs",
    "json_lieux_dits_export",
    "dup_span_removal",
    "host_quality_rollup",
    "ivf_topk_nprobe",
    "communes_summary_rollup",
    "bigram_lm_score",
    "sessionize_events",
    "tiles_vectorize",
    "semdedup_prune",
    "dsir_importance",
    "tile_pyramid",
    "source_mixing",
    "top_ngrams",
    "dwithin_pairs",
    "asof_join_events",
    "interval_join_events",
    "exact_quantiles",
    "kmeans_assign",
    "pq_adc_topk",
    "pagerank_hosts",
    "inverted_index",
    "bm25_topk",
    "weighted_sample",
    "weighted_sample_per_source",
    "bloom_pruned_join",
    "allpairs_jaccard",
    "json_props_parse",
    "doclen_quantile_rank",
    "source_kl_divergence",
    "embedding_covariance",
    "mad_outliers",
    "scd2_intervals",
    "cdc_apply",
    "event_funnel",
    "retention_cohorts",
    "polygon_intersects_join",
    "triangle_participation",
    "event_transitions",
    "pareto_skyline",
    "incremental_view_merge",
    "trustrank_hosts",
    "zorder_keys",
    "grouping_sets_cube",
    "event_type_pivot",
    "scd2_asof_state",
    "bfs_distances",
    "pmi_cooccurrence",
    "cms_user_counts",
    "hits_hosts",
    "hopping_window_counts",
    "group_percentile_bands",
    "value_histogram",
    "polyline_geodesic_length",
    "geohash_cell_counts",
    "segment_intersections",
    "readability_scores",
    "lexical_diversity",
    "sorted_neighborhood_pairs",
    "rolling_time_window_avg",
    "windowed_zscore_anomalies",
    "kcore_nodes",
    "zonal_stats",
    "raster_focal_mean",
    "linear_fit_per_group",
    "token_entropy",
    "dbscan_chains",
    "simplify_polylines",
    "kmv_distinct_users",
    "hex_bin_counts",
    "hex_kring_smooth",
    "sssp_weighted",
    "line_interpolate_midpoint",
    "pip_donut_holes",
    "kmv_set_estimates",
    "label_propagation",
    "audio_features_meta",
    "ewma_per_user",
]

def _single_partition_ok(plan: str) -> bool:
    """True when every Exchange SinglePartition in the formatted plan
    feeds a final HashAggregate — i.e. it is the global scalar-aggregate
    pattern, whose exchange input is ONE partial row per upstream
    partition (bounded by parallelism, not by data). A SinglePartition
    exchange under anything else (Sort, Window, Limit-less project) is
    the r1 token_budget_selection funnel and fails."""
    # parse the details section block-by-block: a non-greedy regex over
    # the whole plan attributed the SinglePartition argument to the
    # FIRST Exchange id in the file, not the owning block (the audit
    # hole that passed a global-window plan in round 3)
    bad_ids = set()
    for block in re.split(r"\n\n+", plan):
        m = re.match(r"\((\d+)\) Exchange\b", block.strip())
        if m and "Arguments: SinglePartition" in block:
            bad_ids.add(m.group(1))
    if not bad_ids:
        return "SinglePartition" not in plan  # belt and braces
    tree = []
    for line in plan.splitlines():
        m = re.match(r"^([:+\- |*]*)\s*\*?\s*(\w[\w ]*?) \((\d+)\)\s*$", line)
        if m:
            marker = m.group(1)
            pos = max(marker.rfind("+-"), marker.rfind(":-"))
            tree.append((pos, m.group(2).strip(), m.group(3)))
    for i, (depth, name, nid) in enumerate(tree):
        if nid in bad_ids:
            parent = next((n for d, n, _ in reversed(tree[:i]) if d < depth),
                          None)
            if parent not in ("HashAggregate", "SortAggregate",
                              "ObjectHashAggregate"):
                return False
    return True


CHECKS = [
    ("no cartesian product", lambda p: "CartesianProduct" not in p, True),
    ("no shuffled nested loop", lambda p: "BroadcastNestedLoopJoin" not in p
     or "BuildRight" in p, True),
    ("whole-stage codegen present", lambda p: "codegen id" in p, True),
    ("broadcast join used", lambda p: "BroadcastHashJoin" in p
     or "BroadcastExchange" in p, False),
    ("parquet scan pruned (ReadSchema)", lambda p: "ReadSchema" in p, False),
    # the r1 token_budget_selection scale bug: an unpartitioned ordered
    # window plans Exchange SinglePartition. A SinglePartition exchange
    # is tolerated ONLY as the final step of a global scalar aggregate
    # (bounded to one partial row per partition by map-side combine).
    ("no single-partition exchange (except bounded global agg)",
     _single_partition_ok, True),
    # the north rule's "no per-row Python in the hot path":
    # BatchEvalPython is the row-at-a-time UDF operator; Arrow-batched
    # operators (ArrowEvalPython, MapInArrow/MapInPandas, FlatMap*)
    # are the sanctioned Python surface and do not trip this.
    ("no row-at-a-time Python UDF (BatchEvalPython)",
     lambda p: "BatchEvalPython" not in p, True),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("explain", cpus=4, shuffle_partitions=8,
                        extra={"spark.sql.adaptive.enabled": "false"})  # AQE off: show final codegen ids in explain
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    lines = ["# EXPLAIN — physical-plan audit of headline queries",
             "", f"Input: `{sf_dir}`; checks: no cartesian/nested-loop joins,",
             "whole-stage codegen, broadcast for small build sides, scan",
             "pruning. Regenerate: `python tools/explain_audit.py`.", ""]
    failures = 0
    for name in AUDITED:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(mode="formatted")
        plan = buf.getvalue()

        lines.append(f"## {name}")
        lines.append("")
        for label, fn, required in CHECKS:
            ok = fn(plan)
            mark = "PASS" if ok else ("FAIL" if required else "n/a ")
            if required and not ok:
                failures += 1
            lines.append(f"- [{mark}] {label}")
        # compact plan: operator tree only, first 40 lines
        tree = [l for l in plan.splitlines()[:40]]
        lines.append("")
        lines.append("```")
        lines.extend(tree)
        lines.append("```")
        lines.append("")
        print(name, "audited")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "EXPLAIN.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"{failures} required-check failures")
    spark.stop()
    raise SystemExit(1 if failures else 0)


if __name__ == "__main__":
    main()
