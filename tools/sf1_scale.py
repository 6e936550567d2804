"""The per-round data-proportional scaling datapoint (VERDICT r4 item 6,
widened r10 per VERDICT r9 items 4+8): time a fixed query set at sf0.1 and at
the 10x sf1 clone (tools/gen_sf1.py) on the same session, warm best-of-2, and
print one JSON line per scale plus the x10-data wall ratios. A ratio well
under 10 is the sub-linear evidence that the sf0.1 DuckDB-ratio weak spots
are fixed overhead, not scaling defects; a ratio OVER ~10 names a genuine
scale problem.

Query set: the persistent >2x duck-ratio members (q3/q5/q9 since r7;
q_mapper_split_events + q_window_rank added r10 — the two non-TPC-H members
that never had a scale datapoint) plus the r9 embedding family additions
(q_embed_semantic_dedup, q_embed_pca_power — VERDICT r9 item 4: heaviest new
t2 rows, no scaled measurement until now), plus the r10-verdict heavy tail
(VERDICT r10 item 4): q_graph_kcore_peel (slowest registry member, 14s
sf0.1), q_search_bm25_topk, q_embed_silhouette.

The x10 ratios are also written to .bench_data/sf1_ratios.json so
tools/plan_audit.py can carry them inline in PLANS.md (VERDICT r10 item 7 —
the sub-linear counter-evidence for the duck-ratio weak rows lives next to
each plan instead of in round-old notes).

Usage: python tools/sf1_scale.py [sf1_dir]   (default .bench_data/sf1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "q3_shipping_priority",
    "q5_local_supplier",
    "q9_product_type_profit",
    "q_mapper_split_events",
    "q_window_rank",
    "q_embed_semantic_dedup",
    "q_embed_pca_power",
    "q_graph_kcore_peel",
    "q_search_bm25_topk",
    "q_embed_silhouette",
    # r12 widening: the rest of the measured registry-sweep top-10 (the
    # graph/iterative family took over after the r11 jaccard rewrite) —
    # every slowest query now carries a x10-data datapoint in PLANS.md
    "q_graph_pagerank",
    "q_graph_modularity",
    "q_graph_triangles",
    "q_graph_link_prediction",
    "q_graph_label_prop_3",
    "q_graph_khop_distance",
    "q_part_price_elasticity",
    "q_dedup_incremental_near",
    "q_dedup_cluster_cc",
]


def time_set(
    spark,
    sf_dir: str,
    queries: list[str] | None = None,
    overrides: dict | None = None,
) -> tuple[dict[str, float], dict[str, float]]:
    """(walls, task_secs) per query, warm best-of-2. Executor task time
    rides along (VERDICT r12 item 7): wall ratios on a 32-thread box
    under-attribute CPU growth for the cached iterative family — a query
    can absorb 10x data into idle cores with a near-flat wall while its
    task_sec honestly grows; quoting both makes the scale evidence
    contention-proof AND parallelism-honest."""
    import bench as BENCH
    from plenario_mapper_spark.plans import QUERIES as Q
    from plenario_mapper_spark.plans.registry import release_query_caches

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    store = sc._jsc.sc().statusStore()
    walls: dict[str, float] = {}
    tasks: dict[str, float] = {}
    for name in queries or QUERIES:
        fn = (overrides or {}).get(name) or Q[name]
        fn(spark, sf_dir).count()  # warm (codegen, file index, workers)
        release_query_caches(spark)
        if overrides and name in overrides:
            spark.catalog.clearCache()  # override fns persist outside the registry
        best = float("inf")
        best_task = float("inf")
        for i in range(2):  # warm best-of-2, the PERF_NOTES convention
            grp = f"sfscale:{name}:{sf_dir}:{i}"
            sc.setJobGroup(grp, name)
            jobs_before = set(tracker.getJobIdsForGroup(grp) or [])
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
            run_jobs = [
                j
                for j in (tracker.getJobIdsForGroup(grp) or [])
                if j not in jobs_before
            ]
            run_ms, _cpu = BENCH._executor_time(store, tracker, run_jobs)
            best_task = min(best_task, run_ms / 1e3)
            release_query_caches(spark)
            if overrides and name in overrides:
                spark.catalog.clearCache()
        sc.setJobGroup("sfscale:untracked", "")
        walls[name] = round(best, 3)
        tasks[name] = round(best_task, 2) if best_task < float("inf") else -1.0
    return walls, tasks


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_data",
        "sf1",
    )
    from plenario_mapper_spark.session import get_spark

    spark = get_spark(app_name="sf1-scale")
    spark.sparkContext.setLogLevel("ERROR")
    base, base_task = time_set(spark, "/root/testdata/sf0.1")
    print(json.dumps({"sf": 0.1, "walls": base, "task_sec": base_task}))
    big, big_task = time_set(spark, sf1_dir)
    print(json.dumps({"sf": 1, "walls": big, "task_sec": big_task}))
    ratios = {
        n: round(big[n] / base[n], 2) if base[n] > 0 else None for n in QUERIES
    }
    task_ratios = {
        n: round(big_task[n] / base_task[n], 2) if base_task[n] > 0 else None
        for n in QUERIES
    }
    print(json.dumps({"metric": "x10_data_wall_ratio", "ratios": ratios}))
    print(json.dumps({"metric": "x10_data_task_ratio", "ratios": task_ratios}))
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_data",
        "sf1_ratios.json",
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(
            {
                "ratios": ratios,
                "task_ratios": task_ratios,
                "sf0.1_walls": base,
                "sf1_walls": big,
                "sf0.1_task_sec": base_task,
                "sf1_task_sec": big_task,
            },
            f,
            indent=1,
        )
    spark.stop()


if __name__ == "__main__":
    main()
