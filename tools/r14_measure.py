"""Round-14 optimization measurement harness (guide §1: measure first).

For each named query: capture .explain("formatted") to plans/r14/<q>_<tag>.txt
and time the computation with the NOOP SINK (df.write.format("noop")) so the
measurement excludes result pull-back — best of N runs after one warm run,
each labeled via setJobDescription. Prints one line per query and a JSON
summary to stdout; nothing here is used by the driver bench (bench.py keeps
its count()-action methodology unchanged for cross-round comparability).

Usage:
    python tools/r14_measure.py --tag before q3_shipping_priority q5_local_supplier
    SF=/root/testdata/sf0.1 CPUS=32 python tools/r14_measure.py --tag after --all-headline
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SF", "/root/testdata/sf0.1")
CPUS = os.environ.get("CPUS", os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("RUNS", "3"))

HEADLINE = [
    "q_mapper_split_events", "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier", "q_window_rank", "q_events_sessionize",
    "q9_product_type_profit", "q_dedup_exact_docs", "q_dedup_minhash",
    "q_dedup_survivors", "q_dedup_cluster_cc", "q_embed_cosine_topk",
    "q_ann_ivf_topk", "q_doc_lang_signal", "q_doc_pack_sequences",
    "q_doc_redact_pii", "q_geo_radius_join", "q_join_interval_overlap",
    "q_events_sessions_closed", "q_doc_oov_rate", "q_events_attribution_linear",
]


def main() -> None:
    args = [a for a in sys.argv[1:]]
    tag = "before"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    names = HEADLINE if "--all-headline" in args else [a for a in args if not a.startswith("--")]

    import __spark_entry__ as E  # noqa: F401 (sys.path setup + _configure)
    from plenario_mapper_spark.plans import QUERIES
    from plenario_mapper_spark.plans.registry import release_query_caches
    from plenario_mapper_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", CPUS)
    spark = get_spark(app_name="r14-measure")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    store = sc._jsc.sc().statusStore()
    results: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        # formatted plan (pre-execution, AQE initial) — the judge-checkable artifact
        df = fn(spark, SF)
        plan_txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan_txt)

        # noop-sink timing: 1 warm + RUNS timed, best-of
        best = float("inf")
        best_task = best_cpu = float("inf")
        for i in range(RUNS + 1):
            grp = f"r14:{name}:{tag}:{i}"
            sc.setJobGroup(grp, f"{name} [{tag}]")
            t0 = time.perf_counter()
            fn(spark, SF).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            jobs = list(tracker.getJobIdsForGroup(grp) or [])
            run_ms = cpu_ns = 0
            stage_ids: set[int] = set()
            for j in jobs:
                info = tracker.getJobInfo(j)
                if info is not None:
                    stage_ids.update(info.stageIds)
            for sid in stage_ids:
                try:
                    sd = store.lastStageAttempt(sid)
                except Exception:
                    continue
                run_ms += sd.executorRunTime()
                cpu_ns += sd.executorCpuTime()
            if i == 0:
                continue  # warm run
            best = min(best, dt)
            best_task = min(best_task, run_ms / 1e3)
            best_cpu = min(best_cpu, cpu_ns / 1e9)
        release_query_caches(spark)
        results[name] = {
            "wall": round(best, 3),
            "task_sec": round(best_task, 2),
            "cpu_sec": round(best_cpu, 2),
        }
        print(
            f"# {name}: {best:.3f}s wall / {best_task:.2f}s task / {best_cpu:.2f}s cpu [{tag}]",
            file=sys.stderr,
        )
    print(json.dumps({"tag": tag, "sf": SF, "cpus": CPUS, "queries": results}))
    spark.stop()


if __name__ == "__main__":
    main()
