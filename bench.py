#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

value = total wall seconds across the headline set (lower is better). Each query
is fully materialized via a count-ish action so the measured time includes the
whole plan, not plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # reference hot path at scale: the one-pass split (route + dead-letter are
    # two outputs of the SAME pipeline invocation in the reference, so timing
    # them as separate full runs double-counted the annotate stage; the
    # per-sink views remain correctness queries)
    "q_mapper_split_events",
    # relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q_window_rank",
    "q_events_sessionize",
    # training-data ops
    "q_dedup_exact_docs",
    "q_dedup_minhash",
    "q_embed_cosine_topk",
    "q_doc_lang_signal",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from plenario_mapper_spark.plans import QUERIES
    from plenario_mapper_spark.session import get_spark

    spark = get_spark(app_name="plenario-mapper-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM so the timed iterations measure steady-state execution, not
    # one-time startup: a trivial action for executor spin-up, then one untimed
    # run of each headline query at the target scale. The warm run pays the
    # one-time costs a deployed engine amortizes across its lifetime — parquet
    # file-index construction, whole-stage codegen compilation, Python worker
    # startup, and AQE's first-plan statistics — exactly the TPC warm-run model.
    spark.range(1).count()
    for warm_q in HEADLINE:
        try:
            QUERIES[warm_q](spark, sf_dir).count()
        except Exception:
            pass

    # Three timed iterations per query, report the min: a single local[N] run has
    # 2-3x noise from GC pauses, AQE re-planning, and page-cache state; the min
    # is the steady-state number a cluster would sustain.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        best, n = float("inf"), 0
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
