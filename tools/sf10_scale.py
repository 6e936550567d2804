"""The SECOND scale decade (VERDICT r12 item 3): x100-data evidence for the
heavy iterative/dedup families.

tools/sf1_scale.py certifies one decade (sf0.1 -> sf1, all measured ratios
sub-linear). This tool buys the next one: generate an sf10 clone
(tools/gen_sf1.py with REPLICAS=100 — same key-shift construction, so join
selectivities and per-key row counts are preserved while group cardinalities
scale x100) and measure the judge-named heavy families at sf0.1, sf1 AND
sf10 on one session. A family whose per-decade ratio HOLDS across two
decades (sf1/sf0.1 ~ sf10/sf1) is scaling by its design, not by fitting one
datapoint; a family whose second decade is much worse than its first names a
real ceiling.

Queries: the five families the r12 verdict called out — PageRank, triangle
counting, MinHash->connected-components, exact-substring span dedup, BM25 —
plus k-core (the registry's slowest member). Walls AND executor task_sec
both recorded (tools/sf1_scale.time_set): on a 32-thread box a query can
absorb 10x data into idle cores with a near-flat wall while task_sec
honestly grows.

Results land in .bench_data/sf10_ratios.json; tools/plan_audit.py quotes
the x100 ratios inline in PLANS.md next to each query's plan.

Usage:
  python tools/gen_sf1.py .bench_data/sf10   # with REPLICAS=100 in env
  python tools/sf10_scale.py [sf10_dir]      # default .bench_data/sf10
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = [
    "q_graph_pagerank",
    "q_graph_triangles",
    "q_dedup_cluster_cc",
    "q_doc_span_dedup",
    "q_search_bm25_topk",
    "q_graph_kcore_peel",
]


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf10_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        root, ".bench_data", "sf10"
    )
    sf1_dir = os.path.join(root, ".bench_data", "sf1")
    from tools.sf1_scale import time_set

    from plenario_mapper_spark.session import get_spark

    spark = get_spark(app_name="sf10-scale")
    spark.sparkContext.setLogLevel("ERROR")

    # Triangles at sf10 runs the apex-batched plan (K=16): the one-pass
    # wedge relation is ~15B rows (~300 GB of shuffle spill) at x100 — a
    # cluster's aggregate disk absorbs that, one box does not (measured:
    # the unbatched sf10 run died on spill ENOSPC with 77 GB free). The
    # batched plan computes the identical result (disjoint apex subsets)
    # with per-pass transient disk of total/K; its wall is the honest
    # single-box x100 datapoint and is labeled as such in the output.
    def _triangles_batched(spark_, d_):
        from plenario_mapper_spark.plans.pipeline_ops import triangles_counts_df

        return triangles_counts_df(spark_, d_, apex_batches=16)

    out: dict[str, dict] = {}
    for label, d in (
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", sf1_dir),
        ("sf10", sf10_dir),
    ):
        overrides = (
            {"q_graph_triangles": _triangles_batched} if label == "sf10" else None
        )
        walls, tasks = time_set(spark, d, queries=HEAVY, overrides=overrides)
        out[label] = {"walls": walls, "task_sec": tasks}
        if overrides:
            out[label]["notes"] = {
                "q_graph_triangles": "apex_batches=16 (single-box transient-disk bound)"
            }
        print(json.dumps({"scale": label, **out[label]}))

    def ratio(a: str, b: str, kind: str) -> dict[str, float | None]:
        return {
            n: (
                round(out[b][kind][n] / out[a][kind][n], 2)
                if out[a][kind][n] and out[a][kind][n] > 0
                else None
            )
            for n in HEAVY
        }

    result = {
        "x100_wall_ratio": ratio("sf0.1", "sf10", "walls"),
        "x100_task_ratio": ratio("sf0.1", "sf10", "task_sec"),
        "decade1_wall_ratio": ratio("sf0.1", "sf1", "walls"),
        "decade2_wall_ratio": ratio("sf1", "sf10", "walls"),
        "decade2_task_ratio": ratio("sf1", "sf10", "task_sec"),
        **{f"{k}_detail": v for k, v in out.items()},
    }
    print(json.dumps({"metric": "x100_data_ratios", **{
        k: result[k] for k in ("x100_wall_ratio", "decade1_wall_ratio",
                               "decade2_wall_ratio")
    }}))
    out_path = os.path.join(root, ".bench_data", "sf10_ratios.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
