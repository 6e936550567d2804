#!/usr/bin/env python
"""Self-measured Spark-vs-DuckDB wall-clock ratios (VERDICT r5 item 5 / r6
item 3): times each COMPARABLE headline query's DuckDB oracle at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) alongside the Spark plan,
same warm best-of-3 protocol on both engines, and prints a markdown ratio
table ready to paste into PERF_NOTES.md plus one JSON line.

"Comparable" = the headliner's oracle does the same asymptotic work as the
engine. Queries whose oracles are DELIBERATELY brute force (quadratic
all-pairs dedup/ANN/geo/interval forms, viable only at sf<=0.01 — timing them
measures the oracle's pathology, not the engine) are excluded, each with its
reason printed, so the exclusion list is part of the artifact.

Usage:
    python tools/duck_ratio.py                  # ratio table at sf0.1
    python tools/duck_ratio.py --bench-json BENCH_r06.json
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/duck_ratio.py

--bench-json reuses the driver's standalone Spark timings from a
BENCH_r{N}.json artifact instead of re-timing Spark here (the judge's
methodology): the driver's numbers are authoritative per the PERF_NOTES
measurement discipline — a locally contended box inflates self-timed Spark
walls by ~30-50% while DuckDB (shorter critical path) inflates less, which
biases self-measured ratios UP. Both modes print which Spark source was
used.

Budget (BASELINE.md): aggregate <= 2x warm DuckDB at the same SF. Judge r6
measured aggregate 0.60x with only q3/q5/q9 individually over 2x
(single-row-group sf0.1 layout, root-caused in PERF_NOTES r4/r5).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()

# The comparable headliner set (bench.py HEADLINE minus exclusions below) —
# the same 14 the r5/r6 judges measured, so rounds stay comparable.
COMPARABLE = [
    "q_mapper_split_events",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q9_product_type_profit",
    "q_window_rank",
    "q_events_sessionize",
    "q_events_sessions_closed",
    "q_dedup_exact_docs",
    "q_doc_lang_signal",
    "q_doc_pack_sequences",
    "q_doc_redact_pii",
    "q_doc_oov_rate",
    "q_events_attribution_linear",
]

# Headliners whose oracle is deliberately NOT the same asymptotic work.
EXCLUDED = {
    "q_dedup_minhash": "oracle is exact all-pairs trigram Jaccard (quadratic; "
    "the engine's LSH-banded path is the point)",
    "q_dedup_survivors": "oracle chains the quadratic all-pairs Jaccard truth",
    "q_dedup_cluster_cc": "oracle is quadratic all-pairs edges + recursive CTE",
    "q_embed_cosine_topk": "oracle is O(N*Q*d) list-comprehension dots with no "
    "pre-normalization (interpreted per-element lambdas)",
    "q_ann_ivf_topk": "certification form runs the exact twin; oracle is the "
    "same brute force in interpreted list lambdas",
    "q_geo_radius_join": "oracle is the unblocked cross-join distance filter",
    "q_join_interval_overlap": "oracle is the unbucketed quadratic overlap join",
}


def time_duckdb(con, sql: str, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    import duckdb

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    bench_times: dict[str, float] | None = None
    spark_src = "self-timed (warm best-of-3, this process)"
    if "--bench-json" in sys.argv:
        path = sys.argv[sys.argv.index("--bench-json") + 1]
        raw = json.load(open(path))
        # the driver artifact wraps the bench line; accept either shape
        if "queries" in raw:
            payload = raw
        else:
            line = next(
                l for l in reversed(raw["tail"].splitlines())
                if l.startswith('{"metric"')
            )
            payload = json.loads(line)
        bench_times = payload["queries"]
        spark_src = f"driver artifact {os.path.basename(path)}"

    from plenario_mapper_spark.plans import ORACLES, QUERIES
    from plenario_mapper_spark.session import get_spark

    spark = get_spark(app_name="duck-ratio")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute(f"SET threads TO {int(cpus)}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )

    # warm both engines (file cache, codegen, worker pools) before timing
    spark.range(1).count()
    for name in COMPARABLE:
        try:
            QUERIES[name](spark, sf_dir).count()
            con.execute(ORACLES[name]).fetchall()
        except Exception as exc:
            print(f"# warm {name} failed: {exc}", file=sys.stderr)

    rows = []
    for name in COMPARABLE:
        if bench_times is not None and name in bench_times:
            best_s = float(bench_times[name])
        else:
            best_s = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).count()
                best_s = min(best_s, time.perf_counter() - t0)
        best_d = time_duckdb(con, ORACLES[name])
        rows.append((name, best_s, best_d, best_s / best_d))
        print(
            f"# {name}: spark {best_s:.3f}s duckdb {best_d:.3f}s "
            f"ratio {best_s / best_d:.2f}x",
            file=sys.stderr,
        )

    total_s = sum(r[1] for r in rows)
    total_d = sum(r[2] for r in rows)
    agg = total_s / total_d

    print(
        f"\n## DuckDB ratio (sf_dir={sf_dir}, {cpus} threads, warm best-of-3; "
        f"spark side: {spark_src})\n"
    )
    print("| query | spark s | duckdb s | ratio |")
    print("|---|---|---|---|")
    for name, s, d, r in sorted(rows, key=lambda x: -x[3]):
        flag = " **> 2x**" if r > 2 else ""
        print(f"| {name} | {s:.3f} | {d:.3f} | {r:.2f}x{flag} |")
    print(f"| **aggregate** | **{total_s:.3f}** | **{total_d:.3f}** | **{agg:.2f}x** |")
    print("\nExcluded (quadratic/brute-force oracles — timing them measures the")
    print("oracle's pathology, not the engine):")
    for name, why in EXCLUDED.items():
        print(f"- `{name}`: {why}")

    print(
        json.dumps(
            {
                "metric": "duckdb_ratio_aggregate",
                "value": round(agg, 3),
                "sf_dir": sf_dir,
                "spark_total_sec": round(total_s, 3),
                "duckdb_total_sec": round(total_d, 3),
                "ratios": {n: round(r, 3) for n, _s, _d, r in rows},
                "excluded": sorted(EXCLUDED),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
