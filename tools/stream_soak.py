#!/usr/bin/env python
"""Streaming soak run (VERDICT r6 item 8; attribution widened r11 per VERDICT
r10 item 5): nine micro-batches of the full mapper pipeline (900k rows at
sf0.1) instead of bench.py's best-of-3 x three batches — run TWICE in one
process (cold then warm) with the per-batch durationMs breakdown recorded.

Why twice + breakdown: the per-round driver records ONE stream number, and
r8-r10 recorded 16.8k -> 13.1k rows/s on bit-identical plan fingerprints.
With only a wall number, a host-regime dip is indistinguishable from a code
regression. The cold/warm pair bounds the one-time costs (state-store init,
codegen, first-batch double validation); the durationMs split (addBatch vs
queryPlanning vs walCommit/commitOffsets) attributes the rest — if
triggerExecution is dominated by non-addBatch time, the ceiling is per-batch
fixed cost (driver-side planning + sink commits), not pipeline throughput.

Usage: python tools/stream_soak.py   # env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _breakdown(progress: list[dict]) -> dict:
    """Sum each durationMs component across one run's batches."""
    totals: dict[str, int] = {}
    n = 0
    for run in progress:
        for batch in run["batches"]:
            n += 1
            for k, v in batch.items():
                totals[k] = totals.get(k, 0) + int(v)
    return {"n_batches": n, **{k: totals[k] for k in sorted(totals)}}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import _stream_throughput
    from plenario_mapper_spark.session import get_spark

    spark = get_spark(app_name="stream-soak")
    spark.sparkContext.setLogLevel("ERROR")
    runs = []
    for label in ("cold", "warm"):
        load = round(os.getloadavg()[0], 1)
        progress: list[dict] = []
        rows, secs, task_sec, cpu_sec = _stream_throughput(
            spark, sf_dir, n_batches=9, runs=1, progress_sink=progress
        )
        runs.append(
            {
                "label": label,
                "rows_per_sec": round(rows / secs),
                # CPU-normalized twin (VERDICT r11 item 5): decides
                # host-regime vs regression on identical fingerprints
                "rows_per_task_cpu_sec": (
                    round(rows / cpu_sec) if cpu_sec > 0 else -1
                ),
                "task_sec": round(task_sec, 2),
                "cpu_sec": round(cpu_sec, 2),
                "rows": rows,
                "sec": round(secs, 3),
                "loadavg_at_start": load,
                "duration_ms_totals": _breakdown(progress),
            }
        )
        print(f"# soak {label}: {json.dumps(runs[-1])}", file=sys.stderr)
    warm = runs[-1]
    print(
        json.dumps(
            {
                "metric": "stream_soak_rows_per_sec",
                "value": warm["rows_per_sec"],
                "rows_per_task_cpu_sec": warm["rows_per_task_cpu_sec"],
                "cold_rows_per_sec": runs[0]["rows_per_sec"],
                "rows": warm["rows"],
                "sec": warm["sec"],
                "sf_dir": sf_dir,
                "n_batches": 9,
                "runs": runs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
