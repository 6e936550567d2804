#!/usr/bin/env python
"""Streaming soak run (VERDICT r6 item 8): one 3x-longer stream — nine
micro-batches of the full mapper pipeline (900k rows at sf0.1) instead of
bench.py's best-of-3 x three batches — to bound throughput variance. The
per-round driver records ONE stream number; with only that, a 40% dip (r5:
15.7k -> 9.6k rows/s, recovered to 16.6k in r6 with no hot-path change) is
indistinguishable from noise without a bisection. A soak amortizes the
per-run fixed costs (state-store init, first-batch double validation) over
3x the batches, so its rows/s has a much tighter spread — record it in
PERF_NOTES each round next to the driver's number.

Usage: python tools/stream_soak.py   # env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import _stream_throughput
    from plenario_mapper_spark.session import get_spark

    spark = get_spark(app_name="stream-soak")
    spark.sparkContext.setLogLevel("ERROR")
    # single run, nine batches: a soak measures sustained throughput, not the
    # best of repeated short bursts
    rows, secs = _stream_throughput(spark, sf_dir, n_batches=9, runs=1)
    print(
        json.dumps(
            {
                "metric": "stream_soak_rows_per_sec",
                "value": round(rows / secs),
                "rows": rows,
                "sec": round(secs, 3),
                "sf_dir": sf_dir,
                "n_batches": 9,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
