"""Partition-count hygiene for CPU-bound narrow stages.

A small parquet input (or one giant row group) arrives as ONE split, leaving
every core but one idle through arithmetic-heavy work (MinHash signatures,
variant annotation). `spread_to_parallelism` repartitions only when the scan
would under-parallelize — and decides that from FILE METADATA alone.

Why not `df.rdd.getNumPartitions()`: converting a DataFrame to an RDD forces
full physical planning of the query per call (a driver-side py4j round trip and
a second plan build that Catalyst cannot reuse). The split count of a file scan
is a pure function of (file sizes, maxPartitionBytes, openCostInBytes,
defaultParallelism) — Spark's own packing formula
(FilePartition.maxSplitBytes, public Spark source) — so it can be computed from
`df.inputFiles()` without materializing anything. Falls back to the RDD probe
only for non-file sources where no estimate exists.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame

_UNITS = (
    ("pb", 1 << 50), ("tb", 1 << 40), ("gb", 1 << 30), ("mb", 1 << 20),
    ("kb", 1 << 10), ("p", 1 << 50), ("t", 1 << 40), ("g", 1 << 30),
    ("m", 1 << 20), ("k", 1 << 10), ("b", 1),
)


def _parse_bytes(s: str) -> int:
    s = str(s).strip().lower()
    for suffix, mult in _UNITS:
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)]) * mult)
    return int(float(s))


def _local_sizes(files: list[str]) -> list[int] | None:
    sizes = []
    for uri in files:
        if uri.startswith("file:"):
            path = uri[len("file:"):]
        elif uri.startswith("/"):
            path = uri
        else:
            return None  # remote FS: no cheap local stat; caller falls back
        try:
            sizes.append(os.path.getsize(path))
        except OSError:
            return None
    return sizes


_WIDE_NODES = (
    "Join",
    "Aggregate",
    "Distinct",
    "Deduplicate",  # distinct()/dropDuplicates appear as Deduplicate in analyzed plans
    "Window",
    "Repartition",
    "Sort",
)


def estimate_scan_partitions(df: DataFrame) -> int | None:
    """Estimated file-scan partition count via Spark's split-packing formula;
    None when the input is not a (locally statable) NARROW chain over a file
    scan. A post-shuffle DataFrame's partition count is set by
    spark.sql.shuffle.partitions / AQE, not by its leaf files — for those the
    estimate would see tiny leaves and trigger a pointless extra shuffle, so
    any wide node in the plan falls back to the exact probe."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
        if any(n in plan for n in _WIDE_NODES):
            return None
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    sizes = _local_sizes(list(files))
    if sizes is None:
        return None
    spark = df.sparkSession
    max_pb = _parse_bytes(spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    open_cost = _parse_bytes(spark.conf.get("spark.sql.files.openCostInBytes", "4m"))
    parallelism = spark.sparkContext.defaultParallelism
    padded = sum(s + open_cost for s in sizes)
    max_split = min(max_pb, max(open_cost, padded // max(parallelism, 1)))
    return max(1, math.ceil(padded / max(max_split, 1)))


def estimate_scan_rows(df: DataFrame) -> int | None:
    """Total row count of the leaf parquet files from their FOOTERS alone
    (no job, no scan) — None for non-parquet/non-local/wide-plan inputs.
    Same narrow-chain guard as estimate_scan_partitions: past a join/agg the
    leaf row count no longer bounds the stage's rows."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
        if any(n in plan for n in _WIDE_NODES):
            return None
        files = list(df.inputFiles())
    except Exception:
        return None
    if not files:
        return None
    try:
        import pyarrow.parquet as pq
    except ImportError:
        return None
    total = 0
    for uri in files:
        path = uri[len("file:"):] if uri.startswith("file:") else uri
        if not path.startswith("/") or not path.endswith(".parquet"):
            return None
        try:
            total += pq.ParquetFile(path).metadata.num_rows
        except Exception:
            return None
    return total


def spread_to_parallelism(df: DataFrame, min_rows_per_task: int = 1) -> DataFrame:
    """Repartition to cluster parallelism iff the scan under-parallelizes.

    The tiny shuffle of raw input costs milliseconds; the CPU-bound work it
    parallelizes costs tens of seconds. On a 100 TB input with thousands of
    splits the estimate exceeds the core count and this is a metadata-only
    no-op — no shuffle, no plan materialization.

    ``min_rows_per_task`` floors the split for VECTORIZED-UDF stages (guide
    §4.2): an Arrow batch below a few thousand rows is dominated by Python
    worker and transfer fixed costs, so a small input is spread to
    ceil(rows / min_rows_per_task) tasks instead of full parallelism —
    measured at sf0.1 this is why the signature stages ran FASTER on 8 cores
    than 32 (BENCH scaling block r13). Rows come from parquet footers
    (metadata only); at production scale ceil(rows/min) exceeds the core
    count and the floor is inert. Default 1 = the classic full-spread (right
    for JVM-side CPU work, where per-task fixed cost is microseconds)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    est = estimate_scan_partitions(df)
    if est is None:  # non-file source: fall back to the exact (costlier) probe
        est = df.rdd.getNumPartitions()
    if min_rows_per_task > 1:
        n_rows = estimate_scan_rows(df)
        if n_rows is not None:
            target = max(1, min(target, math.ceil(n_rows / min_rows_per_task)))
    return df if est >= target else df.repartition(target)
