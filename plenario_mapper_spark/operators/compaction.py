"""Output compaction — the small-files defense for a long-lived dataset.

A streaming sink (`streaming/pipeline.py` writes per micro-batch) and any
highly parallel batch job both fragment a table: N writer tasks x M partitions
x thousands of batches = millions of KB-sized parquet files, and at 100 TB the
NameNode listing + per-file open cost come to dominate every downstream scan
(`spark.sql.files.openCostInBytes` exists precisely to model this). The fix is
periodic rewrite at a target file size.

Spark-first shape: the rewrite is `REBALANCE` (AQE `RebalancePartitions`), not
`coalesce`/`repartition(n)`:

- `coalesce(n)` narrows upstream parallelism (the writer stage AND the stages
  fused into it run at n tasks) and needs the caller to guess n;
- `repartition(n)` round-robins a full shuffle at a guessed n — wrong at the
  next scale-up, and under `partitionBy` each writer task still holds every
  output partition open (the classic memory blow-up);
- `REBALANCE(cols)` shuffles by the output partition columns and lets AQE
  split/merge post-shuffle blocks to `advisoryPartitionSizeInBytes` from
  MEASURED sizes — file count tracks data volume with no hand-tuned constant,
  skewed output partitions are split instead of producing one giant file, and
  each writer task sees exactly one output partition.

The in-place variant writes the compacted copy NEXT TO the live directory and
atomically renames, never deleting data before its replacement is durable.
"""

from __future__ import annotations

import math
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from plenario_mapper_spark.operators.partitioning import _local_sizes, _parse_bytes

_ADVISORY = "spark.sql.adaptive.advisoryPartitionSizeInBytes"


def file_stats(spark: SparkSession, path: str, small_bytes: str = "16m"):
    """(n_files, total_bytes, n_small) for a parquet dataset — the signal a
    compaction scheduler thresholds on (e.g. compact when n_small/n_files >
    0.5). Local-filesystem stat; on a cluster the same numbers come from one
    FileSystem.listFiles pass (metadata-only either way)."""
    files = [f for f in spark.read.parquet(path).inputFiles()]
    sizes = _local_sizes(files)
    if sizes is None:
        raise ValueError(f"non-local dataset {path!r}: stat via FileSystem API")
    cut = _parse_bytes(small_bytes)
    return len(sizes), sum(sizes), sum(1 for s in sizes if s < cut)


def write_compacted(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    target_file_bytes: str = "128m",
    mode: str = "overwrite",
) -> None:
    """Write df to parquet at ~target-sized files via REBALANCE + AQE advisory
    sizing. With `partition_by`, rows rebalance on the partition columns so
    each writer task owns whole output partitions (one open file per task,
    no per-task fan-out across partition dirs) while AQE still splits any
    skewed partition into multiple target-sized tasks."""
    spark = df.sparkSession
    saved = spark.conf.get(_ADVISORY, None)
    try:
        spark.conf.set(_ADVISORY, str(_parse_bytes(target_file_bytes)))
        out = df.hint("rebalance", *partition_by) if partition_by else df.hint("rebalance")
        w = out.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
    finally:
        if saved is None:
            spark.conf.unset(_ADVISORY)
        else:
            spark.conf.set(_ADVISORY, saved)


def compact_dataset(
    spark: SparkSession,
    path: str,
    partition_by: tuple[str, ...] = (),
    target_file_bytes: str = "128m",
) -> tuple[int, int]:
    """Rewrite a fragmented local parquet dataset in place; returns
    (files_before, files_after). Durability ordering: the compacted copy is
    fully written to a sibling temp dir first, and the original is never
    deleted before its replacement is in place — a crash never loses data
    and never leaves a PARTIAL table. The swap itself is two renames, so
    there IS a brief window where the live path is absent (plain
    filesystems have no atomic directory exchange); a crash inside it
    leaves the complete original at the DETERMINISTIC sibling
    `_<name>.old` — recovery is `mv` it back, and this function refuses to
    start while such a sibling exists rather than silently burying it.
    Concurrent readers must be fenced by the caller's scheduler (the same
    requirement every non-transactional table rewrite has; a table format
    with a metadata pointer is the upgrade path when readers can't pause)."""
    import shutil

    before, _, _ = file_stats(spark, path)
    df = spark.read.parquet(path)
    parent, name = os.path.dirname(path.rstrip("/")), os.path.basename(path.rstrip("/"))
    tmp = os.path.join(parent, f"_{name}.compact-{uuid.uuid4().hex[:8]}")
    old = os.path.join(parent, f"_{name}.old")
    if os.path.exists(old):
        raise RuntimeError(
            f"{old} exists — a previous swap did not finish; restore or remove it first"
        )
    write_compacted(df, tmp, partition_by, target_file_bytes)
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except BaseException:
        os.rename(old, path)  # roll the original back into place
        raise
    shutil.rmtree(old)
    after, _, _ = file_stats(spark, path)
    return before, after
