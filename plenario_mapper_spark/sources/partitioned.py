"""Hive-style partitioned layout + dynamic partition pruning (DPP).

At 100 TB the cheapest byte is the one never read: laying a fact table out as
`<root>/event_date=YYYY-MM-DD/part-*.parquet` lets two pruning mechanisms
eliminate whole directories before any I/O happens:

- STATIC partition pruning: a literal predicate on the partition column is
  resolved against directory names at planning time.
- DYNAMIC partition pruning: when the partition column is a JOIN key against
  a filtered dimension, Spark inserts a `dynamicpruning#...` subquery into the
  fact scan's PartitionFilters — the dim side runs first (reusing its
  broadcast), and only the matching partition directories are ever listed and
  read. This is the mechanism that turns "join facts to a 20-day dim" from a
  100 TB scan into a 20-day scan.

The writer here materializes the partitioned copy once per source dataset
(content-addressed by the source file's identity, `_SUCCESS`-gated, same
lifecycle discipline as the IVF index in operators/similarity) — the pattern a
production lake applies at ingest, not per query.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F


def _content_addressed_dir(src_path: str, tag: str) -> str:
    """Stable per-source-version scratch dir: regenerated testdata (new size /
    mtime) must never be served a stale layout."""
    try:
        st = os.stat(src_path)
        ident = f"{src_path}|{st.st_size}|{st.st_mtime_ns}"
    except OSError:
        ident = src_path
    return os.path.join(
        tempfile.gettempdir(),
        f"{tag}_{hashlib.md5(ident.encode()).hexdigest()[:12]}",
    )


def ensure_date_partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Materialize events partitioned by `event_date` (derived date(ts)) and
    return the layout root. Idempotent: `_SUCCESS` (written last by the
    parquet committer) gates reuse, so a crashed build is rebuilt, never
    served. The write repartitions ON the partition column so each date
    directory receives one writer task's output instead of a
    (tasks x dates) small-file fan-out — the standard ingest-side
    compaction discipline."""
    from plenario_mapper_spark.plans.relational import _events

    src = os.path.join(sf_dir, "events.parquet")
    root = _content_addressed_dir(src, "events_by_date")
    if not os.path.isfile(os.path.join(root, "_SUCCESS")):
        e = _events(spark, sf_dir).withColumn("event_date", F.to_date("ts"))
        (
            e.repartition("event_date")
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(root)
        )
    return root


def dpp_join(
    fact: DataFrame, dim: DataFrame, on: str, how: str = "inner"
) -> DataFrame:
    """Join a partitioned fact to a (small, filtered) dim on the partition
    column, broadcast-hinted so DPP can reuse the dim's broadcast exchange as
    the pruning subquery (`spark.sql.optimizer.dynamicPartitionPruning.
    reuseBroadcastOnly` defaults true). The caller asserts the
    `dynamicpruning` PartitionFilter on the physical plan — silent loss of
    pruning is a plan regression, not a correctness change."""
    return fact.join(F.broadcast(dim), on, how)
