"""Keyed MERGE (upsert/delete) into a partitioned parquet table — the lake
equivalent of the reference's per-record Redshift INSERTs (`app/mapper.js:284`
fires INSERT per feature row; a lake table needs idempotent upsert instead,
because replays and corrections REWRITE keys rather than append duplicates).

Plain parquet has no row-level MERGE, so the operator makes the classic
trade explicit: partition the table by a stable hash-bucket of the key, and
a merge rewrites ONLY the buckets the changeset touches — cost scales with
|changeset| x (table_size / n_buckets), never the whole table. That is the
same touched-partition contract as `incremental.update_rollup` (day
partitions) generalized to arbitrary keys, and the precursor of what table
formats (Delta/Iceberg/Hudi) do with file-level instead of bucket-level
granularity.

Semantics per key in the changeset: upsert row (last-wins within a batch by
`seq_col`) replaces the existing row or inserts; a row with `_deleted=true`
removes the key. Keys outside the changeset are byte-stable (their buckets
are not rewritten)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

_OVERWRITE_MODE = "spark.sql.sources.partitionOverwriteMode"


def bucket_of(key_col, n_buckets: int):
    """Stable bucket id: non-negative xxhash64 mod n_buckets. Pure row
    function — append/repartition-stable, engine-recomputable."""
    return F.pmod(F.xxhash64(key_col.cast("string")), F.lit(n_buckets))


def merge_into(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key: str,
    n_buckets: int = 64,
    seq_col: str | None = None,
    deleted_col: str = "_deleted",
) -> list[int]:
    """Apply a changeset to the bucket-partitioned table at `path`; returns
    the bucket ids rewritten. `changes` carries the full row schema plus
    optionally `deleted_col` (bool) and `seq_col` for within-batch ordering
    (highest seq wins per key; omitted -> the changeset must be unique per
    key and is validated to be). First call creates the table."""
    from pyspark.errors import AnalysisException

    has_del = deleted_col in changes.columns
    # collapse the changeset to one row per key (last-wins by seq)
    if seq_col is not None:
        w = Window.partitionBy(key).orderBy(F.desc(seq_col))
        changes = (
            changes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", seq_col)
        )
    c = changes.withColumn("_bucket", bucket_of(F.col(key), n_buckets)).localCheckpoint()
    if seq_col is None:
        dup = c.groupBy(key).count().filter(F.col("count") > 1).count()
        if dup:
            raise ValueError(
                f"{dup} keys appear more than once in the changeset and no "
                f"seq_col was given to order them"
            )
    buckets = sorted(r["_bucket"] for r in c.select("_bucket").distinct().collect())
    upserts = c.filter(~F.col(deleted_col)) if has_del else c
    if has_del:
        upserts = upserts.drop(deleted_col)
    try:
        existing = spark.read.parquet(path).filter(F.col("_bucket").isin(buckets))
        # keep existing rows whose key is NOT in the changeset (deletes and
        # upserts both displace), then add the upsert rows
        survivors = existing.join(c.select(key), key, "left_anti")
        merged = survivors.unionByName(upserts)
    except AnalysisException:  # first batch: table doesn't exist yet
        merged = upserts
    merged = merged.localCheckpoint()
    saved = spark.conf.get(_OVERWRITE_MODE, "static")
    try:
        spark.conf.set(_OVERWRITE_MODE, "dynamic")
        merged.write.mode("overwrite").partitionBy("_bucket").parquet(path)
    finally:
        spark.conf.set(_OVERWRITE_MODE, saved)
    # dynamic overwrite only replaces partitions PRESENT in the output — a
    # bucket whose every row was deleted has no output rows, so its stale
    # directory must be removed explicitly (local FS here; FileSystem API on
    # a cluster). Without this, delete-only buckets silently resurrect.
    import os
    import shutil

    non_empty = {r["_bucket"] for r in merged.select("_bucket").distinct().collect()}
    for b in buckets:
        if b not in non_empty:
            d = os.path.join(path, f"_bucket={b}")
            if os.path.isdir(d):
                shutil.rmtree(d)
    return buckets


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read the merged table without the bucketing column."""
    return spark.read.parquet(path).drop("_bucket")
