"""Compaction operator: file-count hygiene, rebalance plan shape, crash-safe
in-place rewrite."""

import os

from pyspark.sql import functions as F

from plenario_mapper_spark.operators import compaction as CP


def _fragmented(spark, tmp_path, n_files=40):
    src = str(tmp_path / "frag")
    df = spark.range(0, 4000).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("part"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    df.repartition(n_files).write.parquet(src)
    return src


def test_file_stats_counts_small_files(spark, tmp_path):
    src = _fragmented(spark, tmp_path)
    n, total, small = CP.file_stats(spark, src, small_bytes="16m")
    assert n >= 30
    assert small == n  # everything here is tiny
    assert total > 0


def test_write_compacted_reduces_file_count_preserves_rows(spark, tmp_path):
    src = _fragmented(spark, tmp_path)
    dst = str(tmp_path / "compact")
    CP.write_compacted(spark.read.parquet(src), dst, target_file_bytes="128m")
    n, _, _ = CP.file_stats(spark, dst)
    assert n <= 4  # ~200KB of data at a 128MB target collapses to O(1) files
    a = spark.read.parquet(src).orderBy("id").collect()
    b = spark.read.parquet(dst).orderBy("id").collect()
    assert a == b


def test_write_compacted_partitioned_layout(spark, tmp_path):
    src = _fragmented(spark, tmp_path)
    dst = str(tmp_path / "bypart")
    CP.write_compacted(
        spark.read.parquet(src), dst, partition_by=("part",), target_file_bytes="128m"
    )
    dirs = sorted(d for d in os.listdir(dst) if d.startswith("part="))
    assert dirs == ["part=0", "part=1", "part=2"]
    # each partition holds O(1) files, and a partition-pruned read matches
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(dst, d)) if f.endswith(".parquet")]
        assert len(files) <= 2, (d, files)
    got = spark.read.parquet(dst).filter(F.col("part") == "1").count()
    want = spark.read.parquet(src).filter(F.col("part") == "1").count()
    assert got == want


def test_rebalance_hint_reaches_the_plan(spark, tmp_path):
    src = _fragmented(spark, tmp_path)
    df = spark.read.parquet(src).hint("rebalance", "part")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "RebalancePartitions" in plan or "rebalance" in plan.lower(), plan


def test_compact_dataset_in_place_swap(spark, tmp_path):
    src = _fragmented(spark, tmp_path)
    want = spark.read.parquet(src).orderBy("id").collect()
    before, after = CP.compact_dataset(spark, src, target_file_bytes="128m")
    assert before >= 30 and after <= 4
    assert spark.read.parquet(src).orderBy("id").collect() == want
    # no leftover temp/old siblings
    leftovers = [d for d in os.listdir(src + "/..") if ".compact-" in d or ".old" in d]
    assert leftovers == []


def test_compact_dataset_refuses_over_unfinished_swap(spark, tmp_path):
    """A leftover `.old` sibling from a crashed swap must stop a new
    compaction loudly instead of being silently buried."""
    import pytest as _pytest

    src = _fragmented(spark, tmp_path, n_files=4)
    parent, name = os.path.dirname(src), os.path.basename(src)
    os.makedirs(os.path.join(parent, f"_{name}.old"))
    with _pytest.raises(RuntimeError, match="did not finish"):
        CP.compact_dataset(spark, src)
