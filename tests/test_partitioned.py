"""Partitioned layout + dynamic partition pruning: plan and lifecycle pins."""

import os

import pyspark.sql.functions as F

from plenario_mapper_spark.plans import QUERIES
from plenario_mapper_spark.sources import partitioned as PT

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    from tests.conftest import final_plan

    return final_plan(df)


def test_partitioned_copy_roundtrips_all_rows(spark):
    from plenario_mapper_spark.plans.relational import _events

    root = PT.ensure_date_partitioned_events(spark, SF)
    assert os.path.isfile(os.path.join(root, "_SUCCESS"))
    assert spark.read.parquet(root).count() == _events(spark, SF).count()
    # hive-style layout: one directory per day
    days = [d for d in os.listdir(root) if d.startswith("event_date=")]
    assert len(days) > 1


def test_dpp_query_prunes_fact_partitions(spark):
    """The fact scan must carry a partition filter — either the
    `dynamicpruning` subquery, or the dim's deterministic gate inferred
    statically through the equi-join (Catalyst does both here; losing BOTH
    means the join reads every date directory, the exact 100 TB regression
    this layout exists to prevent)."""
    plan = _plan(QUERIES["q_join_dpp_partitioned"](spark, SF))
    fact_scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "value" in ln
    ]
    assert fact_scans, plan
    assert all("PartitionFilters: []" not in ln for ln in fact_scans), plan
    assert "dynamicpruning" in plan, plan


def test_dim_scan_reads_only_partition_column(spark):
    """The day-dimension scan projects only the partition column: a
    listing-only scan (ReadSchema is empty — zero parquet data bytes)."""
    root = PT.ensure_date_partitioned_events(spark, SF)
    dim = spark.read.parquet(root).select("event_date").distinct()
    plan = _plan(dim)
    scan_lines = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scan_lines and "ReadSchema: struct<>" in scan_lines[-1], plan


def test_partitioned_build_is_idempotent(spark):
    root = PT.ensure_date_partitioned_events(spark, SF)
    mtime = os.path.getmtime(os.path.join(root, "_SUCCESS"))
    root2 = PT.ensure_date_partitioned_events(spark, SF)
    assert root2 == root
    assert os.path.getmtime(os.path.join(root, "_SUCCESS")) == mtime


def test_write_avoids_small_file_fanout(spark):
    """repartition(event_date) before partitionBy: each date dir holds one
    file, not one per input task."""
    root = PT.ensure_date_partitioned_events(spark, SF)
    for d in os.listdir(root):
        if not d.startswith("event_date="):
            continue
        files = [f for f in os.listdir(os.path.join(root, d)) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)
