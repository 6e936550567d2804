"""Incremental rollup maintenance: merge-equals-recompute, partition-scoped
rewrites, late-data handling."""

import os

from pyspark.sql import functions as F

from plenario_mapper_spark.operators import incremental as IC


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_update_rollup_merge_equals_full_recompute(spark, tmp_path):
    path = str(tmp_path / "rollup")
    day1 = _events(spark, [
        ("2024-01-01 01:00:00", "click", 1.5),
        ("2024-01-01 02:00:00", "click", 2.5),
        ("2024-01-01 03:00:00", "view", 4.0),
    ])
    day2_plus_late = _events(spark, [
        ("2024-01-02 01:00:00", "click", 10.0),
        ("2024-01-01 23:00:00", "click", 0.5),   # late row for day 1
    ])
    touched1 = IC.update_rollup(spark, path, day1)
    assert touched1 == ["2024-01-01"]
    touched2 = IC.update_rollup(spark, path, day2_plus_late)
    assert touched2 == ["2024-01-01", "2024-01-02"]

    got = {
        (str(r["day"]), r["event_type"]): (r["n"], float(r["sum_value"]))
        for r in spark.read.parquet(path).collect()
    }
    want = {
        (str(r["day"]), r["event_type"]): (r["n"], float(r["sum_value"]))
        for r in IC.daily_rollup(day1.unionByName(day2_plus_late)).collect()
    }
    assert got == want
    assert got[("2024-01-01", "click")] == (3, 4.5)  # late row merged in


def test_update_rollup_untouched_partitions_not_rewritten(spark, tmp_path):
    path = str(tmp_path / "rollup")
    IC.update_rollup(spark, path, _events(spark, [
        ("2024-01-01 01:00:00", "click", 1.0),
    ]))
    day1_dir = os.path.join(path, "day=2024-01-01")
    before = {f: os.path.getmtime(os.path.join(day1_dir, f))
              for f in os.listdir(day1_dir) if f.endswith(".parquet")}
    IC.update_rollup(spark, path, _events(spark, [
        ("2024-01-05 01:00:00", "view", 2.0),
    ]))
    after = {f: os.path.getmtime(os.path.join(day1_dir, f))
             for f in os.listdir(day1_dir) if f.endswith(".parquet")}
    assert before == after  # day 1's files untouched by a day-5 batch
    assert os.path.isdir(os.path.join(path, "day=2024-01-05"))


def test_rollup_parquet_decimal_type_is_uniform_across_batches(spark, tmp_path):
    """First-batch and merge paths must persist the SAME decimal physical
    type: Spark widens SUM(decimal(18,2)) to (28,2), and a rollup whose day
    partitions mix (28,2) and (18,2) footers becomes unreadable
    (PARQUET_COLUMN_DATA_TYPE_MISMATCH on whichever footer inference didn't
    pick). Regression for the empirically reproduced crash."""
    import pyarrow.parquet as pq
    import glob

    path = str(tmp_path / "rollup")
    IC.update_rollup(spark, path, _events(spark, [
        ("2024-09-01 01:00:00", "click", 1.0),
    ]))
    IC.update_rollup(spark, path, _events(spark, [
        ("2024-01-05 01:00:00", "view", 2.0),
    ]))
    types = {
        str(pq.ParquetFile(f).schema_arrow.field("sum_value").type)
        for f in glob.glob(path + "/day=*/*.parquet")
    }
    assert types == {"decimal128(18, 2)"}, types
    # and the whole rollup reads + merges cleanly afterwards
    IC.update_rollup(spark, path, _events(spark, [
        ("2024-09-01 02:00:00", "click", 3.0),
    ]))
    assert spark.read.parquet(path).count() == 2


def test_rollup_null_timestamps_are_excluded_not_fatal(spark, tmp_path):
    """A malformed/NULL timestamp must not kill the maintenance job (it used
    to: day=None crashed the touched-day isoformat) nor land in any day."""
    path = str(tmp_path / "rollup")
    batch = _events(spark, [
        ("2024-01-01 01:00:00", "click", 1.0),
        (None, "click", 99.0),
    ])
    touched = IC.update_rollup(spark, path, batch)
    assert touched == ["2024-01-01"]
    rows = spark.read.parquet(path).collect()
    assert len(rows) == 1 and float(rows[0]["sum_value"]) == 1.0
