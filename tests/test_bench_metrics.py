"""Pins for bench.py's executor-time instrumentation (VERDICT r11 item 5 +
ADVICE r11): the CPU-normalized stream metric only exists if (a) stage IDs
dedupe across jobs and (b) a streaming query's jobs are recoverable via its
runId job group. Both are Spark-behavior dependencies that could silently
break on an upgrade — these tests fail loudly instead."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_executor_time_dedupes_stages_across_jobs():
    """A stage referenced by two jobs (AQE reused exchange) must count once
    (ADVICE r11). Exercised against fakes shaped like the status APIs."""
    from bench import _executor_time

    class _Info:
        def __init__(self, sids):
            self.stageIds = sids

    class _Tracker:
        def getJobInfo(self, j):
            return {1: _Info([10, 11]), 2: _Info([11, 12])}.get(j)

    class _Stage:
        def executorRunTime(self):
            return 1000

        def executorCpuTime(self):
            return 2_000_000_000

    class _Store:
        def lastStageAttempt(self, sid):
            if sid == 12:
                raise RuntimeError("skipped stage: no attempt")
            return _Stage()

    run_ms, cpu_ns = _executor_time(_Store(), _Tracker(), [1, 2])
    # stages {10, 11} counted once each; 12 skipped; job-level sum would
    # have been 3 x 1000
    assert run_ms == 2000
    assert cpu_ns == 4_000_000_000


def test_streaming_run_jobs_recoverable_via_runid_group(spark, tmp_path):
    """StreamExecution tags micro-batch jobs with jobGroup=runId — the
    contract _stream_throughput's CPU metric stands on. If a Spark upgrade
    changes the tag, this test (not a silent -1 in BENCH) catches it."""
    from pyspark.sql import functions as F

    from bench import _executor_time

    import glob
    import shutil

    src = str(tmp_path / "in")
    stage = str(tmp_path / "stage")
    os.makedirs(src)
    spark.range(100).withColumn("v", F.col("id") * 2).coalesce(1).write.parquet(
        stage
    )
    # file-stream sources want FLAT files in the watched dir
    shutil.copy(glob.glob(os.path.join(stage, "part-*.parquet"))[0],
                os.path.join(src, "batch0.parquet"))
    schema = spark.read.parquet(src).schema
    q = (
        spark.readStream.schema(schema)
        .parquet(src)
        .groupBy((F.col("id") % 10).alias("k"))
        .agg(F.sum("v").alias("s"))
        .writeStream.format("memory")
        .queryName("runid_probe")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    tracker = spark.sparkContext.statusTracker()
    jobs = list(tracker.getJobIdsForGroup(str(q.runId)) or [])
    assert jobs, "no jobs tagged with the streaming query's runId job group"
    store = spark.sparkContext._jsc.sc().statusStore()
    run_ms, cpu_ns = _executor_time(store, tracker, jobs)
    assert run_ms > 0 and cpu_ns > 0
