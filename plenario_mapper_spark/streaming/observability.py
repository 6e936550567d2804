"""Streaming observability: capture StreamingQueryProgress as data.

The reference's only observability is stdout logging in the KCL daemon; a
production stream needs its throughput/latency history QUERYABLE — "did batch
durations regress after the deploy" is a SQL question over progress events.
Structured Streaming already emits a progress object per micro-batch; this
module materializes that firehose into rows via the public
StreamingQueryListener API, so the same engine that runs the pipeline can
analyze its own operation (one more table: join it, window it, gap-fill it).

Driver-side by design: progress events are one row PER MICRO-BATCH (a few
bytes each, thousands per day) — driver memory holds months of them; flush
to parquet periodically for history beyond a restart.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener
from plenario_mapper_spark.functions.local_rel import local_rows as _local_rows

PROGRESS_SCHEMA = (
    "query_id string, run_id string, batch_id long, timestamp string, "
    "num_input_rows long, input_rows_per_second double, "
    "process_rows_per_second double, batch_duration_ms long"
)


class ProgressRecorder(StreamingQueryListener):
    """Collects per-batch progress rows; attach with
    `spark.streams.addListener(rec)`, read with `rec.to_df(spark)`."""

    def __init__(self) -> None:
        self.rows: list[tuple] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API casing)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        self.rows.append(
            (
                p.get("id"),
                p.get("runId"),
                p.get("batchId"),
                p.get("timestamp"),
                p.get("numInputRows"),
                p.get("inputRowsPerSecond"),
                p.get("processedRowsPerSecond"),
                (p.get("batchDuration")),
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def to_df(self, spark: SparkSession) -> DataFrame:
        return _local_rows(spark, self.rows, PROGRESS_SCHEMA)


def throughput_summary(progress: DataFrame) -> DataFrame:
    """Per-query operational rollup over captured progress rows: batches,
    total rows, mean/max batch duration, rows/s distribution — the table an
    alert threshold is fit on (pair with q_events_winsorized for
    outlier-robust fitting)."""
    from pyspark.sql import functions as F

    return progress.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_batches"),
        F.sum("num_input_rows").cast("long").alias("total_rows"),
        F.avg("batch_duration_ms").alias("mean_batch_ms"),
        F.max("batch_duration_ms").cast("long").alias("max_batch_ms"),
        F.avg("process_rows_per_second").alias("mean_rows_per_sec"),
    )
