"""Stream-time OHLC bar maintenance (per (day, event_type) bars over a
micro-batch feed).

The batch bar query (`q_events_ohlc_bars`) wired as a Structured Streaming
foreachBatch sink: each micro-batch collapses to per-bar partial summaries and
folds into persisted bar state, so the current chart/feature table is
answerable at any point without rescanning history. The fold is exact because
every bar column is MERGEABLE:

- open  = carried as (ts, event_id, value); min of the struct is the earliest
  event by the unique (ts, id) order (lexicographic struct comparison — value
  never decides);
- close = max of the same struct shape;
- high/low = max/min; volume = sum; value sum carried in INTEGER CENTS
  (double summation order across batches would otherwise drift from the
  one-shot answer — the DECIMAL money rule applied to stream state).

Associativity + commutativity of those merge ops is what makes
stream == one-shot EXACT regardless of how events split across batches
(pinned by tests/test_bars_stream.py).

Per-batch cost: one map-side-combinable aggregate over the batch plus a merge
over touched-bar state rows — O(batch + bars touched); state O(active bars).

State layout (parquet, restart-safe, replay-idempotent — the
sketch_stream/frequency_stream discipline): `<state>/bars/batch_id=N/` holds
ALL bars after folding batch N; folding batch N reads the newest partition
with batch_id < N, so an at-least-once re-delivery re-derives N from N-1 and
overwrites it — identical input, identical output (counts are NOT naturally
idempotent, which is exactly why the fold never reads its own batch's
partition).

Reference parity note: the reference (app/mapper.js) has no bar surface; this
is SURVEY §2.H H76's streaming form.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, functions as F
from plenario_mapper_spark.functions.local_rel import local_rows as _local_rows

STATE_SCHEMA = (
    "day date, event_type string, "
    "o_ts timestamp, o_id long, open double, "
    "c_ts timestamp, c_id long, close double, "
    "high double, low double, n_events long, sum_cents long"
)


def _partials(events: DataFrame) -> DataFrame:
    """Per-(day, type) mergeable bar summaries of one event set."""
    cents = F.round(F.col("value").cast("decimal(18,2)") * 100, 0).cast("long")
    g = events.groupBy(
        F.to_date("ts").alias("day"), F.col("event_type")
    ).agg(
        F.min(F.struct(F.col("ts"), F.col("event_id"), F.col("value"))).alias("_o"),
        F.max(F.struct(F.col("ts"), F.col("event_id"), F.col("value"))).alias("_c"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.count("*").cast("long").alias("n_events"),
        F.sum(cents).cast("long").alias("sum_cents"),
    )
    return g.select(
        "day",
        "event_type",
        F.col("_o.ts").alias("o_ts"),
        F.col("_o.event_id").alias("o_id"),
        F.col("_o.value").alias("open"),
        F.col("_c.ts").alias("c_ts"),
        F.col("_c.event_id").alias("c_id"),
        F.col("_c.value").alias("close"),
        "high",
        "low",
        "n_events",
        "sum_cents",
    )


def _merge(parts: DataFrame) -> DataFrame:
    """Fold any number of partial summaries per bar into one."""
    g = parts.groupBy("day", "event_type").agg(
        F.min(F.struct(F.col("o_ts").alias("ts"), F.col("o_id").alias("event_id"),
                       F.col("open").alias("value"))).alias("_o"),
        F.max(F.struct(F.col("c_ts").alias("ts"), F.col("c_id").alias("event_id"),
                       F.col("close").alias("value"))).alias("_c"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("sum_cents").cast("long").alias("sum_cents"),
    )
    return g.select(
        "day",
        "event_type",
        F.col("_o.ts").alias("o_ts"),
        F.col("_o.event_id").alias("o_id"),
        F.col("_o.value").alias("open"),
        F.col("_c.ts").alias("c_ts"),
        F.col("_c.event_id").alias("c_id"),
        F.col("_c.value").alias("close"),
        "high",
        "low",
        "n_events",
        "sum_cents",
    )


class BarStream:
    def __init__(self, spark: SparkSession, state_dir: str) -> None:
        self.spark = spark
        self.state_dir = state_dir

    # -- state ----------------------------------------------------------------
    def _state_ids(self) -> list[int]:
        root = os.path.join(self.state_dir, "bars")
        try:
            names = os.listdir(root)
        except FileNotFoundError:
            return []
        return sorted(
            int(m.group(1))
            for n in names
            if (m := re.fullmatch(r"batch_id=(\d+)", n))
        )

    def _read_state(self, before: int | None = None) -> DataFrame:
        ids = self._state_ids()
        if before is not None:
            ids = [i for i in ids if i < before]
        if not ids:
            return _local_rows(self.spark, [], STATE_SCHEMA)
        return self.spark.read.parquet(
            os.path.join(self.state_dir, "bars", f"batch_id={ids[-1]}")
        )

    def bars(self) -> DataFrame:
        """Current bar table in the batch query's presentation shape."""
        s = self._read_state()
        return s.select(
            "day",
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
            (F.col("sum_cents").cast("double") / 100.0).alias("sum_value"),
        )

    # -- the micro-batch body -------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        folded = _merge(
            _partials(batch_df).unionByName(self._read_state(before=batch_id))
        )
        folded.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.state_dir, "bars", f"batch_id={batch_id}")
        )

    # -- wiring ---------------------------------------------------------------
    def start(self, source: DataFrame, checkpoint_dir: str, trigger_once: bool = True):
        writer = source.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
