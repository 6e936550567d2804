"""Stream-time TWAP maintenance (per (day, event_type) time-weighted average
over a micro-batch feed).

The batch TWAP (`q_events_twap`) weights each gauge reading by how long it
remained current. Across micro-batches that weight CROSSES THE BATCH
BOUNDARY: the last reading of batch N stays current until the first reading
of batch N+1, so unlike OHLC bars the fold needs more than per-batch sums —
state carries, per bar, the accumulated (Σ value·dt, Σ dt) PLUS the bar's
last reading (ts, id, value), and folding a batch first adds the BRIDGE
interval last_value × (batch_first_ts − last_ts) before the batch's internal
intervals.

Ordering contract: within a (day, type) bar, each batch's readings must not
precede the bar's last already-folded reading (event-time-ordered arrival —
the natural shape of an append-only gauge feed; in production the watermark
enforces it). Violations are detected and the batch REJECTED (fail-fast
beats silently-negative intervals).

Exactness: values accumulate as DECIMAL cents × exact integer microseconds
(the q_events_twap rule), so stream == one-shot batch TWAP to the last bit
however the readings split across batches (pinned by
tests/test_twap_stream.py). Per-batch cost: one window pass over the batch +
a merge over touched bars; state is O(active bars) and replay-idempotent via
the batch_id partition discipline (bars_stream/sketch_stream).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from plenario_mapper_spark.functions import parity as PAR
from plenario_mapper_spark.functions.local_rel import local_rows as _local_rows

STATE_SCHEMA = (
    "day date, event_type string, "
    "wv decimal(38,2), w long, "
    "first_ts timestamp, last_ts timestamp, last_id long, last_v decimal(18,2)"
)


def _partials(events: DataFrame) -> DataFrame:
    """Per-(day, type) mergeable TWAP summaries of one event batch:
    internal weighted sums plus both boundary readings."""
    v = F.round(F.col("value").cast("decimal(18,2)"), 2)
    w = Window.partitionBy(F.to_date("ts"), "event_type").orderBy("ts", "event_id")
    s = events.select(
        F.to_date("ts").alias("day"),
        "event_type",
        F.col("ts"),
        F.col("event_id"),
        v.alias("v"),
        (F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")).alias("dt_us"),
    )
    g = s.groupBy("day", "event_type").agg(
        F.sum(F.when(F.col("dt_us").isNotNull(), F.col("v") * F.col("dt_us")))
        .cast("decimal(38,2)")
        .alias("wv"),
        F.sum("dt_us").cast("long").alias("w"),
        F.min(F.struct("ts", "event_id", "v")).alias("_f"),
        F.max(F.struct("ts", "event_id", "v")).alias("_l"),
    )
    return g.select(
        "day",
        "event_type",
        F.coalesce(F.col("wv"), F.lit(0).cast("decimal(38,2)")).alias("wv"),
        F.coalesce(F.col("w"), F.lit(0)).cast("long").alias("w"),
        F.col("_f.ts").alias("first_ts"),
        F.col("_l.ts").alias("last_ts"),
        F.col("_l.event_id").alias("last_id"),
        F.col("_l.v").alias("last_v"),
    )


class OutOfOrderBatch(ValueError):
    """A batch contained a reading older than its bar's folded frontier."""


class TwapStream:
    def __init__(self, spark: SparkSession, state_dir: str) -> None:
        self.spark = spark
        self.state_dir = state_dir

    # -- state ----------------------------------------------------------------
    def _state_ids(self) -> list[int]:
        root = os.path.join(self.state_dir, "twap")
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
            os.path.join(self.state_dir, "twap", f"batch_id={ids[-1]}")
        )

    def twap(self) -> DataFrame:
        """Current TWAP table in the batch query's presentation shape (bars
        with zero accumulated weight — single-reading so far — excluded,
        matching q_events_twap's w > 0 contract)."""
        s = self._read_state()
        return s.filter(F.col("w") > 0).select(
            "day",
            "event_type",
            PAR.round6(
                F.col("wv").cast("double") / F.col("w").cast("double")
            ).alias("twap"),
            F.col("w").alias("weight_us"),
        )

    # -- the micro-batch body -------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        state = self._read_state(before=batch_id)
        batch = _partials(batch_df)
        j = state.alias("s").join(
            batch.alias("b"), ["day", "event_type"], "full_outer"
        )
        # ordering contract: the batch must not reach behind the frontier
        bad = j.filter(
            F.col("s.last_ts").isNotNull()
            & F.col("b.first_ts").isNotNull()
            & (F.col("b.first_ts") < F.col("s.last_ts"))
        ).count()
        if bad:
            raise OutOfOrderBatch(
                f"batch {batch_id}: {bad} bar(s) received readings older than "
                "their folded frontier — event-time ordering violated"
            )
        bridge_w = F.unix_micros(F.col("b.first_ts")) - F.unix_micros(
            F.col("s.last_ts")
        )
        has_both = F.col("s.last_ts").isNotNull() & F.col("b.first_ts").isNotNull()
        folded = j.select(
            "day",
            "event_type",
            (
                F.coalesce(F.col("s.wv"), F.lit(0).cast("decimal(38,2)"))
                + F.coalesce(F.col("b.wv"), F.lit(0).cast("decimal(38,2)"))
                + F.when(has_both, F.col("s.last_v") * bridge_w)
                .otherwise(F.lit(0))
                .cast("decimal(38,2)")
            )
            .cast("decimal(38,2)")
            .alias("wv"),
            (
                F.coalesce(F.col("s.w"), F.lit(0))
                + F.coalesce(F.col("b.w"), F.lit(0))
                + F.when(has_both, bridge_w).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("w"),
            F.coalesce(F.col("s.first_ts"), F.col("b.first_ts")).alias("first_ts"),
            F.coalesce(F.col("b.last_ts"), F.col("s.last_ts")).alias("last_ts"),
            F.coalesce(F.col("b.last_id"), F.col("s.last_id")).alias("last_id"),
            F.coalesce(F.col("b.last_v"), F.col("s.last_v")).alias("last_v"),
        )
        folded.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.state_dir, "twap", f"batch_id={batch_id}")
        )

    # -- wiring ---------------------------------------------------------------
    def start(self, source: DataFrame, checkpoint_dir: str, trigger_once: bool = True):
        writer = source.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
