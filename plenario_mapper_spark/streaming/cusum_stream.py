"""Stream-time CUSUM rate monitoring (per-series sustained-drift alarms).

The batch statistic (q_events_cusum_changepoint) rewinds the whole series
through its prefix-sum closed form; the STREAM form exploits what makes CUSUM
the classic online detector: the recursion c_t = max(0, c_{t-1} + dev_t)
needs exactly TWO numbers of state per monitored series (the running
statistic and the observation count). Each micro-batch folds its
observations — ordered by the event-time column, the same total order the
batch query uses — on top of the persisted statistic, so "has any series
drifted above its reference level" is answerable after every batch with no
history rescan and state O(series).

Production CUSUM monitors against a FIXED reference level mu0 per series
(estimated from a baseline window and pinned); the reference is an INPUT
here, not derived from the stream — deriving it per-batch would let the
alarm's own target drift with the regression it is meant to catch. dev =
x - mu0 * (1 + slack_frac), the same 5% allowance as the batch query.

Per-batch cost: one applyInPandas pass over the batch grouped by series
(each group sorts its own rows; the fold is O(rows)); everything after is a
series-sized state merge.

State layout (parquet, restart-safe, replay-idempotent — the
frequency_stream/sketch_stream discipline):
- `<state>/cusum/batch_id=N/` — (series, c, n_seen) AFTER folding batch N.
  Folding batch N reads the newest partition with batch_id < N, so an
  at-least-once re-delivery of batch N re-derives N's rows from N-1's state
  and overwrites them — identical input, identical output.

Reference parity note: the reference (app/mapper.js) has no monitoring
surface; this is SURVEY §2.H H51's streaming form, the drift analog of
sketch_stream.KmvStream (H47) and frequency_stream.HeavyHittersStream (H41).
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from plenario_mapper_spark.functions.local_rel import local_rows as _local_rows

STATE_SCHEMA = "series string, c double, n_seen long"


class CusumStream:
    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        series_col: str,
        value_col: str,
        order_col: str,
        ref_means: dict[str, float],
        slack_frac: float = 0.05,
    ) -> None:
        if not ref_means:
            raise ValueError("ref_means must name at least one monitored series")
        self.spark = spark
        self.state_dir = state_dir
        self.series_col = series_col
        self.value_col = value_col
        self.order_col = order_col
        self.ref_means = dict(ref_means)
        self.slack_frac = slack_frac

    # -- state ----------------------------------------------------------------
    def _state_ids(self) -> list[int]:
        root = os.path.join(self.state_dir, "cusum")
        try:
            names = os.listdir(root)
        except FileNotFoundError:
            return []
        return sorted(
            int(m.group(1))
            for n in names
            if (m := re.fullmatch(r"batch_id=(\d+)", n))
        )

    def _read_state(self, before: int | None = None) -> dict[str, tuple[float, int]]:
        ids = self._state_ids()
        if before is not None:
            ids = [i for i in ids if i < before]
        if not ids:
            return {}
        rows = self.spark.read.parquet(
            os.path.join(self.state_dir, "cusum", f"batch_id={ids[-1]}")
        ).collect()  # series-sized by construction
        return {r["series"]: (r["c"], r["n_seen"]) for r in rows}

    def stats(self) -> DataFrame:
        """Current (series, c, n_seen) — the statistic after the last fold
        (empty before any batch)."""
        rows = [
            (s, float(c), int(n)) for s, (c, n) in sorted(self._read_state().items())
        ]
        return _local_rows(self.spark, rows, STATE_SCHEMA)

    def alarms(self, decision_band: float) -> DataFrame:
        """Series whose statistic has crossed the decision band."""
        return self.stats().filter(F.col("c") >= decision_band)

    # -- the micro-batch body -------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        prior = self._read_state(before=batch_id)
        refs = self.ref_means
        slack = self.slack_frac
        s_col, v_col, o_col = self.series_col, self.value_col, self.order_col

        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            # applyInPandas hands each series its COMPLETE batch slice in one
            # frame (mapInPandas could split a series across Arrow batches and
            # double-seed the fold)
            series = pdf[s_col].iloc[0]
            if series not in refs:
                # unmonitored series pass through unobserved
                return pd.DataFrame(columns=["series", "c", "n_seen"])
            mu = refs[series] * (1.0 + slack)
            c, n = prior.get(series, (0.0, 0))
            for x in pdf.sort_values(o_col)[v_col]:
                c = max(0.0, c + (float(x) - mu))
                n += 1
            return pd.DataFrame([(series, c, n)], columns=["series", "c", "n_seen"])

        # one shuffle keys the batch on the series; each group folds locally
        folded = {
            r["series"]: (r["c"], r["n_seen"])
            for r in batch_df.select(s_col, v_col, o_col)
            .groupBy(s_col)
            .applyInPandas(fold, STATE_SCHEMA)
            .collect()  # series-sized
        }
        merged = {**prior, **folded}  # untouched series carry forward
        rows = [(s, float(c), int(n)) for s, (c, n) in sorted(merged.items())]
        _local_rows(self.spark, rows, STATE_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(self.state_dir, "cusum", f"batch_id={batch_id}"))

    # -- wiring ---------------------------------------------------------------
    def start(self, source: DataFrame, checkpoint_dir: str, trigger_once: bool = True):
        writer = source.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
