"""Stream-time Wald SPRT (per-variant sequential decisions).

The batch statistic (q_eval_sprt_decision) replays the whole purchase stream
through per-variant running-sum windows; the STREAM form exploits what makes
the SPRT the canonical online test: the integer random walk w = 2s - n
(p0=1/3 vs p1=2/3 makes both likelihood ratios exact powers of two — the
H147 ln2 discipline; the Wald A=32 boundary is |w| >= 5) needs exactly the
walk, the observation count, and the frozen first-crossing decision as
state per variant. Each micro-batch folds its observations — ordered by
(event-time, event_id), the same total order the batch query uses — on top
of the persisted walk, so "has any variant decided, and at which n" is
answerable after every batch with no history rescan and state O(variants).

First-crossing semantics are LOAD-BEARING: once |w| >= 5 the decision and
its n freeze (a later recrossing in the opposite direction must not flip
it), while the walk and count keep folding so the observability surface
(walk_final, n_obs) still equals the batch query's.

Per-batch cost: one applyInPandas pass over the batch grouped by variant
(each group sorts its own slice; the fold is O(rows)); everything after is
a variants-sized state merge.

State layout (parquet, restart-safe, replay-idempotent — the cusum_stream
discipline): `<state>/sprt/batch_id=N/` holds (variant, walk, n_obs,
decision, n_at_decision) AFTER folding batch N; folding batch N reads the
newest partition with batch_id < N, so an at-least-once re-delivery
re-derives N's rows from N-1's state — identical input, identical output.

Reference parity note: the reference (app/mapper.js) has no testing
surface; this is SURVEY §2.H H154's streaming form, the decision analog of
CusumStream (H51) and the bars/TWAP folds.
"""

from __future__ import annotations

import os
import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from plenario_mapper_spark.functions.local_rel import local_rows as _local_rows

STATE_SCHEMA = (
    "variant int, walk long, n_obs long, decision string, n_at_decision long"
)

# |walk| >= BOUNDARY decides (2^5 = 32 >= Wald A = 19 for alpha = beta = 0.05)
BOUNDARY = 5
# success = micro-quantized value >= this (the batch query's literal)
SUCCESS_MICRO = 150_000_000


class SprtStream:
    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        variant_col: str,
        value_col: str,
        order_cols: tuple[str, str],
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.variant_col = variant_col
        self.value_col = value_col
        self.order_cols = tuple(order_cols)

    # -- state ----------------------------------------------------------------
    def _state_ids(self) -> list[int]:
        root = os.path.join(self.state_dir, "sprt")
        try:
            names = os.listdir(root)
        except FileNotFoundError:
            return []
        return sorted(
            int(m.group(1))
            for n in names
            if (m := re.fullmatch(r"batch_id=(\d+)", n))
        )

    def _read_state(self, before: int | None = None) -> dict[int, tuple]:
        ids = self._state_ids()
        if before is not None:
            ids = [i for i in ids if i < before]
        if not ids:
            return {}
        rows = self.spark.read.parquet(
            os.path.join(self.state_dir, "sprt", f"batch_id={ids[-1]}")
        ).collect()  # variants-sized by construction
        return {
            r["variant"]: (r["walk"], r["n_obs"], r["decision"], r["n_at_decision"])
            for r in rows
        }

    def stats(self) -> DataFrame:
        """Current per-variant (walk, n_obs, decision, n_at_decision) — the
        test surface after the last fold (empty before any batch).
        `decision` is 'continue' until a boundary crossing freezes it."""
        rows = [
            (v, int(w), int(n), d, None if nd is None else int(nd))
            for v, (w, n, d, nd) in sorted(self._read_state().items())
        ]
        return _local_rows(self.spark, rows, STATE_SCHEMA)

    # -- the micro-batch body -------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        prior = self._read_state(before=batch_id)
        v_col, x_col = self.variant_col, self.value_col
        o1, o2 = self.order_cols

        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            # applyInPandas hands each variant its COMPLETE batch slice in
            # one frame (mapInPandas could split a variant across Arrow
            # batches and fold out of order)
            variant = int(pdf[v_col].iloc[0])
            walk, n, dec, n_dec = prior.get(variant, (0, 0, "continue", None))
            for x in pdf.sort_values([o1, o2])[x_col]:
                micro = int((float(x) * 1e6 + 0.5) // 1)
                walk += 1 if micro >= SUCCESS_MICRO else -1
                n += 1
                if dec == "continue" and abs(walk) >= BOUNDARY:
                    dec = "accept_h1" if walk >= BOUNDARY else "accept_h0"
                    n_dec = n
            return pd.DataFrame(
                [(variant, walk, n, dec, n_dec)],
                columns=["variant", "walk", "n_obs", "decision", "n_at_decision"],
            )

        folded = {
            r["variant"]: (r["walk"], r["n_obs"], r["decision"], r["n_at_decision"])
            for r in batch_df.select(v_col, x_col, o1, o2)
            .groupBy(v_col)
            .applyInPandas(fold, STATE_SCHEMA)
            .collect()  # variants-sized
        }
        merged = {**prior, **folded}  # untouched variants carry forward
        rows = [
            (v, int(w), int(n), d, None if nd is None else int(nd))
            for v, (w, n, d, nd) in sorted(merged.items())
        ]
        _local_rows(self.spark, rows, STATE_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(self.state_dir, "sprt", f"batch_id={batch_id}"))

    # -- wiring ---------------------------------------------------------------
    def start(self, source: DataFrame, checkpoint_dir: str, trigger_once: bool = True):
        writer = source.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
