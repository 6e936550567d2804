"""Stream-time heavy-hitters maintenance (Misra-Gries over a micro-batch feed).

The batch sketch (`operators/frequency.misra_gries`, certified by
`q_doc_heavy_hitters`) wired as a Structured Streaming foreachBatch sink: each
micro-batch folds its per-partition summaries into a persisted global summary.
Per-batch cost is one pass over the batch plus a merge over <= k*(partitions+1)
counter rows — never a rescan of history — so the running "what are the
frequent tokens in everything ingested so far" answer stays O(batch) per batch
at any corpus size. The mergeable-summaries guarantees survive every fold
(merging adds counters then subtracts the (k+1)-th largest; deductions are
tracked), so at ANY point in the stream:

    est(x) <= true(x) <= est(x) + total_dec,   total_dec <= n_seen/(k+1)

and every item with true count > total_dec is present in the summary —
the same theorems q_doc_heavy_hitters certifies for the one-shot form,
checked stream==batch by tests/test_frequency_stream.py.

State layout (parquet, restart-safe, replay-idempotent):
- `<state>/summary/batch_id=N/` — the global summary AFTER folding batch N:
  (item, est, 0, 0) counter rows plus one (NULL, 0, total_dec, n_seen)
  bookkeeping row. Folding batch N reads the newest summary with
  batch_id < N, so the at-least-once foreachBatch contract (a crashed batch
  N re-delivered) re-derives N's partition from N-1's state and overwrites
  it — a no-op on identical input, never a double-count. Old partitions are
  k-row files kept as an audit trail (prune by retention at scale).

Reference parity note: the reference (app/mapper.js) has no sketch surface;
this is SURVEY §2.H H41's streaming form, the frequency analog of
dedup_stream.NearDupStream (H39).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, functions as F

from plenario_mapper_spark.operators import frequency as FQ
from plenario_mapper_spark.functions.local_rel import local_rows as _local_rows

STATE_SCHEMA = "item string, est long, dec long, n long"


class HeavyHittersStream:
    def __init__(
        self, spark: SparkSession, state_dir: str, col: str, k: int = 256
    ) -> None:
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        self.spark = spark
        self.state_dir = state_dir
        self.col = col
        self.k = k

    # -- state ----------------------------------------------------------------
    def _summary_ids(self) -> list[int]:
        root = os.path.join(self.state_dir, "summary")
        try:
            names = os.listdir(root)
        except FileNotFoundError:
            return []
        out = []
        for n in names:
            m = re.fullmatch(r"batch_id=(\d+)", n)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _read_state(self, before: int | None = None) -> tuple[dict, int, int]:
        """(counters, total_dec, n_seen) from the newest summary partition —
        restricted to batch_id < `before` when replaying that batch."""
        ids = self._summary_ids()
        if before is not None:
            ids = [i for i in ids if i < before]
        if not ids:
            return {}, 0, 0
        rows = self.spark.read.parquet(
            os.path.join(self.state_dir, "summary", f"batch_id={ids[-1]}")
        ).collect()  # <= k+1 rows by construction (the sketch bound)
        counters = {r["item"]: r["est"] for r in rows if r["item"] is not None}
        book = [r for r in rows if r["item"] is None]
        dec = book[0]["dec"] if book else 0
        n = book[0]["n"] if book else 0
        return counters, dec, n

    def summary(self) -> DataFrame:
        """Current (item, est) candidates (empty before any batch)."""
        counters, _, _ = self._read_state()
        rows = [(it, int(c)) for it, c in counters.items()]
        return _local_rows(self.spark, rows, "item string, est long")

    def bounds(self) -> tuple[int, int]:
        """(total_dec, n_seen): every item's undercount is <= total_dec."""
        _, dec, n = self._read_state()
        return dec, n

    # -- the micro-batch body -------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # vals feeds two legs (sketch pass + row count; deduction mass cannot
        # recover the count — a prune of s removes >= (k+1)*s mass, not
        # exactly s) — persist once, eagerly via the count leg.
        vals = batch_df.select(
            F.col(self.col).cast("string").alias(self.col)
        ).persist()
        n_batch = vals.na.drop().count()
        # One distributed pass: per-partition k-counter summaries. Everything
        # after is <= k*(partitions+1) counter rows — metadata-sized by the
        # sketch bound, so the fold itself is driver-side mg_merge.
        rows = FQ.misra_gries(vals, self.col, self.k).collect()
        vals.unpersist()

        counters, total_dec, n_seen = self._read_state(before=batch_id)
        batch_counts: dict = {}
        for r in rows:
            if r["item"] is None:
                total_dec += r["dec"]
            else:
                batch_counts[r["item"]] = batch_counts.get(r["item"], 0) + r["est"]
        total_dec += FQ.mg_merge(counters, batch_counts, self.k)
        n_seen += n_batch

        out_rows = [(it, int(c), 0, 0) for it, c in counters.items()]
        out_rows.append((None, 0, int(total_dec), int(n_seen)))
        _local_rows(self.spark, out_rows, STATE_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(self.state_dir, "summary", f"batch_id={batch_id}"))

    # -- wiring ---------------------------------------------------------------
    def start(self, source: DataFrame, checkpoint_dir: str, trigger_once: bool = True):
        writer = source.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
