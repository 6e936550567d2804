"""Stream-time KMV sketch maintenance (per-label distinct sketches over a
micro-batch feed).

The batch sketch (`operators/sketches.kmv_sketch`, certified by
`q_sets_kmv_overlap`) wired as a Structured Streaming foreachBatch sink: each
micro-batch's keys fold into one persisted KMV sketch per LABEL (audience
segment, corpus source, event type), so "how much do segments A and B overlap
in everything ingested so far" is answerable at any point from two k-row
sketches — never a rescan of history, never a distinct-shuffle of the
accumulated key sets. The fold is exact by the KMV composition property: the
k smallest of (state ∪ batch-sketch) IS the sketch of everything seen, so the
stream answer equals the one-shot batch answer bit for bit (pinned
stream==batch by tests/test_sketch_stream.py).

Per-batch cost: one pass over the batch (scan-stage hashing + a per-label
k-smallest cut over batch-distinct hashes) plus a merge over <= k*labels state
rows — O(batch), state O(k * labels).

State layout (parquet, restart-safe, replay-idempotent — the
frequency_stream/dedup_stream discipline):
- `<state>/sketch/batch_id=N/` — all labels' sketches AFTER folding batch N
  as (label, h) rows. Folding batch N reads the newest partition with
  batch_id < N, so an at-least-once re-delivery of batch N re-derives N's
  partition from N-1's state and overwrites it — a no-op on identical input
  (folding a set twice is folding it once: min-k is idempotent).

Reference parity note: the reference (app/mapper.js) has no sketch surface;
this is SURVEY §2.H H47's streaming form, the set-operation analog of
frequency_stream.HeavyHittersStream (H41).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from plenario_mapper_spark.operators import sketches as SK
from plenario_mapper_spark.functions.local_rel import local_rows as _local_rows

STATE_SCHEMA = "label string, h long"


class KmvStream:
    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        label_col: str,
        key_col: str,
        k: int = 64,
        salt: str = "kmv0",
    ) -> None:
        if k < 2:
            raise ValueError(f"k must be >= 2, got {k}")
        self.spark = spark
        self.state_dir = state_dir
        self.label_col = label_col
        self.key_col = key_col
        self.k = k
        self.salt = salt

    # -- state ----------------------------------------------------------------
    def _sketch_ids(self) -> list[int]:
        root = os.path.join(self.state_dir, "sketch")
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
        """(label, h) rows of the newest sketch partition — restricted to
        batch_id < `before` when replaying that batch. Empty before any
        batch."""
        ids = self._sketch_ids()
        if before is not None:
            ids = [i for i in ids if i < before]
        if not ids:
            return _local_rows(self.spark, [], STATE_SCHEMA)
        return self.spark.read.parquet(
            os.path.join(self.state_dir, "sketch", f"batch_id={ids[-1]}")
        )

    def _min_k_per_label(self, rows: DataFrame) -> DataFrame:
        """The k smallest distinct hashes within each label — one window cut
        over (batch ∪ state)-sized input, shuffled on the label only."""
        w = Window.partitionBy("label").orderBy("h")
        return (
            rows.distinct()
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= self.k)
            .drop("_rn")
        )

    def sketch(self, label: str) -> DataFrame:
        """Current KMV sketch (`h` rows) for one label (empty if unseen)."""
        return (
            self._read_state()
            .filter(F.col("label") == label)
            .select("h")
            .orderBy("h")
        )

    def overlap(self, label_a: str, label_b: str) -> DataFrame:
        """One-row overlap estimates between two labels' accumulated key sets
        (operators/sketches.kmv_overlap_stats): est_union, est_jaccard,
        est_intersect — O(k) work, no history rescan."""
        return SK.kmv_overlap_stats(
            self.sketch(label_a), self.sketch(label_b), self.k
        )

    # -- the micro-batch body -------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        batch_rows = batch_df.select(
            F.col(self.label_col).cast("string").alias("label"),
            SK.kmv_hash(F.col(self.key_col), self.salt).alias("h"),
        )
        folded = self._min_k_per_label(
            self._min_k_per_label(batch_rows).union(
                self._read_state(before=batch_id)
            )
        )
        # <= k * labels rows by construction — one file is the right layout
        folded.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.state_dir, "sketch", f"batch_id={batch_id}")
        )

    # -- wiring ---------------------------------------------------------------
    def start(self, source: DataFrame, checkpoint_dir: str, trigger_once: bool = True):
        writer = source.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
