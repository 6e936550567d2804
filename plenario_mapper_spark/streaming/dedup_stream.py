"""Stream-time corpus near-duplicate maintenance.

The batch pipeline's incremental pair probe (`dedup.minhash_incremental_pairs`)
and component fold (`dedup.update_components`) — both certified incremental ==
one-shot by `q_dedup_incremental_near` / `q_dedup_incremental_cc` — wired as a
Structured Streaming foreachBatch sink: each micro-batch of documents probes
the accumulated corpus for near-dups, folds the new edges into the persisted
component state, and appends itself to the corpus. Per-batch cost therefore
scales with |batch| x bands plus touched candidates, never |corpus|^2 — the
contract that makes stream-time dedup of a growing 100 TB corpus viable.

State layout (all parquet, all restart-safe):
- `<state>/corpus/batch_id=N/` — the document log, partitioned by batch id.
  Dynamic partition OVERWRITE makes a replayed micro-batch idempotent: the
  at-least-once foreachBatch contract re-delivers (batch_df, batch_id) after
  a crash, and re-overwriting partition N with identical rows is a no-op.
- `<state>/components/` — the current (node, component) assignment, rewritten
  per batch (component state is O(docs-with-a-duplicate), small relative to
  the corpus; at larger scale swap for the bucketed MERGE of operators/merge).
- `<state>/pairs/batch_id=N/` — the near-dup evidence log (id_a, id_b,
  jaccard), same idempotent partition-overwrite discipline.

Reference parity note: the reference (app/mapper.js) has no dedup surface;
this serves SURVEY §2.H H39's streaming form.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from plenario_mapper_spark.operators import dedup as DD

CORPUS_SCHEMA = "doc_id long, text string"
COMPONENT_SCHEMA = "node long, component long"


class NearDupStream:
    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        threshold: float = 0.7,
        **minhash_kwargs,
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.id_col = id_col
        self.text_col = text_col
        self.threshold = threshold
        self.minhash_kwargs = minhash_kwargs

    # -- state ----------------------------------------------------------------
    def components(self) -> DataFrame:
        path = os.path.join(self.state_dir, "components")
        try:
            return self.spark.read.parquet(path)
        except Exception:
            return self.spark.createDataFrame([], COMPONENT_SCHEMA)

    def pairs(self) -> DataFrame:
        """The accumulated near-dup evidence log (empty before any batch)."""
        try:
            return self.spark.read.parquet(
                os.path.join(self.state_dir, "pairs")
            ).select("id_a", "id_b", "jaccard")
        except Exception:
            return self.spark.createDataFrame(
                [], "id_a long, id_b long, jaccard double"
            )

    # -- the micro-batch body -------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        batch = (
            batch_df.select(self.id_col, self.text_col)
            .dropDuplicates([self.id_col])  # last-wins inside one batch
            .persist()  # read by the probe (two sides) AND the corpus append
        )
        batch.count()
        # exclude THIS batch's own prior delivery from the old side (replay
        # after a crash mid-batch: its rows may already sit in partition
        # batch_id, and new-wins must apply to the re-delivered copy)
        corpus_path = os.path.join(self.state_dir, "corpus")
        try:
            old = (
                self.spark.read.parquet(corpus_path)
                .filter(F.col("batch_id") != batch_id)
                .select(self.id_col, self.text_col)
            )
        except Exception:
            old = self.spark.createDataFrame([], CORPUS_SCHEMA).toDF(
                self.id_col, self.text_col
            )
        new_pairs = DD.minhash_incremental_pairs(
            old, batch, self.id_col, self.text_col, self.threshold,
            **self.minhash_kwargs,
        ).persist()  # read by the pairs log write AND the component fold
        new_pairs.count()

        # Idempotent writes: overwrite THIS batch's partition directory
        # explicitly (hive-style batch_id=N path, partition value inferred on
        # read). Explicit-path overwrite rather than
        # partitionOverwriteMode=dynamic because foreachBatch hands the batch
        # DataFrame a CLONED session with isolated SQLConf — a conf set on
        # the driver session never reaches the batch's write jobs, and the
        # default static mode silently wipes every other partition.
        new_pairs.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, "pairs", f"batch_id={batch_id}")
        )
        batch.write.mode("overwrite").parquet(
            os.path.join(corpus_path, f"batch_id={batch_id}")
        )

        # fold edges into component state. Components must reflect ALL pairs
        # ever seen; on replay the same edges fold in again — update_components
        # is idempotent on repeated edges (affected-component recompute).
        comp = DD.update_components(
            self.components(), new_pairs.select("id_a", "id_b"), "id_a", "id_b"
        ).select("node", "component")
        # Explicit column order before the positional re-wrap below:
        # update_components' anti-join moves its join key to the front, so the
        # collected Rows arrive (component, node)-ordered and
        # createDataFrame-with-schema binds POSITIONALLY, not by name.
        # Materialize driver-side before overwrite: the new state derives from
        # the file being replaced (same read-modify-write hazard the blacklist
        # save handles in streaming/pipeline.py).
        rows = comp.collect()
        out = (
            self.spark.createDataFrame(rows, COMPONENT_SCHEMA)
            if rows
            else self.spark.createDataFrame([], COMPONENT_SCHEMA)
        )
        out.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, "components")
        )
        new_pairs.unpersist()
        batch.unpersist()

    # -- wiring ---------------------------------------------------------------
    def start(self, source: DataFrame, checkpoint_dir: str, trigger_once: bool = True):
        writer = source.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
