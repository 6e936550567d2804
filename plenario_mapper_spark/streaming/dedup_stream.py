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
- `<state>/components/version=<generation>/` — the (node, component)
  assignment after each fold, plus a `_LATEST` pointer file naming the
  current generation. Each batch's state is computed CLUSTER-SIDE from the
  pointed-at directory and written to generation latest+1 — the state never
  materializes on the driver (component membership grows with every doc that
  ever joined a near-dup family; collect()ing it per batch was the one
  remaining 100 TB scale-killer, VERDICT r7 item 3), and writing to a fresh
  path while reading the old one removes the read-modify-write hazard the
  old single-directory overwrite had to break via the driver. The generation
  counter (not the batch id) keys the directory because a REPLAYED batch's
  pointer already names its own prior output — keying by batch id would
  overwrite the very directory being read; a replay instead writes a new
  generation with identical content (the fold is idempotent on repeated
  edges). The pointer swap is atomic (write-temp + rename); a crash between
  the version write and the swap leaves the pointer on the previous
  generation and the next write re-overwrites the orphan — readers only ever
  see a complete old-or-new state. Generations older than the pointer's
  predecessor are pruned.
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
    def _components_root(self) -> str:
        return os.path.join(self.state_dir, "components")

    def _latest_version(self) -> int | None:
        try:
            with open(os.path.join(self._components_root(), "_LATEST")) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return None

    def components(self) -> DataFrame:
        v = self._latest_version()
        if v is None:
            return self.spark.createDataFrame([], COMPONENT_SCHEMA)
        return self.spark.read.parquet(
            os.path.join(self._components_root(), f"version={v}")
        ).select("node", "component")

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
        # Versioned write: the new state reads the pointed-at generation's
        # directory and writes generation latest+1 cluster-side — no
        # driver-side materialization (state is unbounded at corpus scale)
        # and no read-modify-write hazard (distinct paths, even on replay:
        # the pointer then names this batch's own prior output, and folding
        # the same edges again yields an identical new generation).
        comp = DD.update_components(
            self.components(), new_pairs.select("id_a", "id_b"), "id_a", "id_b"
        ).select("node", "component")
        root = self._components_root()
        prev = self._latest_version()
        gen = 0 if prev is None else prev + 1
        comp.write.mode("overwrite").parquet(os.path.join(root, f"version={gen}"))
        # atomic pointer swap: readers see the complete old or new version
        tmp = os.path.join(root, "_LATEST.tmp")
        with open(tmp, "w") as f:
            f.write(str(gen))
        os.replace(tmp, os.path.join(root, "_LATEST"))
        self._prune_versions(gen)
        new_pairs.unpersist()
        batch.unpersist()

    def _prune_versions(self, current: int) -> None:
        """Drop generation directories older than `current - 1` (keep the
        pointer's target plus one predecessor for readers still holding the
        old plan). Orphans NEWER than the pointer cannot exist: the next
        write always targets pointer+1 and overwrites any crash leftover."""
        import shutil

        root = self._components_root()
        try:
            versions = [
                int(d.split("=", 1)[1])
                for d in os.listdir(root)
                if d.startswith("version=")
            ]
        except OSError:
            return
        for v in versions:
            if v < current - 1:
                shutil.rmtree(
                    os.path.join(root, f"version={v}"), ignore_errors=True
                )

    # -- wiring ---------------------------------------------------------------
    def start(self, source: DataFrame, checkpoint_dir: str, trigger_once: bool = True):
        writer = source.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
