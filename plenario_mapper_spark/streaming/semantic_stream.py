"""Stream-time semantic (SemDeDup) deduplication — H128's streaming twin.

The batch operator (`similarity.semantic_dedup`, certified by
q_embed_semantic_dedup) clusters first so the quadratic cosine verify is
cluster-bounded. Its one-shot keep rule ("drop iff ANY smaller-id in-cluster
neighbor clears the threshold") cannot be maintained by a stream — a later,
smaller-id arrival would retract an already-emitted keep verdict. The rule a
stream CAN maintain exactly is sequential greedy keep-first
(`similarity.semantic_dedup_greedy`): a verdict depends only on EARLIER
arrivals, so it is final the moment it is made. Stream == one-shot greedy
whenever ingest ids are monotone across batches (the canonical log-ingest
pattern: ids mint in arrival order); within a batch, id order.

Per-micro-batch cost — the VERDICT r9 item 7 shape:
  |batch| x K        for the broadcast centroid assignment, plus
  |batch| x (kept representatives in TOUCHED clusters)  for the greedy probe.
Dropped documents are never stored and never probed against; untouched
clusters are never read (their state files are partition-pruned at the
scan). Both terms are independent of total corpus size — kept reps per
cluster saturate at the epsilon-packing number of the cluster's ball, the
same bound that makes batch SemDeDup's per-cluster verify tractable.

State layout (all parquet, all restart-safe):
- `<state>/centroids/` — the K-row centroid table, written ONCE at stream
  init (idempotent: only if absent). Assignment must be identical across
  batches and restarts, so centroids are state, not a per-batch argument.
- `<state>/kept/batch_id=N/cb=X/` — kept representatives (id, assigned_cid,
  v), partitioned by ingest batch then by cluster bucket cb = cid % 64.
  batch_id gives the idempotent explicit-path overwrite a replayed
  micro-batch needs (same discipline as dedup_stream's band index); cb gives
  file-level pruning when a batch touches few clusters. cb (not raw cid)
  bounds directory fan-out at large K; the residual in-bucket filter is an
  ordinary pushed predicate.
- `<state>/decisions/batch_id=N/` — the full verdict log
  (id, assigned_cid, is_kept), the stream's queryable output.

Replay safety: the at-least-once foreachBatch contract re-delivers
(batch_df, batch_id) after a crash. The probe EXCLUDES the batch's own
partition (its rows may already sit in kept/batch_id=N from the crashed
attempt), so a replay re-derives identical verdicts from identical inputs
and re-overwrites both partitions with identical content.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, functions as F

from plenario_mapper_spark.operators import similarity as SIM
from plenario_mapper_spark.functions.local_rel import local_rows as _local_rows

KEPT_SCHEMA = "id long, assigned_cid long, v array<double>, cb int"
DECISION_SCHEMA = "id long, assigned_cid long, is_kept boolean"
_CB_BUCKETS = 64


class SemanticDedupStream:
    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        centroids: DataFrame | None = None,
        threshold: float = 0.8,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        """`centroids` (cid, centroid) is required on FIRST init (it becomes
        state); a restart may omit it and reattaches to the persisted
        table. Passing centroids when state already holds a different set
        is refused — silently re-clustering a half-deduped corpus would
        split clusters and re-admit duplicates."""
        self.spark = spark
        self.state_dir = state_dir
        self.threshold = threshold
        self.id_col = id_col
        self.vec_col = vec_col
        cdir = os.path.join(state_dir, "centroids")
        if os.path.isdir(cdir) and os.path.isfile(os.path.join(cdir, "_SUCCESS")):
            if centroids is not None:
                # full-content comparison (cid AND vector): a same-cid table
                # with moved centroids would silently re-cluster a
                # half-deduped corpus — K rows, so the collect is metadata
                def canon(df):
                    return {
                        (r["cid"], tuple(float(x) for x in r["centroid"]))
                        for r in df.select("cid", "centroid").collect()
                    }

                if canon(self.spark.read.parquet(cdir)) != canon(centroids):
                    raise ValueError(
                        "state already holds a different centroid set; "
                        "a stream's cluster geometry is immutable"
                    )
        elif centroids is None:
            raise ValueError("first init needs the centroid table")
        else:
            centroids.coalesce(1).write.mode("overwrite").parquet(cdir)

    # -- state ----------------------------------------------------------------
    def centroids(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.state_dir, "centroids"))

    def _read_state_parquet(self, subdir: str, empty: DataFrame) -> DataFrame:
        """Empty ONLY for the two 'not created yet' shapes (dir absent, or no
        committed parquet footer); real read failures propagate — the
        dedup_stream ADVICE r9 discipline (a swallowed FS error here would
        silently disable all prior-corpus probing and re-admit duplicates)."""
        path = os.path.join(self.state_dir, subdir)
        if not os.path.isdir(path):
            return empty
        try:
            return self.spark.read.parquet(path)
        except AnalysisException:
            return empty

    def kept(self, exclude_batch: int | None = None) -> DataFrame:
        empty = _local_rows(self.spark, [], KEPT_SCHEMA).withColumn(
            "batch_id", F.lit(None).cast("long")
        )
        k = self._read_state_parquet("kept", empty)
        if exclude_batch is not None:
            k = k.filter(F.col("batch_id") != exclude_batch)
        return k.select("id", "assigned_cid", "v", "cb")

    def decisions(self) -> DataFrame:
        empty = _local_rows(self.spark, [], DECISION_SCHEMA).withColumn(
            "batch_id", F.lit(None).cast("long")
        )
        return self._read_state_parquet("decisions", empty).select(
            "id", "assigned_cid", "is_kept"
        )

    # -- the micro-batch body -------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        batch = (
            batch_df.select(self.id_col, self.vec_col)
            .dropDuplicates([self.id_col])
            .persist()  # two consumers: assignment and the greedy verify join
        )
        batch.count()
        cent = self.centroids()

        # Which cluster BUCKETS does this batch touch? <= 64 ints by
        # construction (cb = cid % 64, bounded regardless of K or corpus
        # size), so the collect is metadata-sized; the literals let the kept
        # scan prune untouched buckets at the FILE level, and the in-bucket
        # cid equi-join inside the greedy kernel's groupBy does the rest.
        assigned = SIM.assign_to_centroids(
            batch, cent, id_col=self.id_col, vec_col=self.vec_col
        ).select(
            F.col(self.id_col).alias("id"),
            "assigned_cid",
            (F.pmod(F.col("assigned_cid"), F.lit(_CB_BUCKETS))).cast("int").alias("cb"),
        ).persist()
        assigned.count()
        touched_cbs = [r["cb"] for r in assigned.select("cb").distinct().collect()]
        touched_cids = assigned.select("assigned_cid").distinct()

        # Prior kept representatives of touched clusters only — excluding
        # this batch's own partition (replay: a crashed attempt may already
        # have written it, and a doc must not probe its own prior delivery).
        reps = (
            self.kept(exclude_batch=batch_id)
            .filter(F.col("cb").isin(touched_cbs) if touched_cbs else F.lit(False))
            .join(F.broadcast(touched_cids), "assigned_cid")
            .select("id", "assigned_cid", "v")
        )

        # Greedy verdicts: the one-shot kernel, seeded with prior reps. The
        # assignment was computed above; re-deriving it inside
        # semantic_dedup_greedy would double the broadcast-scoring pass, so
        # inline the same join shape with the precomputed assignment.
        withv = (
            assigned.select("id", "assigned_cid")
            .join(
                batch.select(
                    F.col(self.id_col).alias("id"),
                    F.col(self.vec_col).cast("array<double>").alias("v"),
                ),
                "id",
            )
            .select(
                "id",
                F.col("assigned_cid").alias("cid"),
                "v",
                F.lit(False).alias("is_rep"),
            )
            .unionByName(
                reps.select(
                    "id",
                    F.col("assigned_cid").alias("cid"),
                    "v",
                    F.lit(True).alias("is_rep"),
                )
            )
        )
        verdicts = withv.groupBy("cid").applyInPandas(
            SIM._greedy_cluster_decisions(self.threshold),
            schema=DECISION_SCHEMA,
        ).persist()  # two consumers: the decision log and the kept append
        verdicts.count()

        # Idempotent explicit-path overwrites (foreachBatch hands a cloned
        # session whose SQLConf a driver-side partitionOverwriteMode never
        # reaches — the dedup_stream discipline).
        verdicts.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, "decisions", f"batch_id={batch_id}")
        )
        new_kept = (
            verdicts.filter("is_kept")
            .join(
                batch.select(
                    F.col(self.id_col).alias("id"),
                    F.col(self.vec_col).cast("array<double>").alias("v"),
                ),
                "id",
            )
            .select(
                "id",
                "assigned_cid",
                "v",
                F.pmod(F.col("assigned_cid"), F.lit(_CB_BUCKETS))
                .cast("int")
                .alias("cb"),
            )
        )
        new_kept.write.mode("overwrite").partitionBy("cb").parquet(
            os.path.join(self.state_dir, "kept", f"batch_id={batch_id}")
        )
        verdicts.unpersist()
        assigned.unpersist()
        batch.unpersist()

    def start(self, source: DataFrame, checkpoint_dir: str, trigger_once: bool = True):
        writer = source.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
