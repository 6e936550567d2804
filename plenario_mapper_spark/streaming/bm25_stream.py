"""Stream-time BM25 index maintenance — H138's streaming form.

A retrieval index over a growing corpus cannot re-scan history per batch:
the stream maintains the three things BM25 serving needs, each incrementally
and each restart-safe parquet:

- `<state>/postings/batch_id=N/tb=X/` — (tok, id, tf, dl) postings, bucketed
  by tb = md5(tok) % 256 so a query's serve path file-prunes to its terms'
  buckets (the vocabulary is far too large to partition by raw token).
- `<state>/stats/batch_id=N/` — per-batch (n_docs, sum_dl) corpus partials
  and per-(tok) df partials folded into the SAME layout (kind='corpus' row +
  kind='term' rows, tb-bucketed too). All stats are exact INTEGER partials:
  summation across batch partitions is order-independent, so serving from
  the accumulated state is EXACTLY the one-shot computation — no float ever
  crosses a batch boundary.

Per-batch cost ∝ |batch| (one tokenize + two partition writes); serving cost
∝ postings of the query terms' buckets — independent of corpus size and of
batch count beyond the file listing. The at-least-once foreachBatch contract
is honored the dedup_stream way: explicit-path partition overwrite keyed by
batch_id makes a replayed micro-batch byte-idempotent.

Contract: the corpus is APPEND-ONLY (unique doc ids across batches) — the
standard segment-index story; updating or deleting a document requires a
compaction pass (rewrite the affected partitions), exactly as in any
segment-based retrieval engine. A replayed batch (same batch_id) is safe;
a re-ingested id under a NEW batch id would double-count df/dl by design.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from plenario_mapper_spark.functions import parity as PAR
from plenario_mapper_spark.functions import text as TX
from plenario_mapper_spark.functions.local_rel import local_rows as _local_rows

_TB_BUCKETS = 256
POSTING_SCHEMA = "tok string, id long, tf long, dl long, tb int"
STAT_SCHEMA = "kind string, tok string, df long, n_docs long, sum_dl long, tb int"


def _tb(tok_col):
    return F.pmod(
        F.conv(F.substring(F.md5(tok_col), 1, 8), 16, 10).cast("long"),
        F.lit(_TB_BUCKETS),
    ).cast("int")


class Bm25IndexStream:
    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.id_col = id_col
        self.text_col = text_col

    # -- state ----------------------------------------------------------------
    def _read_state_parquet(self, subdir: str, empty: DataFrame) -> DataFrame:
        """Empty only for 'not created yet'; real FS errors propagate (the
        dedup_stream ADVICE r9 discipline)."""
        path = os.path.join(self.state_dir, subdir)
        if not os.path.isdir(path):
            return empty
        try:
            return self.spark.read.parquet(path)
        except AnalysisException:
            return empty

    def postings(self) -> DataFrame:
        empty = _local_rows(self.spark, [], POSTING_SCHEMA).withColumn(
            "batch_id", F.lit(None).cast("long")
        )
        return self._read_state_parquet("postings", empty)

    def stats(self) -> DataFrame:
        empty = _local_rows(self.spark, [], STAT_SCHEMA).withColumn(
            "batch_id", F.lit(None).cast("long")
        )
        return self._read_state_parquet("stats", empty)

    # -- the micro-batch body -------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        batch = (
            batch_df.select(self.id_col, self.text_col)
            .dropDuplicates([self.id_col])
            .persist()
        )
        batch.count()
        toks = batch.select(
            F.col(self.id_col).alias("id"),
            TX.tokens(F.col(self.text_col)).alias("toks"),
        ).select("id", F.size("toks").alias("dl"), F.explode("toks").alias("tok"))
        post = (
            toks.groupBy("id", "tok")
            .agg(F.count("*").cast("long").alias("tf"), F.first("dl").alias("dl"))
            .select("tok", "id", "tf", "dl", _tb(F.col("tok")).alias("tb"))
            .persist()  # two consumers: the postings write and the df partial
        )
        post.count()
        post.write.mode("overwrite").partitionBy("tb").parquet(
            os.path.join(self.state_dir, "postings", f"batch_id={batch_id}")
        )
        df_part = post.groupBy("tok", "tb").agg(
            F.count("*").cast("long").alias("df")
        ).select(
            F.lit("term").alias("kind"),
            "tok",
            "df",
            F.lit(None).cast("long").alias("n_docs"),
            F.lit(None).cast("long").alias("sum_dl"),
            "tb",
        )
        # corpus partial counts EVERY doc (incl. token-less ones contributing
        # dl=0): derive from the batch, not the postings
        dl_per_doc = batch.select(
            F.size(TX.tokens(F.col(self.text_col))).alias("dl")
        )
        corpus_part = dl_per_doc.agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("dl").cast("long").alias("sum_dl"),
        ).select(
            F.lit("corpus").alias("kind"),
            F.lit(None).cast("string").alias("tok"),
            F.lit(None).cast("long").alias("df"),
            "n_docs",
            "sum_dl",
            F.lit(0).cast("int").alias("tb"),
        )
        df_part.unionByName(corpus_part).write.mode("overwrite").parquet(
            os.path.join(self.state_dir, "stats", f"batch_id={batch_id}")
        )
        post.unpersist()
        batch.unpersist()

    # -- serving ----------------------------------------------------------------
    def topk(self, terms: list[str], k: int = 10, k1: float = 1.2, b: float = 0.75) -> DataFrame:
        """Serve BM25 top-k from the accumulated index — identical semantics
        (and identical values: integer stats sum order-independently across
        batches) to operators/search.bm25_topk over the full corpus. Reads
        only the query terms' tb buckets of the postings."""
        tbs = sorted(
            {
                int.from_bytes(bytes.fromhex(__import__("hashlib").md5(t.encode()).hexdigest()[:8]), "big")
                % _TB_BUCKETS
                for t in terms
            }
        )
        stats = self.stats()
        corpus = stats.filter(F.col("kind") == "corpus").agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("sum_dl").cast("long").alias("sum_dl"),
        )
        dft = (
            stats.filter(
                (F.col("kind") == "term")
                & F.col("tb").isin(tbs)
                & F.col("tok").isin(list(terms))
            )
            .groupBy("tok")
            .agg(F.sum("df").cast("long").alias("df"))
        )
        tf = self.postings().filter(
            F.col("tb").isin(tbs) & F.col("tok").isin(list(terms))
        ).select("id", "tok", "tf", "dl")

        d = F.col("df").cast("double")
        n = F.col("n_docs").cast("double")
        avgdl = F.col("sum_dl").cast("double") / n
        idf = F.log(F.lit(1.0) + (n - d + F.lit(0.5)) / (d + F.lit(0.5)))
        tf_d = F.col("tf").cast("double")
        denom = tf_d + F.lit(float(k1)) * (
            F.lit(1.0 - b) + F.lit(float(b)) * F.col("dl").cast("double") / avgdl
        )
        s_t = idf * (tf_d * F.lit(float(k1 + 1.0))) / denom
        scored = (
            tf.join(F.broadcast(dft), "tok")
            .join(F.broadcast(corpus))
            .select("id", "tok", s_t.alias("s"))
        )
        folded = (
            scored.groupBy("id")
            .agg(
                F.aggregate(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("tok", "s"))),
                        lambda st: st["s"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("score_raw")
            )
            .select("id", PAR.round_at(F.col("score_raw"), 12).alias("score_r12"))
        )
        top = folded.orderBy(F.desc("score_r12"), "id").limit(k)
        w = Window.orderBy(F.desc("score_r12"), "id")
        return top.withColumn("rank", F.row_number().over(w)).select(
            F.col("id").alias(self.id_col),
            "rank",
            PAR.round6(F.col("score_r12")).alias("score"),
        )

    def start(self, source: DataFrame, checkpoint_dir: str, trigger_once: bool = True):
        writer = source.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
