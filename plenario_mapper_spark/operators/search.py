"""Lexical retrieval over the document corpus — BM25 term scoring + top-k.

The retrieval primitive a training-data pipeline runs constantly: find the
documents most relevant to a probe query (benchmark decontamination's fuzzy
cousin, targeted corpus curation, eval-set mining, RAG index bootstrap). The
composition rule is Okapi BM25 (Robertson & Walker; the Lucene positive-idf
variant), computed entirely relationally:

- one token explode over the corpus (scan-stage lower+split, the
  functions/text.tokens pattern both engines spell identically);
- document length + corpus stats (N, avgdl) as exact integer aggregates,
  broadcast back as a one-row relation;
- per-(doc, term) tf for the QUERY TERMS ONLY — the explode filters to the
  term set before any shuffle, so the grouped state is |matching docs| x
  |terms|, never the corpus vocabulary;
- df per term (a |terms|-row relation, broadcast);
- the BM25 fold per doc over its term scores, ORDERED by term so the
  cross-row double sum is a deterministic sequential fold (the F.aggregate
  == list_reduce bit-parity discipline — a groupBy SUM of doubles has
  nondeterministic addend order);
- top-k by the 12-rounded score with doc-id tie-break (round-then-rank: idf
  is a libm ln, so raw doubles can differ by an ulp across engines).

At 100 TB: the explode+filter is embarrassingly parallel, tf/df shuffles
carry only matching (doc, term) pairs, stats and df broadcast, and top-k is
TakeOrdered (per-partition heads + driver merge of k rows) — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from plenario_mapper_spark.functions import parity as PAR
from plenario_mapper_spark.functions import text as TX


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 score for `terms` (an OR query, the BM25
    default). Returns (id_col, rank, score), score 6-rounded. Docs matching
    no term never appear (their score is 0 and BM25 retrieval drops them).

    idf = ln(1 + (N - df + 0.5)/(df + 0.5))  — always positive (Lucene form)
    s_t = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    """
    base = docs.select(
        F.col(id_col).alias("id"), TX.tokens(F.col(text_col)).alias("toks")
    )
    # corpus stats come from the PRE-explode frame: dl is size(toks), known
    # before any generator runs, so the full token relation never shuffles —
    # only query-term matches do (the r11 fix; the old groupBy("id") over
    # the exploded tokens re-shuffled docs x avgdl rows to recover a value
    # already present per doc, 7x the whole query's wall at 10x data).
    # n_docs counts docs with >= 1 token, mirroring what explode-based
    # counting did (and the oracle's COUNT(DISTINCT doc_id) FROM unnested).
    corpus = base.select(F.size("toks").alias("dl")).agg(
        F.count(F.when(F.col("dl") > 0, True)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    toks = base.select(
        "id", F.size("toks").alias("dl"), F.explode("toks").alias("tok")
    )
    tf = (
        toks.filter(F.col("tok").isin(list(terms)))
        .groupBy("id", "tok")
        .agg(F.count("*").cast("long").alias("tf"), F.first("dl").alias("dl"))
    )
    df_t = tf.groupBy("tok").agg(F.count("*").cast("long").alias("df"))

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
        tf.join(F.broadcast(df_t), "tok")
        .join(F.broadcast(corpus))
        .select("id", "tok", s_t.alias("s"))
    )
    # deterministic per-doc fold: sort term scores by token, then a
    # left-to-right double sum — bit-identical to the oracle's list_reduce
    # over list(s ORDER BY tok)
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
        .select(
            "id",
            PAR.round_at(F.col("score_raw"), 12).alias("score_r12"),
        )
    )
    top = folded.orderBy(F.desc("score_r12"), "id").limit(k)
    w = Window.orderBy(F.desc("score_r12"), "id")
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            F.col("id").alias(id_col),
            "rank",
            PAR.round6(F.col("score_r12")).alias("score"),
        )
    )
