"""Rank-sum AUC (q_eval_auc_ranksum's formulation).

Pins the midrank U-statistic against an independent Python reference on a
labeled set WITH ties, plus the degenerate separability cases.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F


def _spark_auc(spark, rows):
    d = spark.createDataFrame(rows, "score long, pos int")
    g = d.groupBy("score").agg(
        F.count("*").cast("long").alias("n"), F.sum("pos").cast("long").alias("p")
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    r = g.withColumn(
        "cum_before", F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long")
    )
    t = r.agg(
        F.sum("p").cast("long").alias("n_pos"),
        (F.sum("n") - F.sum("p")).cast("long").alias("n_neg"),
        F.sum(
            F.col("p").cast("double")
            * (
                F.col("cum_before").cast("double")
                + (F.col("n").cast("double") + F.lit(1.0)) / F.lit(2.0)
            )
        ).alias("u"),
    ).collect()[0]
    return (
        t["u"] - t["n_pos"] * (t["n_pos"] + 1) / 2
    ) / (t["n_pos"] * t["n_neg"])


def _ref_auc(rows):
    """Probability a random positive outranks a random negative, ties = 1/2."""
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def test_auc_matches_pairwise_reference_with_ties(spark):
    rows = [
        (10, 1), (10, 0), (12, 1), (8, 0), (12, 0), (15, 1),
        (9, 0), (15, 1), (15, 0), (7, 0), (11, 1), (10, 1),
    ]
    assert _spark_auc(spark, rows) == _ref_auc(rows)  # exact (dyadic midranks)


def test_auc_degenerate_cases(spark):
    perfect = [(i + 100, 1) for i in range(5)] + [(i, 0) for i in range(5)]
    inverted = [(i, 1) for i in range(5)] + [(i + 100, 0) for i in range(5)]
    all_tied = [(42, 1)] * 4 + [(42, 0)] * 6
    assert _spark_auc(spark, perfect) == 1.0
    assert _spark_auc(spark, inverted) == 0.0
    assert _spark_auc(spark, all_tied) == 0.5
