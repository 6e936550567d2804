"""Weighted without-replacement sampling (sampling.weighted_sample_k, A-ES on
the md5 gate): exactness vs an independent Python computation of the same
deterministic chain, repartition stability, the grouped budget, weight-gate
edge cases, and weight-proportionality of the selection."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from plenario_mapper_spark.operators.sampling import weighted_sample_k


def _py_priority(key, weight, salt="aes0"):
    h = int(hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:8], 16)
    u = (h + 0.5) / 2**32
    return round(-math.log(u) / weight, 12)


def _rows(n, w_of):
    return [(i, float(w_of(i))) for i in range(n)]


def test_matches_independent_python_aes(spark):
    rows = _rows(300, lambda i: 1 + (i % 7))
    df = spark.createDataFrame(rows, "id long, w double")
    got = sorted(r["id"] for r in weighted_sample_k(df, "id", "w", k=40).collect())
    want = sorted(
        i for i, _ in sorted(rows, key=lambda t: (_py_priority(t[0], t[1]), t[0]))[:40]
    )
    assert got == want


@pytest.mark.parametrize("parts", [1, 9])
def test_repartition_stable(spark, parts):
    rows = _rows(300, lambda i: 1 + (i % 7))
    df = spark.createDataFrame(rows, "id long, w double").repartition(parts)
    got = sorted(r["id"] for r in weighted_sample_k(df, "id", "w", k=40).collect())
    base = sorted(
        r["id"]
        for r in weighted_sample_k(
            spark.createDataFrame(rows, "id long, w double"), "id", "w", k=40
        ).collect()
    )
    assert got == base


def test_grouped_budget_min_k_per_group(spark):
    rows = [(i, "big" if i < 50 else "small", 1.0) for i in range(53)]
    df = spark.createDataFrame(rows, "id long, g string, w double")
    out = weighted_sample_k(df, "id", "w", k=10, group_col="g").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r["id"])
    assert len(by_g["big"]) == 10
    assert sorted(by_g["small"]) == [50, 51, 52]  # |group| < k: all kept


def test_nonpositive_and_null_weights_excluded(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -2.0), (4, None), (5, 1.0)], "id long, w double"
    )
    ids = sorted(r["id"] for r in weighted_sample_k(df, "id", "w", k=10).collect())
    assert ids == [1, 5]


def test_selection_is_weight_proportional(spark):
    # 10% of the population carries weight 9, the rest weight 1: the heavy
    # tier's share of the selection must exceed its population share by a
    # wide margin (deterministic given the salt, so this is a stable check).
    rows = _rows(2000, lambda i: 9 if i % 10 == 0 else 1)
    df = spark.createDataFrame(rows, "id long, w double")
    sel = [r["id"] for r in weighted_sample_k(df, "id", "w", k=200).collect()]
    heavy = sum(1 for i in sel if i % 10 == 0)
    assert heavy / len(sel) > 0.2  # population share is 0.1


def test_rejects_bad_k(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, w double")
    with pytest.raises(ValueError):
        weighted_sample_k(df, "id", "w", k=0)
