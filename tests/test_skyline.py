"""Pareto frontier (operators/skyline) vs a brute-force dominance oracle, plus
the degenerate shapes: duplicates, NULL dims, single-objective, and the
anti-correlated worst case where the frontier is the whole input."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from plenario_mapper_spark.operators.skyline import pareto_frontier


def _brute(rows, minimize, maximize):
    def dominates(q, p):
        weak = all(q[c] <= p[c] for c in minimize) and all(
            q[c] >= p[c] for c in maximize
        )
        strict = any(q[c] < p[c] for c in minimize) or any(
            q[c] > p[c] for c in maximize
        )
        return weak and strict

    return sorted(
        tuple(sorted(p.items()))
        for p in rows
        if not any(dominates(q, p) for q in rows)
    )


@pytest.mark.parametrize("parts", [1, 6])
def test_matches_brute_force_random(spark, parts):
    rng = np.random.default_rng(11)
    rows = [
        {
            "id": i,
            "x": float(rng.integers(0, 40)),
            "y": int(rng.integers(0, 40)),
            "z": int(rng.integers(0, 6)),
        }
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, x double, y long, z long").repartition(
        parts
    )
    got = sorted(
        tuple(sorted(r.asDict().items()))
        for r in pareto_frontier(df, minimize=["x"], maximize=["y", "z"]).collect()
    )
    assert got == _brute(rows, ["x"], ["y", "z"])


def test_all_dim_ties_both_survive(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 5), (2, 1.0, 5), (3, 2.0, 4)], "id long, cost double, score long"
    )
    ids = sorted(
        r["id"]
        for r in pareto_frontier(df, minimize=["cost"], maximize=["score"]).collect()
    )
    assert ids == [1, 2]


def test_null_dims_excluded(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0)], "id long, cost double"
    )
    ids = sorted(r["id"] for r in pareto_frontier(df, minimize=["cost"]).collect())
    assert ids == [1]


def test_single_dim_keeps_all_minima(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (2, 2.0), (3, 9.0)], "id long, cost double"
    )
    ids = sorted(r["id"] for r in pareto_frontier(df, minimize=["cost"]).collect())
    assert ids == [1, 2]


def test_anticorrelated_worst_case_all_on_frontier(spark):
    rows = [(i, float(i), i) for i in range(50)]  # cheaper <-> lower score
    df = spark.createDataFrame(rows, "id long, cost double, score long").repartition(4)
    out = pareto_frontier(df, minimize=["cost"], maximize=["score"]).collect()
    assert len(out) == 50


def test_requires_a_dimension(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        pareto_frontier(df)
