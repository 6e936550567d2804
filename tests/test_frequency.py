"""Misra-Gries heavy hitters (operators/frequency): the sketch's guarantees are
exercised where the registry query cannot — vocab >> k, so merges actually
decrement. All guarantees are theorems for ANY input; these tests check them on
a synthetic Zipfian corpus (the regime the 31-token test corpus never enters)
and pin partition-count insensitivity."""

from __future__ import annotations

import collections

import numpy as np
import pytest
from pyspark.sql import functions as F

from plenario_mapper_spark.operators import frequency as FQ


def _zipf_corpus(n=20_000, vocab=500, seed=7):
    rng = np.random.default_rng(seed)
    # Zipf-ish: item i with weight 1/(i+1)
    w = 1.0 / np.arange(1, vocab + 1)
    items = rng.choice(vocab, size=n, p=w / w.sum())
    return [f"tok{int(i):04d}" for i in items]


def test_mg_merge_prune_rule():
    c = {"a": 5, "b": 3, "c": 1}
    sub = FQ.mg_merge(c, {"d": 2}, k=2)
    # (k+1)-th largest of {5,3,2,1} is 2: subtract 2, drop non-positives
    assert sub == 2
    assert c == {"a": 3, "b": 1}


def test_mg_merge_no_prune_under_k():
    c = {}
    assert FQ.mg_merge(c, {"a": 4, "b": 1}, k=8) == 0
    assert c == {"a": 4, "b": 1}


@pytest.mark.parametrize("k,parts", [(32, 1), (32, 7), (64, 13)])
def test_guarantees_on_zipf_corpus(spark, k, parts):
    corpus = _zipf_corpus()
    true = collections.Counter(corpus)
    n = len(corpus)
    df = spark.createDataFrame([(t,) for t in corpus], "tok string").repartition(parts)
    cands, decs = FQ.merge_summaries(FQ.misra_gries(df, "tok", k=k))
    est = {r["item"]: r["est"] for r in cands.collect()}
    total_dec = decs.collect()[0]["total_dec"]
    # decrements actually happened in this regime (vocab >> k)
    assert total_dec > 0
    # (3) deduction mass bound
    assert total_dec <= n // (k + 1)
    # (1) never overcounts; (2) undercount bounded by deductions
    for item, e in est.items():
        assert e <= true[item]
        assert true[item] - e <= total_dec
    # capture: every item with true > total_dec must be present
    for item, t in true.items():
        if t > total_dec:
            assert item in est and est[item] > 0


def test_registry_query_bits_all_certified(spark):
    from plenario_mapper_spark.plans import QUERIES

    out = QUERIES["q_doc_heavy_hitters"](spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    for r in out:
        assert r["captured"] == 1 and r["est_le_exact"] == 1 and r["est_in_band"] == 1
        # phi-heavy by construction
        assert r["exact_cnt"] * 200 > r["n_total"]


def test_nulls_ignored(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",), ("b",)], "tok string")
    cands, decs = FQ.merge_summaries(FQ.misra_gries(df, "tok", k=4))
    est = {r["item"]: r["est"] for r in cands.collect()}
    assert est == {"a": 2, "b": 1}
    assert decs.collect()[0]["total_dec"] == 0


def test_candidate_table_bounded_by_k_times_partitions(spark):
    corpus = _zipf_corpus(n=5_000, vocab=300)
    df = spark.createDataFrame([(t,) for t in corpus], "tok string").repartition(5)
    summary = FQ.misra_gries(df, "tok", k=16).collect()
    per_part = [r for r in summary if r["item"] is not None]
    assert len(per_part) <= 16 * 5
