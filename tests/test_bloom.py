"""Bloom-filter semi-join pre-filter (operators/bloom).

Property coverage: the no-false-negative theorem, the false-positive budget at
the 16-bits/key sizing, determinism across partitionings (the filter is a pure
function of the key SET), and the scale-critical plan shape — the probe is a
scan-stage filter with no shuffle and no join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from plenario_mapper_spark.operators import bloom as BL
from tests.conftest import final_plan


@pytest.fixture(scope="module")
def key_sets(spark):
    """10k-key universe; every third key is a member."""
    universe = spark.range(10_000).select(F.col("id").alias("key"))
    members = universe.filter(F.col("key") % 3 == 0)
    return universe, members


def test_sized_bits_regime():
    # ~16 bits/key, power-of-two, clamped
    assert BL.sized_bits(0) == 1 << 13
    assert BL.sized_bits(1_000) == 1 << 14
    assert BL.sized_bits(3_000) == 1 << 16
    assert BL.sized_bits(10**9) == 1 << 22  # cap
    m = BL.sized_bits(2_978)  # the q_join_bloom_prefilter sf0.01 key count
    assert m / 2_978 >= 16


def test_non_power_of_two_width_is_hard_error(spark):
    """ADVICE r9: the power-of-two guard must survive `python -O` (a bare
    assert is stripped) and must reject m_bits=1 (h2's modulus would be 0)."""
    import pytest

    for bad in (0, 1, 3, 48, 1 << 20 | 1):
        with pytest.raises(ValueError, match="power of two"):
            BL._positions(F.lit("k"), bad, 4)
    BL._positions(F.lit("k"), 2, 4)  # smallest legal width still works


def test_no_false_negatives(spark, key_sets):
    universe, members = key_sets
    m = BL.sized_bits(members.count())
    words = BL.build_bloom(members, "key", m)
    missed = (
        members.filter(~BL.might_contain(F.col("key"), words, m)).count()
    )
    assert missed == 0  # theorem, not luck


def test_false_positive_rate_within_budget(spark, key_sets):
    universe, members = key_sets
    n = members.count()
    m = BL.sized_bits(n)
    words = BL.build_bloom(members, "key", m)
    non_members = universe.filter(F.col("key") % 3 != 0)
    fp = non_members.filter(BL.might_contain(F.col("key"), words, m)).count()
    # theoretical (1-e^(-kn/m))^k ~ 1.4e-3 at 16 bits/key; budget 1% = 7x slack
    assert fp / non_members.count() <= 0.01


def test_filter_is_partitioning_invariant(spark, key_sets):
    """Same key set, different partitioning -> bit-identical filter and
    survivor set (a cluster resize must not change which rows pass)."""
    _, members = key_sets
    m = 1 << 14
    w1 = BL.build_bloom(members.repartition(1), "key", m)
    w8 = BL.build_bloom(members.repartition(8, "key"), "key", m)
    assert w1 == w8


def test_null_probe_is_null_like_join_semantics(spark, key_sets):
    _, members = key_sets
    m = 1 << 14
    words = BL.build_bloom(members, "key", m)
    row = (
        spark.createDataFrame([(None,)], "key long")
        .select(BL.might_contain(F.col("key"), words, m).alias("p"))
        .collect()[0]
    )
    assert row["p"] is None  # NULL never matches an equi-join either


def test_bloom_prefilter_supersets_exact_join(spark, key_sets):
    universe, members = key_sets
    survivors = BL.bloom_prefilter(universe, "key", members, "key")
    exact = {r["key"] for r in universe.join(members, "key", "left_semi").collect()}
    got = {r["key"] for r in survivors.collect()}
    assert exact <= got  # never drops a true match
    assert len(got - exact) <= 0.01 * (universe.count() - len(exact))


def test_probe_is_scan_stage_no_shuffle_no_join(spark, key_sets):
    """The production path's plan: the probe must be a plain Filter over the
    scan — no Exchange, no join operator. This is the point of the operator;
    a probe that shuffles is just a worse join."""
    _, members = key_sets
    m = 1 << 14
    words = BL.build_bloom(members, "key", m)
    probe = spark.range(100_000).select(F.col("id").alias("key")).filter(
        BL.might_contain(F.col("key"), words, m)
    )
    probe.count()
    plan = final_plan(probe)
    assert "Exchange" not in plan
    for join_op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert join_op not in plan
