"""Interval-overlap join: brute-force parity, exactly-once emission, plan shape."""

import datetime as dt
import random

import pyspark.sql.functions as F

from plenario_mapper_spark.operators import intervals as IV
from plenario_mapper_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"
T0 = dt.datetime(2024, 1, 1)


def _plan(df) -> str:
    from tests.conftest import final_plan

    return final_plan(df)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "iid long, s timestamp, e timestamp")


def _brute(rows):
    out = set()
    for ia, sa, ea in rows:
        for ib, sb, eb in rows:
            if ia < ib and sa <= eb and sb <= ea:
                ov = int(
                    (min(ea, eb) - max(sa, sb)).total_seconds() * 1_000_000
                )
                out.add((ia, ib, ov))
    return out


def _got(df):
    return {(r.iid_a, r.iid_b, r.overlap_us) for r in df.collect()}


def test_overlap_matches_brute_force_random(spark):
    rng = random.Random(7)
    rows = []
    for i in range(120):
        start = T0 + dt.timedelta(seconds=rng.randrange(0, 4 * 86400))
        dur = dt.timedelta(seconds=rng.randrange(0, 8 * 3600))
        rows.append((i, start, start + dur))
    got = _got(IV.interval_overlap_self_join(_mk(spark, rows), "iid", "s", "e"))
    assert got == _brute(rows)
    assert len(got) > 50  # non-vacuous


def test_edge_cases_touching_contained_long(spark):
    h = dt.timedelta(hours=1)
    rows = [
        (0, T0, T0 + 2 * h),            # base
        (1, T0 + 2 * h, T0 + 3 * h),    # touches base endpoint: overlap_us == 0
        (2, T0 + 3 * h + dt.timedelta(microseconds=1), T0 + 4 * h),  # disjoint from 1
        (3, T0, T0 + 70 * h),           # long interval spanning 70 buckets
        (4, T0 + 10 * h, T0 + 10 * h),  # zero-length, inside 3 only
    ]
    got = _got(IV.interval_overlap_self_join(_mk(spark, rows), "iid", "s", "e"))
    assert got == _brute(rows)
    assert (0, 1, 0) in got           # inclusive endpoints, exact zero
    assert not any(a == 1 and b == 2 for a, b, _ in got)
    assert (3, 4, 0) in got           # containment of a point, far from either end


def test_exactly_once_no_distinct_needed(spark):
    """Two long co-extensive intervals share ~50 buckets; the max-start-bucket
    ownership rule must still emit the pair once."""
    rows = [(0, T0, T0 + dt.timedelta(hours=50)), (1, T0, T0 + dt.timedelta(hours=50))]
    df = IV.interval_overlap_self_join(_mk(spark, rows), "iid", "s", "e")
    assert df.count() == 1


def test_block_cols_partition_the_join(spark):
    rows = [
        (0, "x", T0, T0 + dt.timedelta(hours=2)),
        (1, "y", T0, T0 + dt.timedelta(hours=2)),
        (2, "x", T0 + dt.timedelta(hours=1), T0 + dt.timedelta(hours=3)),
    ]
    df = spark.createDataFrame(rows, "iid long, grp string, s timestamp, e timestamp")
    got = _got(
        IV.interval_overlap_self_join(df, "iid", "s", "e", block_cols=["grp"])
    )
    assert {(a, b) for a, b, _ in got} == {(0, 2)}


def test_overlap_query_never_cartesian(spark):
    plan = _plan(QUERIES["q_join_interval_overlap"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_group_reservoir_exact_k_and_deterministic(spark):
    from plenario_mapper_spark.operators import sampling as SP
    from plenario_mapper_spark.plans.relational import _t

    d = _t(spark, SF, "documents").select("doc_id", "source")
    s1 = SP.deterministic_group_sample(d, "doc_id", "source", k=3)
    sizes = {r.source: r.n for r in s1.groupBy("source").agg(F.count("*").alias("n")).collect()}
    caps = {r.source: r.n for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert sizes == {g: min(3, n) for g, n in caps.items()}
    # repartitioning must not change the selected set
    s2 = SP.deterministic_group_sample(d.repartition(13), "doc_id", "source", k=3)
    assert {tuple(r) for r in s1.collect()} == {tuple(r) for r in s2.collect()}


def test_max_buckets_routes_overflow_losslessly(spark):
    """One corrupted far-future end (span ~ 10 years of hourly buckets) must
    not explode; with max_buckets the result still equals brute force and the
    sequence fan-out is capped. Mixed long-long / long-normal / normal-normal
    pairs exercise every exactly-once branch."""
    h = dt.timedelta(hours=1)
    rows = [
        (0, T0, T0 + 2 * h),
        (1, T0 + 1 * h, T0 + 3 * h),
        (2, T0 + 30 * h, T0 + 31 * h),
        (3, T0, T0 + dt.timedelta(days=3650)),   # corrupted far-future end
        (4, T0 + 5 * h, T0 + dt.timedelta(days=3000)),  # second long row
        (5, T0 + dt.timedelta(days=4000), T0 + dt.timedelta(days=4001)),  # disjoint
    ]
    got = _got(
        IV.interval_overlap_self_join(
            _mk(spark, rows), "iid", "s", "e", max_buckets=48
        )
    )
    assert got == _brute(rows)


def test_max_buckets_equivalent_on_normal_data(spark):
    rng = random.Random(11)
    rows = []
    for i in range(80):
        start = T0 + dt.timedelta(seconds=rng.randrange(0, 2 * 86400))
        dur = dt.timedelta(seconds=rng.randrange(0, 30 * 3600))
        rows.append((i, start, start + dur))
    base = _got(IV.interval_overlap_self_join(_mk(spark, rows), "iid", "s", "e"))
    capped = _got(
        IV.interval_overlap_self_join(_mk(spark, rows), "iid", "s", "e", max_buckets=12)
    )
    assert capped == base == _brute(rows)


def test_bucket_bounds_floor_for_negative_epochs(spark):
    """Pre-1970 timestamps have negative epoch micros; bucketing must FLOOR
    (DuckDB `//` semantics), not truncate toward zero, or two intervals in
    the same pre-1970 hour land in different buckets."""
    df = spark.createDataFrame(
        [(dt.datetime(1969, 12, 31, 23, 30),), (dt.datetime(1970, 1, 1, 0, 30),)],
        "t timestamp",
    )
    b = IV._with_bucket_bounds(df, "t", "t", 3_600_000_000)
    got = sorted(r._b_start for r in b.collect())
    assert got == [-1, 0], got
