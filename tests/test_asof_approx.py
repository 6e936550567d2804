"""As-of join semantics (tolerance, ties, unmatched rows) and the HLL
approx-distinct error bound — the parts the DuckDB oracle can't pin."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from plenario_mapper_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T00:00:00"), 100.0),
            ("a", _ts("2024-01-01T00:00:10"), 101.0),
            ("a", _ts("2024-01-01T00:01:00"), 102.0),
            ("b", _ts("2024-01-01T00:00:05"), 50.0),
        ],
        "sym string, qts timestamp, quote double",
    )
    trades = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T00:00:10"), 1),  # tie: matches the 00:00:10 quote
            ("a", _ts("2024-01-01T00:00:30"), 2),  # between quotes -> 101.0
            ("a", _ts("2024-01-01T00:02:00"), 3),  # after last -> 102.0
            ("b", _ts("2024-01-01T00:00:01"), 4),  # before any quote -> NULL
            ("c", _ts("2024-01-01T00:00:01"), 5),  # key with no quotes -> NULL
        ],
        "sym string, tts timestamp, trade_id int",
    )
    return quotes, trades


def test_asof_backward_inclusive(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, by=["sym"], left_ts="tts", right_ts="qts",
        right_cols=["quote", "qts"],
    )
    got = {r["trade_id"]: (r["quote"], r["qts"]) for r in out.collect()}
    assert got[1] == (101.0, _ts("2024-01-01T00:00:10"))  # inclusive tie
    assert got[2] == (101.0, _ts("2024-01-01T00:00:10"))
    assert got[3] == (102.0, _ts("2024-01-01T00:01:00"))
    assert got[4] == (None, None)
    assert got[5] == (None, None)
    assert out.count() == 5  # every left row survives (left join)


def test_asof_tolerance(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, by=["sym"], left_ts="tts", right_ts="qts",
        right_cols=["quote"], tolerance_seconds=30,
    )
    got = {r["trade_id"]: r["quote"] for r in out.collect()}
    assert got[1] == 101.0   # 0s old
    assert got[2] == 101.0   # 20s old
    assert got[3] is None    # 60s old > 30s tolerance
    assert got[4] is None


def test_asof_name_collision_suffix(spark, quotes_trades):
    quotes, trades = quotes_trades
    q2 = quotes.withColumnRenamed("quote", "trade_id")  # force a collision
    out = asof_join(
        trades, q2, by=["sym"], left_ts="tts", right_ts="qts",
        right_cols=["trade_id"],
    )
    assert "trade_id_right" in out.columns and "trade_id" in out.columns


def test_approx_count_distinct_bound(spark):
    sf = "/root/testdata/sf0.001"
    o = spark.read.parquet(f"{sf}/orders.parquet")
    rows = (
        o.groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", 0.02).alias("approx"),
            F.countDistinct("o_custkey").alias("exact"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(5, 0.06 * r["exact"]), (
            r["o_orderpriority"], r["approx"], r["exact"],
        )


def test_approx_percentile_rank_error_bound(spark):
    """Greenwald-Khanna with accuracy A guarantees the estimate's RANK is within
    n/A of the target rank. Check the 0.5/0.95 estimates against the exact
    value distribution per group."""
    sf = "/root/testdata/sf0.001"
    import __spark_entry__ as E

    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    ap = F.percentile_approx(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)), F.lit(1000)
    )
    got = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(ap[0].alias("p50_approx"), ap[1].alias("p95_approx"))
        .collect()
    }
    for flag, row in got.items():
        vals = sorted(
            r["l_extendedprice"]
            for r in li.filter(F.col("l_returnflag") == flag).collect()
        )
        n = len(vals)
        for q, est in ((0.5, row["p50_approx"]), (0.95, row["p95_approx"])):
            import bisect

            lo = bisect.bisect_left(vals, est)
            hi = bisect.bisect_right(vals, est)
            target = q * n
            slack = n / 1000 + 1
            assert lo - slack <= target <= hi + slack, (flag, q, est, lo, hi, n)
    # the registry query certifies the same contract in its driver-checkable
    # output (in-band bits must all be 1)
    cert = E.queries()["q_agg_approx_percentile"](spark, sf).collect()
    assert cert and all(r["p50_rank_ok"] == 1 and r["p95_rank_ok"] == 1 for r in cert)
