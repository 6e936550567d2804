"""Engineered pins for the lead-lag/linkage batch (H178-H180): a planted
adjacent near-duplicate for sorted-neighborhood linkage, a 2-day-shifted
series for the cross-correlation peak, and a doubled-DOW periodic pattern
whose seasonal indices are exact rationals."""

import datetime
import os
import tempfile

from plenario_mapper_spark.plans.registry import QUERIES

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write(spark, d, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )


def test_sorted_neighborhood_adjacent_near_dup(spark):
    # sorted order: alpha, alphb, zzzzz -> offset-1 pairs (alpha,alphb) d=1
    # (match) and (alphb,zzzzz) d=5; offset-2 pair (alpha,zzzzz) d=5
    cust = [(1, "alpha", 0, 0.0, "S"), (2, "alphb", 0, 0.0, "S"),
            (3, "zzzzz", 0, 0.0, "S")]
    with tempfile.TemporaryDirectory() as d:
        _write(
            spark, d, "customer", cust,
            "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
            " c_mktsegment string",
        )
        got = {r["nbr_offset"]: r
               for r in QUERIES["q_link_sorted_neighborhood"](spark, d).collect()}
    assert got[1]["n_pairs"] == 2 and got[1]["n_matches"] == 1
    assert got[1]["min_dist"] == 1 and got[1]["dist_total"] == 6
    assert got[2]["n_pairs"] == 1 and got[2]["n_matches"] == 0
    assert 3 not in got  # only 3 records -> no offset-3 pair


def test_lagged_xcorr_peak_at_planted_shift(spark):
    # clicks follow 1,2,3 cycling; purchases = the same cycle shifted
    # 2 days later -> xcorr(lag=2) == 1.0 exactly
    rows, eid = [], 0
    base = datetime.datetime(2024, 1, 1)
    cycle = [1, 2, 3]
    for day in range(12):
        t = base + datetime.timedelta(days=day)
        for i in range(cycle[day % 3]):
            rows.append((eid, t + datetime.timedelta(minutes=i), 1, "click", 1.0, "{}")); eid += 1
        for i in range(cycle[(day - 2) % 3]):
            rows.append((eid, t + datetime.timedelta(minutes=30 + i), 1, "purchase", 1.0, "{}")); eid += 1
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "events", rows, EV_SCHEMA)
        got = {r["lag"]: r for r in QUERIES["q_events_lagged_xcorr"](spark, d).collect()}
    assert got[2]["xcorr"] == 1.0
    assert got[5]["xcorr"] == 1.0  # period 3: lag 5 = lag 2 again
    assert got[0]["xcorr"] < 0.0   # anti-phase at lag 0 for this cycle
    assert got[2]["n_days"] == 10


def test_seasonal_decomp_doubled_dow(spark):
    # weekly pattern 2,1,1,1,1,1,1 for 3 weeks: every centered 7-day sum
    # is 8, so ratios are exactly 14/8 on the doubled DOW and 7/8 elsewhere;
    # the weighted grand mean is NOT 1 (interior-day counts differ per dow)
    # but the doubled day's index must sit ~2x the others'
    rows, eid = [], 0
    base = datetime.datetime(2024, 1, 1)
    for day in range(21):
        t = base + datetime.timedelta(days=day)
        n = 2 if day % 7 == 0 else 1
        for i in range(n):
            rows.append((eid, t + datetime.timedelta(minutes=i), 1, "view", 1.0, "{}")); eid += 1
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "events", rows, EV_SCHEMA)
        got = {r["dow"]: r for r in QUERIES["q_events_seasonal_decomp"](spark, d).collect()}
    assert len(got) == 7
    # day 0 of the series is 2024-01-01, epoch day 19723; dow = (d+4)%7
    doubled_dow = (19723 + 4) % 7
    ratios = {k: v["mean_ratio"] for k, v in got.items()}
    assert ratios[doubled_dow] == 1.75  # 2*7/8
    for k, v in ratios.items():
        if k != doubled_dow:
            assert v == 0.875  # 1*7/8
    # index preserves the exact 2:1 seasonal contrast
    assert abs(got[doubled_dow]["seasonal_index"]
               / next(v["seasonal_index"] for k, v in got.items() if k != doubled_dow)
               - 2.0) < 1e-9
