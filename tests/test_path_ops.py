"""Closed-form pins for the path-property batch (H204-H206): overlapping
and disjoint activity windows with exact union lengths, a planted
peak-to-trough slide, and a noiseless AR(1) recursion."""

import datetime
import math
import os
import tempfile

from plenario_mapper_spark.plans.registry import QUERIES

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
TS = datetime.datetime(2024, 1, 1)


def _write(spark, d, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )


def test_active_coverage_merges_overlaps(spark):
    # user 1: events at t, t+2min (overlap -> one 7-min island) and
    # t+60min (second island, 5 min): covered = 12 min exactly.
    # user 2: one event -> 5 min.
    rows = [
        (0, TS, 1, "view", 1.0, "{}"),
        (1, TS + datetime.timedelta(minutes=2), 1, "view", 1.0, "{}"),
        (2, TS + datetime.timedelta(minutes=60), 1, "view", 1.0, "{}"),
        (3, TS, 2, "view", 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "events", rows, EV_SCHEMA)
        [r] = QUERIES["q_events_active_coverage"](spark, d).collect()
    assert (r["n_users"], r["n_islands"]) == (2, 3)
    assert r["covered_us_total"] == (12 + 5) * 60 * 1_000_000
    assert r["covered_us_max"] == 12 * 60 * 1_000_000
    assert r["mean_covered_sec"] == (17 * 60) / 2


def test_max_drawdown_planted_slide(spark):
    # daily net: +10, +5, -12, -2, +1  -> cum: 10,15,3,1,2
    # peak 15 at day 1; trough 1 at day 3; max drawdown 14
    vals = [(0, "purchase", 10.0), (1, "purchase", 5.0), (2, "error", 12.0),
            (3, "error", 2.0), (4, "purchase", 1.0)]
    rows = [(i, TS + datetime.timedelta(days=day), 1, et, v, "{}")
            for i, (day, et, v) in enumerate(vals)]
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "events", rows, EV_SCHEMA)
        [r] = QUERIES["q_events_max_drawdown"](spark, d).collect()
    assert r["n_days"] == 5
    assert r["max_drawdown"] == 14.0
    assert r["peak_value"] == 15.0 and r["trough_value"] == 1.0
    base_day = (TS - datetime.datetime(1970, 1, 1)).days
    assert r["trough_day"] == base_day + 3


def test_ar1_noiseless_recursion(spark):
    # y_{t+1} = 0.5*y_t + 2 exactly: 12,8,6,5 -> rho=0.5, intercept=2,
    # half-life = ln2/ln2 = 1 day
    counts = [12, 8, 6, 5]
    rows, eid = [], 0
    for day, c in enumerate(counts):
        t = TS + datetime.timedelta(days=day)
        for i in range(c):
            rows.append((eid, t + datetime.timedelta(minutes=i), 1, "view", 1.0, "{}")); eid += 1
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "events", rows, EV_SCHEMA)
        [r] = QUERIES["q_events_ar1_meanreversion"](spark, d).collect()
    assert r["n_pairs"] == 3
    assert r["rho"] == 0.5
    assert r["intercept"] == 2.0
    assert r["half_life_days"] == 1.0
