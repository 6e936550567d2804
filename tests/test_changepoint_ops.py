"""Closed-form pins for Pettitt / weighted quantiles / k-core (H214-H216):
a planted level shift with hand-computed K, a weight-mass median at a tie
boundary, and a K4-plus-pendant core."""

import datetime
import math
import os
import tempfile

from plenario_mapper_spark.plans.registry import QUERIES

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
    " l_quantity double, l_extendedprice double, l_discount double,"
    " l_tax double, l_returnflag string, l_linestatus string,"
    " l_shipdate timestamp"
)
TS = datetime.datetime(2024, 1, 1)


def _write(spark, d, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )


def test_pettitt_planted_level_shift(spark):
    # counts: 10 days of 1 then 10 days of 5 -> changepoint at day 9,
    # K = 100 (each pre-shift term contributes -10), p = 2 exp(-6e4/8400)
    rows, eid = [], 0
    for day in range(20):
        t = TS + datetime.timedelta(days=day)
        for i in range(1 if day < 10 else 5):
            rows.append((eid, t + datetime.timedelta(minutes=i), 1, "view", 1.0, "{}")); eid += 1
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "events", rows, EV_SCHEMA)
        [r] = QUERIES["q_events_pettitt_changepoint"](spark, d).collect()
    base_day = (TS - datetime.datetime(1970, 1, 1)).days
    assert r["n_days"] == 20
    assert r["changepoint_day"] == base_day + 9
    assert r["k_statistic"] == 100
    want_p = 2 * math.exp(-6.0 * 100 * 100 / (20.0**3 + 20.0**2))
    assert r["p_approx"] == math.floor(want_p * 1e6 + 0.5) / 1e6


def test_weighted_quantiles_mass_not_rows(spark):
    # values 1 (w=10) and 2 (w=10): the weighted median sits at 1
    # (cumw 10 reaches exactly half the mass); value 3 with w=18 after
    # two w=1 rows pulls even the 25th percentile to 3
    rows = [
        (1, 1, 1, 1, 10.0, 1.0, 0.0, 0.0, "A", "O", TS),
        (2, 1, 1, 1, 10.0, 2.0, 0.0, 0.0, "A", "O", TS),
        (3, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "B", "O", TS),
        (4, 1, 1, 1, 1.0, 2.0, 0.0, 0.0, "B", "O", TS),
        (5, 1, 1, 1, 18.0, 3.0, 0.0, 0.0, "B", "O", TS),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "lineitem", rows, LI_SCHEMA)
        got = {(r["returnflag"], r["percentile"]): r["value"]
               for r in QUERIES["q_agg_weighted_quantiles"](spark, d).collect()}
    assert got[("A", 50)] == 1.0   # exact half-mass boundary -> lower value
    assert got[("A", 75)] == 2.0
    assert got[("B", 25)] == 3.0   # 18/20 of the mass sits at 3
    assert got[("B", 95)] == 3.0


def test_kcore_k4_plus_pendant(spark):
    # order 1 = parts {1,2,3,4} (K4), order 2 = {1,5} (pendant):
    # the 3-core drops part 5 and keeps K4 intact
    rows = [(1, pk, 1, i, 1.0, 1.0, 0.0, 0.0, "N", "O", TS)
            for i, pk in enumerate([1, 2, 3, 4], start=1)]
    rows += [(2, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", TS),
             (2, 5, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", TS)]
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "lineitem", rows, LI_SCHEMA)
        [r] = QUERIES["q_graph_kcore_peel"](spark, d).collect()
    assert (r["n_nodes"], r["core_size"]) == (5, 4)
    assert (r["core_edges"], r["core_min_degree"]) == (6, 3)
