"""Closed-form pins for concurrency / overlap-KS / ABC-XYZ (H217-H219):
a three-way overlap with a back-to-back non-overlap, disjoint score
supports (KS = 1), and a stable-vs-volatile demand contrast."""

import datetime
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


def test_peak_concurrency_three_way_overlap(spark):
    # windows at t, t+1min, t+2min overlap three deep at t+2..t+5;
    # a fourth window starting EXACTLY when the first ends (t+5) must not
    # push the peak to 4 (half-open tie pact: the -1 sorts first)
    rows = [
        (0, TS, 1, "view", 1.0, "{}"),
        (1, TS + datetime.timedelta(minutes=1), 2, "view", 1.0, "{}"),
        (2, TS + datetime.timedelta(minutes=2), 3, "view", 1.0, "{}"),
        (3, TS + datetime.timedelta(minutes=5), 4, "view", 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "events", rows, EV_SCHEMA)
        [r] = QUERIES["q_events_peak_concurrency"](spark, d).collect()
    assert r["n_sessions"] == 4
    assert r["peak_concurrency"] == 3
    want_us = int((TS + datetime.timedelta(minutes=2)
                   - datetime.datetime(1970, 1, 1)).total_seconds() * 1e6)
    assert r["peak_at_us"] == want_us


def test_overlap_ks_disjoint_supports(spark):
    # treated (odd ids) all score 10, controls (even) all score 0:
    # the ECDFs separate completely -> KS = 1 at the control support
    rows, eid = [], 0
    for uid in (1, 3, 2, 4):
        clicks = 10 if uid % 2 == 1 else 0
        rows.append((eid, TS, uid, "view", 1.0, "{}")); eid += 1
        for i in range(clicks):
            rows.append((eid, TS + datetime.timedelta(minutes=i + 1), uid, "click", 1.0, "{}")); eid += 1
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "events", rows, EV_SCHEMA)
        [r] = QUERIES["q_eval_overlap_ks"](spark, d).collect()
    assert (r["n_treated"], r["n_controls"]) == (2, 2)
    assert r["ks_statistic"] == 1.0
    assert r["ks_at_score"] == 0


def test_abc_xyz_stable_vs_volatile(spark):
    # part 1: qty 10 in each of 2 months (CV 0 -> X), revenue 160 -> A
    # part 2: qty 20 in month 1 only (CV 1 -> Z borderline: M*s2-s1^2 =
    #   2*400-400 = 400 = s1^2 -> NOT < -> Z), revenue 40 -> C... with
    #   only 2 parts the exclusive-cumulative rule makes part 2 a B.
    m1, m2 = datetime.datetime(2024, 1, 15), datetime.datetime(2024, 2, 15)
    rows = [
        (1, 1, 1, 1, 10.0, 80.0, 0.0, 0.0, "N", "O", m1),
        (2, 1, 1, 1, 10.0, 80.0, 0.0, 0.0, "N", "O", m2),
        (3, 2, 1, 1, 20.0, 40.0, 0.0, 0.0, "N", "O", m1),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "lineitem", rows, LI_SCHEMA)
        got = {(r["abc_class"], r["xyz_class"]): r
               for r in QUERIES["q_part_abc_xyz_matrix"](spark, d).collect()}
    assert got[("A", "X")]["n_parts"] == 1
    assert got[("A", "X")]["revenue_share"] == 0.8
    assert got[("B", "Z")]["n_parts"] == 1
    assert len(got) == 2
