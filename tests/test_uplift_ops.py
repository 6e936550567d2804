"""Pins for uplift/completeness/SRM (H207-H209): a perfectly persuadable
treated arm, a planted mid-series feed hole, and an engineered one-sided
assignment that must trip the SRM flag."""

import datetime
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


def test_qini_perfect_uplift(spark):
    # 4 users, equal scores: odd ids (treated) always convert, even ids
    # never -> final decile: qini = 2.0 incremental conversions,
    # uplift_rate = 1.0; empty-arm deciles yield NULL, not infinity
    rows, eid = [], 0
    for uid in (1, 2, 3, 4):
        rows.append((eid, TS, uid, "view", 1.0, "{}")); eid += 1
        if uid % 2 == 1:
            rows.append((eid, TS, uid, "purchase", 1.0, "{}")); eid += 1
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "events", rows, EV_SCHEMA)
        got = {r["decile"]: r for r in QUERIES["q_eval_qini_uplift"](spark, d).collect()}
    last = got[max(got)]
    assert (last["cum_treated"], last["cum_control"]) == (2, 2)
    assert (last["cum_treated_conv"], last["cum_control_conv"]) == (2, 0)
    assert last["qini"] == 2.0 and last["uplift_rate"] == 1.0
    # decile 1 holds only user 1 (treated): control-free -> NULLs
    assert got[1]["qini"] is None and got[1]["uplift_rate"] is None


def test_delivery_gaps_planted_hole(spark):
    # type A on days 0,1,5,6 -> span 7, missing 3, longest gap 3;
    # type B daily 0..6 -> complete
    rows, eid = [], 0
    for day in (0, 1, 5, 6):
        rows.append((eid, TS + datetime.timedelta(days=day), 1, "A", 1.0, "{}")); eid += 1
    for day in range(7):
        rows.append((eid, TS + datetime.timedelta(days=day), 1, "B", 1.0, "{}")); eid += 1
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "events", rows, EV_SCHEMA)
        got = {r["event_type"]: r for r in QUERIES["q_quality_delivery_gaps"](spark, d).collect()}
    a, b = got["A"], got["B"]
    assert (a["active_days"], a["span_days"], a["missing_days"], a["longest_gap_days"]) == (4, 7, 3, 3)
    assert (b["missing_days"], b["longest_gap_days"], b["completeness"]) == (0, 0, 1.0)


def test_srm_flag_trips_on_one_sided_assignment(spark):
    # 10 users, ALL even ids -> n1 = 0, chi2 = N = 10 > 3.84 -> flag
    rows = [(i, TS, 2 * i, "view", 1.0, "{}") for i in range(10)]
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "events", rows, EV_SCHEMA)
        [r] = QUERIES["q_eval_srm_check"](spark, d).collect()
    assert (r["n_users"], r["n_control"], r["n_treated"]) == (10, 10, 0)
    assert r["chi2"] == 10.0
    assert r["srm_flag"] == 1


def test_srm_quiet_on_balanced_assignment(spark):
    rows = [(i, TS, i, "view", 1.0, "{}") for i in range(10)]  # 5/5 split
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "events", rows, EV_SCHEMA)
        [r] = QUERIES["q_eval_srm_check"](spark, d).collect()
    assert r["chi2"] == 0.0 and r["srm_flag"] == 0
