"""Pins for the smoothing/entropy/mode/MRR batch (H193-H196): a pure
7-periodic series Holt-Winters must fit exactly, closed-form byte entropy on
engineered strings, mode tie pacts, and first-hit reciprocal ranks."""

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


def test_holt_winters_fits_pure_periodic(spark):
    # weekly pattern [8,1,1,1,1,1,1] repeated 4x: after init l=2, b=0,
    # s=[6,-1,...]; every subsequent residual is 0, so the state never
    # moves and forecast_k = l + s[k] reproduces the pattern exactly
    pat = [8, 1, 1, 1, 1, 1, 1]
    rows, eid = [], 0
    for day in range(28):
        t = TS + datetime.timedelta(days=day)
        for i in range(pat[day % 7]):
            rows.append((eid, t + datetime.timedelta(minutes=i), 1, "view", 1.0, "{}")); eid += 1
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "events", rows, EV_SCHEMA)
        got = {r["step_ahead"]: r
               for r in QUERIES["q_events_holt_winters"](spark, d).collect()}
    assert len(got) == 7
    for k in range(1, 8):
        r = got[k]
        assert r["level"] == 2.0 and r["trend"] == 0.0
        want_seasonal = 6.0 if (k % 7) == 1 else -1.0
        assert r["seasonal"] == want_seasonal
        assert r["forecast"] == 2.0 + want_seasonal


def test_holt_winters_drops_short_series(spark):
    rows = [(i, TS + datetime.timedelta(days=i), 1, "view", 1.0, "{}")
            for i in range(5)]  # < one season
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "events", rows, EV_SCHEMA)
        assert QUERIES["q_events_holt_winters"](spark, d).count() == 0


def test_byte_entropy_closed_forms(spark):
    # 'aaaa' -> 0 bits (low-entropy); 'abab' -> 1 bit; 'abcd' -> 2 bits
    docs = [(0, "aaaa", "en", "S0", 4), (1, "abab", "en", "S1", 4),
            (2, "abcd", "en", "S2", 4)]
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "documents", docs,
               "doc_id long, text string, lang string, source string, n_chars long")
        got = {r["source"]: r for r in QUERIES["q_doc_byte_entropy"](spark, d).collect()}
    assert got["S0"]["mean_entropy_bits"] == 0.0
    assert got["S0"]["n_low_entropy"] == 1
    assert got["S1"]["mean_entropy_bits"] == 1.0
    assert got["S1"]["n_low_entropy"] == 1  # 1 bit < 3-bit threshold
    assert got["S2"]["mean_entropy_bits"] == 2.0


def test_mode_tie_pact(spark):
    # group 'A': qty 1 x2, qty 2 x2 (tied) -> mode = 1 (value asc pact),
    # antimode among {1:2, 2:2, 3:3} -> count-asc tie to value 1
    rows = [(i, 1, 1, 1, float(q), 1.0, 0.0, 0.0, "A", "O", TS)
            for i, q in enumerate([1, 1, 2, 2, 3, 3, 3])]
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "lineitem", rows, LI_SCHEMA)
        [r] = QUERIES["q_agg_mode_exact"](spark, d).collect()
    assert (r["mode_qty"], r["mode_count"]) == (3, 3)
    assert (r["antimode_qty"], r["antimode_count"]) == (1, 2)
    assert r["mode_share"] == math.floor(3 / 7 * 1e6 + 0.5) / 1e6


def test_mrr_first_hit_positions(spark):
    # source A: relevant doc ranks 2nd by length -> RR = 0.5, hit@1 = 0;
    # source B: no relevant docs -> RR = 0 explicit row
    docs = [(0, "t", "xx", "A", 30), (1, "t", "en", "A", 20),
            (2, "t", "xx", "B", 10)]
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "documents", docs,
               "doc_id long, text string, lang string, source string, n_chars long")
        got = {r["source"]: r for r in QUERIES["q_eval_mrr"](spark, d).collect()}
    a, b = got["A"], got["B"]
    assert (a["first_relevant_rank"], a["reciprocal_rank"], a["hit_at_1"], a["hit_at_10"]) == (2, 0.5, 0, 1)
    # NULL first_pos falls through the <= comparisons to the 0 branch
    assert (b["first_relevant_rank"], b["reciprocal_rank"], b["hit_at_1"], b["hit_at_10"]) == (None, 0.0, 0, 0)
