"""Closed-form pins for matching/spectral/triplet/shape (H210-H213): a
hand-matched PSM pair, a pure period-2 alternation, orthogonal label
clusters, and the three-point kurtosis."""

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


def test_psm_att_hand_matched(spark):
    # controls (even ids): score 0 -> y 10; score 10 -> y 30.
    # treated (odd ids): score 2 -> y 20 (matched to 0, eff 10, dist 2);
    #                    score 9 -> y 50 (matched to 10, eff 20, dist 1).
    rows, eid = [], 0
    def add(uid, clicks, purchase):
        nonlocal eid
        for i in range(clicks):
            rows.append((eid, TS + datetime.timedelta(minutes=i), uid, "click", 1.0, "{}")); eid += 1
        rows.append((eid, TS, uid, "purchase", purchase, "{}")); eid += 1
    add(2, 0, 10.0); add(4, 10, 30.0); add(1, 2, 20.0); add(3, 9, 50.0)
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "events", rows, EV_SCHEMA)
        [r] = QUERIES["q_eval_psm_att"](spark, d).collect()
    assert (r["n_treated"], r["n_controls"]) == (2, 2)
    assert r["att"] == 15.0
    assert r["mean_match_dist"] == 1.5


def test_periodogram_pure_alternation(spark):
    # counts 1,3,1,3,... for 16 days: all energy at period 2, none at 4
    rows, eid = [], 0
    for day in range(16):
        t = TS + datetime.timedelta(days=day)
        for i in range(1 if day % 2 == 0 else 3):
            rows.append((eid, t + datetime.timedelta(minutes=i), 1, "view", 1.0, "{}")); eid += 1
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "events", rows, EV_SCHEMA)
        got = {r["period_days"]: r["power"]
               for r in QUERIES["q_events_periodogram"](spark, d).collect()}
    assert set(got) == set(range(2, 15))
    assert abs(got[2] - 1.0) < 1e-4
    assert got[4] < 1e-4


def test_triplet_margin_orthogonal_clusters(spark):
    # ids 0..33, label = id % 2; label-0 vectors [1,0], label-1 [0,1].
    # anchors 0 and 17; the half-rotation partner always flips label ->
    # margin = 1 - 0 = 1 for every kept triplet.
    emb = [(i, [1.0, 0.0] if i % 2 == 0 else [0.0, 1.0], i % 2)
           for i in range(34)]
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "embeddings", emb,
               "vec_id long, embedding array<float>, label int")
        got = {r["label"]: r for r in QUERIES["q_embed_triplet_margin"](spark, d).collect()}
    for lbl, r in got.items():
        assert r["mean_margin"] == 1.0
        assert r["n_violations"] == 0
    assert sum(r["n_triplets"] for r in got.values()) == 2


def test_skew_kurtosis_three_point(spark):
    # values 1,2,3 once each: skew 0; excess kurtosis = 1.5 - 3 = -1.5
    rows = [(i, TS, 1, "purchase", float(v), "{}") for i, v in enumerate([1, 2, 3])]
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "events", rows, EV_SCHEMA)
        [r] = QUERIES["q_events_skew_kurtosis"](spark, d).collect()
    assert r["n_events"] == 3
    assert r["mean_value"] == 2.0
    assert r["skewness"] == 0.0
    assert r["excess_kurtosis"] == -1.5
