"""Pins for conformal/assortativity/Brier (H197-H199): a constant
per-DOW series whose conformal band is zero-width with full coverage, a
star graph with closed-form negative assortativity, and a Brier
decomposition on a hand-enumerable score."""

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


def test_conformal_constant_series_zero_band(spark):
    # a perfectly DOW-determined series: y = dow+1 every week for 8 weeks.
    # The DOW-mean predictor is exact on both halves -> q_hat = 0 and
    # coverage = 1.0 regardless of how the md5 gate splits the days.
    rows, eid = [], 0
    for day in range(56):
        t = TS + datetime.timedelta(days=day)
        for i in range((day % 7) + 1):
            rows.append((eid, t + datetime.timedelta(minutes=i), 1, "view", 1.0, "{}")); eid += 1
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "events", rows, EV_SCHEMA)
        [r] = QUERIES["q_eval_conformal_interval"](spark, d).collect()
    assert r["n_cal"] + r["n_eval"] == 56
    assert r["q_hat"] == 0.0
    assert r["coverage"] == 1.0


def test_assortativity_star_is_negative(spark):
    # star: hub part 1 co-purchased with leaves 2..5 (4 separate orders).
    # Every edge joins deg 4 to deg 1 -> endpoint degree pairs are
    # (4,1) x4 and (1,4) x4; r = -1 exactly (two-point symmetric cloud).
    rows = []
    for i, leaf in enumerate([2, 3, 4, 5], start=1):
        rows.append((i, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", TS))
        rows.append((i, leaf, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", TS))
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "lineitem", rows, LI_SCHEMA)
        [r] = QUERIES["q_graph_assortativity"](spark, d).collect()
    assert r["n_endpoints"] == 8
    assert r["assortativity"] == -1.0


def test_brier_decomposition_identity_and_bounds(spark):
    # on the registry's synthetic score the Murphy identity holds to grid
    # precision: brier ~= reliability - resolution + uncertainty
    emb = [(i, [float(i)], i % 3) for i in range(60)]
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "embeddings", emb,
               "vec_id long, embedding array<float>, label int")
        [r] = QUERIES["q_eval_brier_decomposition"](spark, d).collect()
    assert r["n_scored"] == 60
    assert 0.0 <= r["brier"] <= 1.0
    assert r["reliability"] >= 0.0 and r["resolution"] >= 0.0
    assert 0.0 <= r["uncertainty"] <= 0.25
    lhs = r["brier"]
    rhs = r["reliability"] - r["resolution"] + r["uncertainty"]
    assert abs(lhs - rhs) < 2e-5  # grid-rounding slack across ~12 snapped terms
