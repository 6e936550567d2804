"""Closed-form pins for hubness and price indices (H220-H221): a planted
hub vector every sample point ranks first, and a uniform 10% price rise
with an unchanged basket."""

import datetime
import os
import tempfile

from plenario_mapper_spark.plans.registry import QUERIES

LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
    " l_quantity double, l_extendedprice double, l_discount double,"
    " l_tax double, l_returnflag string, l_linestatus string,"
    " l_shipdate timestamp"
)


def _write(spark, d, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )


def test_hubness_planted_hub(spark):
    # sampled ids (multiples of 50): a central vector at the positive
    # diagonal and six spread around it; the centre is everyone's top
    # neighbour, so k_max is maximal (it appears in all 6 other top-5s)
    import math
    emb = []
    # hub at 45 degrees
    emb.append((0, [1.0, 1.0], 0))
    for i, ang in enumerate([0.1, 0.35, 0.6, 0.95, 1.2, 1.45], start=1):
        emb.append((50 * i, [math.cos(ang), math.sin(ang)], 0))
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "embeddings", emb,
               "vec_id long, embedding array<float>, label int")
        [r] = QUERIES["q_embed_hubness_audit"](spark, d).collect()
    assert r["n_sampled"] == 7
    assert r["k_max"] == 6
    assert r["top_hub_id"] == 0
    assert r["k_occurrence_skew"] is not None


def test_price_indices_uniform_rise(spark):
    # same basket both halves (q=10 each of two parts), prices x1.1 in
    # half 2: L = P = F = 1.1 exactly
    m1, m2 = datetime.datetime(2024, 1, 10), datetime.datetime(2024, 3, 10)
    rows = [
        (1, 1, 1, 1, 10.0, 100.0, 0.0, 0.0, "N", "O", m1),
        (2, 2, 1, 1, 10.0, 50.0, 0.0, 0.0, "N", "O", m1),
        (3, 1, 1, 1, 10.0, 110.0, 0.0, 0.0, "N", "O", m2),
        (4, 2, 1, 1, 10.0, 55.0, 0.0, 0.0, "N", "O", m2),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "lineitem", rows, LI_SCHEMA)
        [r] = QUERIES["q_part_price_indices"](spark, d).collect()
    assert r["n_parts_in_both"] == 2
    assert r["laspeyres"] == 1.1
    assert r["paasche"] == 1.1
    assert r["fisher"] == 1.1
