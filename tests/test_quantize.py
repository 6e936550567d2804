"""Quantization invariants: error bound, constant vectors, code range, no shuffle."""

import pyspark.sql.functions as F

from plenario_mapper_spark.operators.quantize import quantize_embeddings
from plenario_mapper_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def test_error_bounded_by_half_step_and_codes_in_range(spark):
    from plenario_mapper_spark.plans.relational import _t

    e = _t(spark, SF, "embeddings")
    q = quantize_embeddings(e)
    bad = q.filter(
        (F.col("max_abs_err") > F.col("scale") / 2 + 1e-12)
        | (F.array_min("q") < 0)
        | (F.array_max("q") > 255)
    )
    assert bad.count() == 0
    assert q.count() > 0


def test_constant_vector_is_exact(spark):
    df = spark.createDataFrame(
        [(1, [2.5, 2.5, 2.5]), (2, [0.0, 1.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    assert rows[1].q == [0, 0, 0]
    assert rows[1].scale == 0.0 and rows[1].max_abs_err == 0.0
    # endpoints land exactly on codes 0 and 255
    assert rows[2].q[0] == 0 and rows[2].q[-1] == 255
    assert rows[2].max_abs_err <= rows[2].scale / 2 + 1e-12


def test_quantize_plan_is_narrow(spark):
    from tests.conftest import final_plan

    plan = final_plan(QUERIES["q_embed_quantize"](spark, SF))
    assert "Exchange" not in plan, plan
