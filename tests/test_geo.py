"""Geospatial operators: recall/precision of cell blocking, plan shape, and
domain invariants of the deterministic coordinate derivation."""

import pyspark.sql.functions as F
import pytest

from plenario_mapper_spark.operators import geo as GEO
from plenario_mapper_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    from tests.conftest import final_plan

    return final_plan(df)


@pytest.fixture(scope="module")
def pts(spark):
    df = spark.range(0, 400).select(F.col("id").alias("pid"))
    return GEO.derive_coords_udeg(df, "pid").cache()


@pytest.fixture(scope="module")
def ctr(spark):
    df = spark.range(0, 12).select(F.col("id").alias("cid"))
    return (
        GEO.derive_coords_udeg(df, "cid")
        .withColumnsRenamed({"x_u": "cx_u", "y_u": "cy_u"})
        .cache()
    )


def test_coords_in_domain(pts):
    row = pts.agg(
        F.min("x_u").alias("x0"),
        F.max("x_u").alias("x1"),
        F.min("y_u").alias("y0"),
        F.max("y_u").alias("y1"),
    ).first()
    assert 0 <= row.x0 and row.x1 < GEO.LON_DOMAIN_UDEG
    assert 0 <= row.y0 and row.y1 < GEO.LAT_DOMAIN_UDEG


def test_grid_radius_join_equals_brute_force(pts, ctr):
    """Cell blocking must lose nothing (3x3 neighborhood with cell==radius is
    a recall proof, this is its executable check) and admit nothing (the
    integer distance filter is exact)."""
    r = 20_000_000  # 20 degrees: dense enough for hundreds of true pairs
    got = {
        (q.pid, q.cid, q.dist_sq)
        for q in GEO.grid_radius_join(pts, ctr, r).collect()
    }
    brute = {
        (q.pid, q.cid, q.dist_sq)
        for q in pts.crossJoin(ctr)
        .withColumn(
            "dist_sq",
            (F.col("x_u") - F.col("cx_u")) * (F.col("x_u") - F.col("cx_u"))
            + (F.col("y_u") - F.col("cy_u")) * (F.col("y_u") - F.col("cy_u")),
        )
        .filter(F.col("dist_sq") <= r * r)
        .collect()
    }
    assert got == brute
    assert len(brute) > 0  # non-vacuous


def test_radius_join_broadcasts_centers_never_cartesian(spark):
    plan = _plan(QUERIES["q_geo_radius_join"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_grid_timeseries_single_aggregate_exchange(spark):
    """The rollup must be one hash-aggregate pair (partial + final) around a
    single shuffle on the full grouping key."""
    plan = _plan(QUERIES["q_geo_grid_timeseries"](spark, SF))
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(exchanges) == 1, plan
    assert "cell_x" in exchanges[0] and "cell_y" in exchanges[0], plan
