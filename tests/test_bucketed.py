"""Bucketed co-located join: correct results AND a shuffle-free physical plan."""

import pytest
from pyspark.sql import functions as F

from plenario_mapper_spark.sources import bucketed as B

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    B.write_bucketed(l, "bt_lineitem", ["l_orderkey"], 8, path=str(wh / "l"))
    B.write_bucketed(o, "bt_orders", ["l_orderkey"], 8, path=str(wh / "o"))
    yield "bt_lineitem", "bt_orders"
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bt_orders")


def test_colocated_join_is_shuffle_free(spark, bucketed_tables):
    """The scenario bucketing exists for is fact⋈fact where NEITHER side can
    broadcast; at test scale the tables are tiny, so disable broadcast to get
    the plan shape a 100 TB input would produce."""
    lt, rt = bucketed_tables
    old_static = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        j = B.colocated_join(spark, lt, rt, ["l_orderkey"])
        from tests.conftest import final_plan

        plan = final_plan(j)
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_static)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)


def test_colocated_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    j = (
        B.colocated_join(spark, lt, rt, ["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    plain = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))
