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


def test_two_live_suffixes_coexist_and_torn_leftovers_reclaimed(spark):
    """ADVICE r11 (medium): one session holding two sf_dirs must keep BOTH
    bucketed layouts readable — materializing B must not delete A's data
    files out from under A's still-registered catalog tables — while an
    UNREGISTERED same-app sibling dir (torn leftover from a crashed writer)
    is still reclaimed."""
    import os
    import shutil
    import tempfile

    app_id = spark.sparkContext.applicationId
    tmp = tempfile.gettempdir()
    # plant a torn leftover: same-app dir whose suffix has no catalog tables
    torn = os.path.join(tmp, f"bucketed_{app_id}_deadbeef0000")
    os.makedirs(torn, exist_ok=True)
    try:
        o_a, l_a = B.ensure_bucketed_pair(spark, "/root/testdata/sf0.001")
        o_b, l_b = B.ensure_bucketed_pair(spark, "/root/testdata/sf0.01")
        assert o_a != o_b  # distinct source identities -> distinct suffixes
        # A's layout survived B's materialization: tables read end-to-end
        n_a = spark.table(l_a).count()
        n_b = spark.table(l_b).count()
        assert 0 < n_a < n_b
        # and a THIRD call for A early-returns to working tables
        o_a2, l_a2 = B.ensure_bucketed_pair(spark, "/root/testdata/sf0.001")
        assert (o_a2, l_a2) == (o_a, l_a)
        assert spark.table(o_a2).count() == spark.table(o_a).count()
        # the torn (unregistered) sibling was reclaimed by the sweep
        assert not os.path.exists(torn)
    finally:
        shutil.rmtree(torn, ignore_errors=True)
        for t in (
            spark.catalog.listTables()
        ):  # drop only this test's bucket tables
            if t.name.startswith(("orders_bkt_", "lineitem_bkt_")):
                spark.sql(f"DROP TABLE IF EXISTS {t.name}")
