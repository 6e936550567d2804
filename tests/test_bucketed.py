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


def test_regenerated_testdata_drops_superseded_suffix(spark, tmp_path):
    """ADVICE r12 (low): regenerating a dir's testdata rotates its content
    identity; the superseded suffix's catalog tables must be dropped at the
    next materialization so the reclaim sweep can delete its data dir,
    instead of the stale layout staying registered (and its dir kept) for
    the rest of the app's lifetime."""
    import os
    import shutil
    import tempfile

    src = "/root/testdata/sf0.001"
    d = tmp_path / "regen_sf"
    d.mkdir()
    for t in ("orders", "lineitem"):
        shutil.copy(os.path.join(src, f"{t}.parquet"), d / f"{t}.parquet")
    sf_dir = str(d)
    try:
        o_old, l_old = B.ensure_bucketed_pair(spark, sf_dir)
        # regenerate: rewrite one file so size/mtime (identity) changes
        os.utime(d / "orders.parquet", (0, 0))
        o_new, l_new = B.ensure_bucketed_pair(spark, sf_dir)
        assert o_new != o_old
        # superseded catalog entries are gone; the new pair reads fine
        assert not spark.catalog.tableExists(o_old)
        assert not spark.catalog.tableExists(l_old)
        assert spark.table(l_new).count() > 0
        # and the superseded data dir was reclaimed by the sweep (it runs
        # before the write; a THIRD materialization of any dir sweeps it)
        app_id = spark.sparkContext.applicationId
        old_suffix = o_old[len("orders_bkt_"):]
        old_dir = os.path.join(tempfile.gettempdir(), f"bucketed_{app_id}_{old_suffix}")
        os.utime(d / "orders.parquet", (1, 1))
        B.ensure_bucketed_pair(spark, sf_dir)
        assert not os.path.exists(old_dir)
    finally:
        for t in spark.catalog.listTables():
            if t.name.startswith(("orders_bkt_", "lineitem_bkt_")):
                spark.sql(f"DROP TABLE IF EXISTS {t.name}")
