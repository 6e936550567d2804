"""Salted skew helpers: row-identical to their unsalted equivalents."""

from pyspark.sql import functions as F

from plenario_mapper_spark.operators import skew as SK

SF_DIR = "/root/testdata/sf0.001"


def test_salted_inner_join_matches_plain(spark):
    l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    r = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = l.join(r, ["l_orderkey"]).groupBy("l_orderkey").count()
    salted = SK.salted_join(l, r, ["l_orderkey"], salt=8).groupBy(
        "l_orderkey"
    ).count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_left_join_keeps_unmatched(spark):
    l = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k int, v string"
    )
    r = spark.createDataFrame([(1, "x"), (2, "y")], "k int, w string")
    got = sorted(
        (row["k"], row["v"], row["w"])
        for row in SK.salted_join(l, r, ["k"], how="left", salt=4).collect()
    )
    assert got == [(1, "a", "x"), (1, "b", "x"), (2, "c", "y"), (3, "d", None)]


def test_salted_collect_list_same_multiset(spark):
    df = spark.createDataFrame(
        [(i % 3, i) for i in range(1000)], "k int, v int"
    )
    got = {
        r["k"]: sorted(r["values"])
        for r in SK.salted_collect_list(df, ["k"], "v", salt=8).collect()
    }
    want = {
        r["k"]: sorted(r["vals"])
        for r in df.groupBy("k").agg(F.collect_list("v").alias("vals")).collect()
    }
    assert got == want
