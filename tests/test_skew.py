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


def test_deterministic_split_partitions_domain_and_is_append_stable(spark):
    """Every row lands in exactly one split; fractions land near targets; and
    assignment is a pure function of the key — re-running on any subset
    (append simulation) never migrates a row."""
    from pyspark.sql import functions as F

    from plenario_mapper_spark.operators.sampling import deterministic_split

    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    out = deterministic_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="x")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    assert 1500 < counts["train"] < 1700  # ~1600 expected, binomial noise
    # append stability: the first half alone gets identical assignments
    first = deterministic_split(
        df.filter(F.col("k") < 1000), "k", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="x"
    )
    full = {r["k"]: r["split"] for r in out.filter(F.col("k") < 1000).collect()}
    sub = {r["k"]: r["split"] for r in first.collect()}
    assert full == sub


def test_split_thresholds_validates_fractions(spark):
    import pytest as _pytest

    from plenario_mapper_spark.operators.sampling import split_thresholds

    with _pytest.raises(ValueError):
        split_thresholds({"a": 0.5, "b": 0.4})


def test_deterministic_split_null_key_is_deterministic_sentinel(spark):
    """NULL keys hash the explicit '<null>' sentinel (engine-mirrorable),
    matching md5('x|<null>') — not concat_ws's silent null-drop."""
    import hashlib

    from pyspark.sql import functions as F

    from plenario_mapper_spark.operators.sampling import deterministic_split

    df = spark.createDataFrame([(None,), (1,)], "k long")
    out = {("null" if r["k"] is None else r["k"]): r["split"]
           for r in deterministic_split(df, "k", {"a": 0.5, "b": 0.5}, salt="x").collect()}
    h = int(hashlib.md5(b"x|<null>").hexdigest()[:8], 16)
    expected = "a" if h < (1 << 31) else "b"
    assert out["null"] == expected


def test_split_bands_partition_domain_property(spark):
    """Property (hypothesis): for random split specs, the cumulative bands
    exactly tile the 32-bit domain — no gap, no overlap, monotone bounds —
    so every hash value maps to exactly one split."""
    from hypothesis import given, settings, strategies as st

    from plenario_mapper_spark.operators.sampling import split_thresholds

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.floats(min_value=0.01, max_value=1.0, allow_nan=False),
            min_size=1,
            max_size=6,
        )
    )
    def check(raw):
        total = sum(raw)
        fracs = {f"s{i}": v / total for i, v in enumerate(raw)}
        # normalize rounding drift so the contract precondition holds
        fracs[f"s{len(raw)-1}"] += 1.0 - sum(fracs.values())
        bounds = split_thresholds(fracs)
        uppers = [b for _, b in bounds]
        assert uppers == sorted(uppers)
        assert uppers[-1] == 1 << 32
        assert all(0 <= b <= 1 << 32 for b in uppers)
        assert len({n for n, _ in bounds}) == len(bounds)

    check()


def test_deterministic_sample_fraction_edges(spark):
    """fraction=0 keeps nothing, fraction=1 keeps everything — the integer
    gate has no floating-point boundary to leak a row at either extreme."""
    from plenario_mapper_spark.operators.sampling import deterministic_sample

    df = spark.range(0, 500).withColumnRenamed("id", "k")
    assert deterministic_sample(df, "k", 0.0).count() == 0
    assert deterministic_sample(df, "k", 1.0).count() == 500
