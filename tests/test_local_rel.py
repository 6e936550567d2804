"""Contract pins for functions/local_rel.local_rows (VERDICT r13 items 2-3,
ADVICE r13 items 1-2): the >512-row fallback must stay a SINGLE Python
partition (one worker round trip, not a defaultParallelism unpickle fleet),
top-level nullability must match the declared schema, and malformed positional
rows must error instead of silently truncating."""

import pytest

from plenario_mapper_spark.functions.local_rel import _MAX_LITERAL_ROWS, local_rows


def test_large_fallback_is_one_python_partition(spark):
    n = _MAX_LITERAL_ROWS + 88
    df = local_rows(spark, [(i, f"s{i}") for i in range(n)], "a int, b string")
    assert df.rdd.getNumPartitions() == 1
    assert df.count() == n
    # order preserved
    head = df.take(3)
    assert [r["a"] for r in head] == [0, 1, 2]


def test_nullability_matches_declared_schema(spark):
    ddl = "a int, b string"
    lit = local_rows(spark, [(1, "x")], ddl)
    classic = spark.createDataFrame([(1, "x")], ddl)
    assert [f.nullable for f in lit.schema.fields] == [
        f.nullable for f in classic.schema.fields
    ]
    assert lit.schema.simpleString() == classic.schema.simpleString()
    assert lit.collect() == classic.collect()


def test_empty_honors_non_nullable_schema(spark):
    from pyspark.sql import types as T

    nn = T.StructType(
        [
            T.StructField("a", T.IntegerType(), False),
            T.StructField("b", T.StringType(), True),
        ]
    )
    df = local_rows(spark, [], nn)
    assert [f.nullable for f in df.schema.fields] == [False, True]
    assert df.count() == 0


def test_positional_arity_mismatch_raises(spark):
    with pytest.raises(Exception):
        local_rows(spark, [(1,)], "a int, b string").collect()
    with pytest.raises(Exception):
        local_rows(spark, [(1, "x", "extra")], "a int, b string").collect()


def test_pin_local_skips_already_local_frames(spark):
    from plenario_mapper_spark import metadata

    df = local_rows(spark, [("s1", {"k": "f.p"})], "name string, observed_properties map<string,string>")
    assert getattr(df, "_plenario_local", False)
    assert metadata._pin_local(df) is df

    classic = spark.createDataFrame([(1, "x")], "a int, b string")
    pinned = metadata._pin_local(classic)
    assert pinned is not classic
    assert getattr(pinned, "_plenario_local", False)
    assert pinned.collect() == classic.collect()
