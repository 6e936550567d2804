"""Keyed MERGE into bucket-partitioned parquet: upsert/delete semantics,
touched-bucket-only rewrites, last-wins ordering."""

import os

from pyspark.sql import functions as F

from plenario_mapper_spark.operators import merge as MG


def test_merge_upsert_insert_delete_roundtrip(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    MG.merge_into(spark, path, base, "k", n_buckets=8)
    assert sorted(map(tuple, MG.read_table(spark, path).collect())) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]
    changes = spark.createDataFrame(
        [(2, "B", False), (4, "d", False), (3, None, True)],
        "k long, v string, _deleted boolean",
    )
    MG.merge_into(spark, path, changes, "k", n_buckets=8)
    assert sorted(
        map(tuple, MG.read_table(spark, path).collect())
    ) == [(1, "a"), (2, "B"), (4, "d")]


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(50)], "k long, v string"
    )
    MG.merge_into(spark, path, base, "k", n_buckets=8)
    # snapshot per-bucket mtimes
    def mtimes():
        out = {}
        for d in os.listdir(path):
            if d.startswith("_bucket="):
                files = sorted(os.listdir(os.path.join(path, d)))
                out[d] = [
                    (f, os.path.getmtime(os.path.join(path, d, f)))
                    for f in files
                    if f.endswith(".parquet")
                ]
        return out
    before = mtimes()
    touched = MG.merge_into(
        spark, path,
        spark.createDataFrame([(7, "SEVEN")], "k long, v string"),
        "k", n_buckets=8,
    )
    after = mtimes()
    assert len(touched) == 1
    touched_dir = f"_bucket={touched[0]}"
    for d in before:
        if d == touched_dir:
            assert before[d] != after[d]
        else:
            assert before[d] == after[d], d
    got = dict(map(tuple, MG.read_table(spark, path).collect()))
    assert got[7] == "SEVEN" and got[6] == "v6" and len(got) == 50


def test_merge_last_wins_by_seq_and_dup_guard(spark, tmp_path):
    import pytest as _pytest

    path = str(tmp_path / "tbl")
    dup = spark.createDataFrame(
        [(1, "x"), (1, "y")], "k long, v string"
    )
    with _pytest.raises(ValueError, match="more than once"):
        MG.merge_into(spark, path, dup, "k")
    seqd = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 2), (2, "z", 1)], "k long, v string, seq long"
    )
    MG.merge_into(spark, path, seqd, "k", seq_col="seq")
    got = dict(map(tuple, MG.read_table(spark, path).collect()))
    assert got == {1: "y", 2: "z"}
