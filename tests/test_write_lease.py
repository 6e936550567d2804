"""Single-writer lease (VERDICT r12 item 5): two-session contention, stale
takeover, and the maintained-table entry points actually holding it."""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from plenario_mapper_spark.operators import lease as L
from plenario_mapper_spark.operators import merge as MG
from plenario_mapper_spark.operators import incremental as INC


def test_second_writer_fails_loudly(tmp_path):
    path = str(tmp_path / "tbl")
    with L.writer_lease(path):
        with pytest.raises(L.ConcurrentWriterError, match="serialize writers"):
            with L.writer_lease(path):
                pass
    # released on exit: a new writer acquires fine
    with L.writer_lease(path):
        pass


def test_stale_lease_is_broken_and_taken_over(tmp_path):
    path = str(tmp_path / "tbl")
    lp = L.lease_path_for(path)
    os.makedirs(os.path.dirname(lp), exist_ok=True)
    # a crashed writer's lease, older than its TTL
    with open(lp, "w") as fh:
        json.dump(
            {"owner": "dead:1:x", "acquired_unix": time.time() - 120, "ttl_sec": 60},
            fh,
        )
    with L.writer_lease(path) as owner:
        assert owner != "dead:1:x"
        cur = json.load(open(lp))
        assert cur["owner"] == owner
    assert not os.path.exists(lp)


def test_young_foreign_lease_blocks(tmp_path):
    path = str(tmp_path / "tbl")
    lp = L.lease_path_for(path)
    with open(lp, "w") as fh:
        json.dump(
            {"owner": "alive:2:y", "acquired_unix": time.time(), "ttl_sec": 600},
            fh,
        )
    with pytest.raises(L.ConcurrentWriterError):
        with L.writer_lease(path):
            pass
    # the foreign lease is untouched by the failed acquire
    assert json.load(open(lp))["owner"] == "alive:2:y"


def test_release_does_not_remove_a_takeover_lease(tmp_path):
    """The fencing check: an owner whose lease was broken (long pause) and
    re-acquired by another writer must NOT delete the new owner's lease on
    its way out."""
    path = str(tmp_path / "tbl")
    lp = L.lease_path_for(path)
    ctx = L.writer_lease(path, ttl_sec=600)
    ctx.__enter__()
    # simulate takeover: another writer replaced the lease file
    with open(lp, "w") as fh:
        json.dump(
            {"owner": "new:3:z", "acquired_unix": time.time(), "ttl_sec": 600},
            fh,
        )
    ctx.__exit__(None, None, None)
    assert json.load(open(lp))["owner"] == "new:3:z"


def test_merge_into_holds_the_lease(spark, tmp_path):
    """A writer-lease held by 'another session' makes merge_into raise
    BEFORE touching the table; after release the same merge succeeds and
    the lease is gone."""
    path = str(tmp_path / "t")
    changes = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    with L.writer_lease(path):
        with pytest.raises(L.ConcurrentWriterError):
            MG.merge_into(spark, path, changes, key="k", n_buckets=4)
        assert not os.path.exists(path) or not os.listdir(path)
    MG.merge_into(spark, path, changes, key="k", n_buckets=4)
    got = {r["k"]: r["v"] for r in MG.read_table(spark, path).collect()}
    assert got == {1: "a", 2: "b"}
    assert not os.path.exists(L.lease_path_for(path))


def test_update_rollup_holds_the_lease(spark, tmp_path):
    path = str(tmp_path / "rollup")
    batch = spark.createDataFrame(
        [("2024-01-01 00:00:00", "click", 1.0)], "ts string, event_type string, value double"
    ).select(F.col("ts").cast("timestamp"), "event_type", "value")
    with L.writer_lease(path):
        with pytest.raises(L.ConcurrentWriterError):
            INC.update_rollup(spark, path, batch)
    days = INC.update_rollup(spark, path, batch)
    assert days == ["2024-01-01"]
    assert not os.path.exists(L.lease_path_for(path))
