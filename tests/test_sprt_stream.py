"""Stream-time SPRT (streaming/sprt_stream.SprtStream): the per-variant fold
driven by a real Structured Streaming file source, stream == one-shot batch
query over everything ingested, first-crossing freeze, and replay
idempotency."""

from __future__ import annotations

import datetime
import os
import shutil

from plenario_mapper_spark.plans.registry import QUERIES
from plenario_mapper_spark.streaming.sprt_stream import SprtStream

D0 = datetime.datetime(2024, 1, 1)

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _rows():
    """Variant 0 crosses +5 mid-stream then drifts back; variant 1 wanders
    without deciding. The post-crossing drift makes the first-crossing
    freeze load-bearing (a last-crossing implementation disagrees)."""
    seq0 = [200, 200, 200, 200, 200, 10, 10, 10, 200, 10]  # +5 at n=5
    seq1 = [200, 10, 200, 10, 200, 10, 200, 10]            # never |w|>=5
    rows, eid = [], 0
    for k in range(max(len(seq0), len(seq1))):
        ts = D0 + datetime.timedelta(hours=k)
        if k < len(seq0):
            rows.append((eid, ts, 0, "purchase", float(seq0[k]), "{}")); eid += 1
        if k < len(seq1):
            rows.append((eid, ts, 1, "purchase", float(seq1[k]), "{}")); eid += 1
    return rows


def _stage(spark, tmp_path, rows, n_batches=3):
    """Time-ordered rows split into n file-batches (maxFilesPerTrigger=1)."""
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    per = (len(rows) + n_batches - 1) // n_batches
    for i in range(n_batches):
        chunk = rows[i * per : (i + 1) * per]
        stage = str(tmp_path / f"stage{i}")
        spark.createDataFrame(chunk, EV_SCHEMA).coalesce(1).write.parquet(stage)
        part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        shutil.copy(os.path.join(stage, part), os.path.join(in_dir, f"b{i}.parquet"))
    return in_dir


def _mk(spark, tmp_path):
    return SprtStream(
        spark, str(tmp_path / "state"), "variant", "value", ("ts", "event_id")
    )


def _source(spark, in_dir):
    from pyspark.sql import functions as F

    return (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.pmod(F.col("user_id"), F.lit(2)).cast("int").alias("variant"),
            "value",
            "ts",
            "event_id",
        )
    )


def test_stream_equals_one_shot_batch_query(spark, tmp_path):
    rows = _rows()
    in_dir = _stage(spark, tmp_path, rows)
    stream = _mk(spark, tmp_path)
    stream.start(_source(spark, in_dir), str(tmp_path / "chk")).awaitTermination()
    assert stream._state_ids() == [0, 1, 2]

    # one-shot truth: the registry batch query over the same events
    batch_dir = str(tmp_path / "batch")
    spark.createDataFrame(rows, EV_SCHEMA).write.parquet(
        os.path.join(batch_dir, "events.parquet")
    )
    want = {
        r["variant"]: r
        for r in QUERIES["q_eval_sprt_decision"](spark, batch_dir).collect()
    }
    got = {r["variant"]: r for r in stream.stats().collect()}
    assert set(got) == set(want)
    for v in want:
        assert got[v]["decision"] == want[v]["decision"]
        assert got[v]["n_at_decision"] == want[v]["n_at_decision"]
        assert got[v]["n_obs"] == want[v]["n_obs"]
        assert got[v]["walk"] == want[v]["walk_final"]
    # and the engineered shape: v0 froze at the FIRST crossing despite the
    # later drift back below the boundary
    assert got[0]["decision"] == "accept_h1" and got[0]["n_at_decision"] == 5
    assert abs(got[0]["walk"]) < 5
    assert got[1]["decision"] == "continue" and got[1]["n_at_decision"] is None


def test_replay_is_idempotent(spark, tmp_path):
    rows = _rows()
    in_dir = _stage(spark, tmp_path, rows)
    stream = _mk(spark, tmp_path)
    stream.start(_source(spark, in_dir), str(tmp_path / "chk")).awaitTermination()
    before = sorted(map(tuple, stream.stats().collect()))

    # re-deliver the LAST batch (at-least-once): fold re-derives batch 2
    # from batch 1's state and overwrites — identical output
    last = (
        spark.read.schema(EV_SCHEMA)
        .parquet(os.path.join(in_dir, "b2.parquet"))
    )
    from pyspark.sql import functions as F

    replay = last.filter(F.col("event_type") == "purchase").select(
        F.pmod(F.col("user_id"), F.lit(2)).cast("int").alias("variant"),
        "value",
        "ts",
        "event_id",
    )
    stream.process_batch(replay, 2)
    after = sorted(map(tuple, stream.stats().collect()))
    assert after == before
