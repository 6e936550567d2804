"""Stream-time TWAP (streaming/twap_stream.TwapStream): stream == one-shot
batch TWAP with the boundary interval BRIDGED across batches, real file-source
drive, replay idempotency, and the out-of-order fail-fast contract."""

from __future__ import annotations

import datetime
import os
import shutil

import pytest

from plenario_mapper_spark.streaming.twap_stream import OutOfOrderBatch, TwapStream

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

D0 = datetime.datetime(2024, 6, 1, 0, 0, 0)


def ev(i, seconds, typ, val):
    return (i, D0 + datetime.timedelta(seconds=seconds), 1, typ, val, "{}")


def _corpus():
    """The decisive shape: the value that spans the batch 0/1 boundary (10.0
    held from t=0 to t=100) contributes 90 s of weight that exists in
    NEITHER batch alone — only the bridge fold can produce it."""
    b0 = [ev(1, 0, "g", 10.0), ev(2, 10, "g", 20.0)]      # internal: 20 held from 10
    b1 = [ev(3, 100, "g", 30.0), ev(4, 160, "g", 40.0)]
    b2 = [ev(5, 400, "g", 5.0)]                           # bridge only
    return [b0, b1, b2]


def _one_shot(spark, batches):
    from plenario_mapper_spark.plans.registry import QUERIES
    import os, tempfile

    rows = [r for b in batches for r in b]
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        return {
            (str(r["day"]), r["event_type"]): r
            for r in QUERIES["q_events_twap"](spark, d).collect()
        }


def test_stream_equals_one_shot_with_bridged_boundaries(spark, tmp_path):
    batches = _corpus()
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for i, rows in enumerate(batches):
        stage = str(tmp_path / f"stage{i}")
        spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.parquet(stage)
        part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        shutil.copy(os.path.join(stage, part), os.path.join(in_dir, f"b{i}.parquet"))
    stream = TwapStream(spark, str(tmp_path / "state"))
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    stream.start(src, str(tmp_path / "chk")).awaitTermination()
    got = {(str(r["day"]), r["event_type"]): r for r in stream.twap().collect()}
    ref = _one_shot(spark, batches)
    assert set(got) == set(ref)
    for k, r in ref.items():
        assert got[k]["twap"] == r["twap"], (k, got[k]["twap"], r["twap"])
    # and the hand value: 10*10 + 20*90 + 30*60 + 40*240 / 400
    expect = (10 * 10 + 20 * 90 + 30 * 60 + 40 * 240) / 400
    assert abs(got[("2024-06-01", "g")]["twap"] - expect) < 1e-6


def test_replay_is_idempotent(spark, tmp_path):
    batches = _corpus()
    stream = TwapStream(spark, str(tmp_path / "state"))
    for i, rows in enumerate(batches):
        stream.process_batch(spark.createDataFrame(rows, EVENTS_SCHEMA), i)
    before = {(str(r["day"]), r["event_type"]): tuple(r) for r in stream.twap().collect()}
    stream.process_batch(spark.createDataFrame(batches[2], EVENTS_SCHEMA), 2)
    after = {(str(r["day"]), r["event_type"]): tuple(r) for r in stream.twap().collect()}
    assert before == after


def test_out_of_order_batch_is_rejected(spark, tmp_path):
    stream = TwapStream(spark, str(tmp_path / "state"))
    stream.process_batch(
        spark.createDataFrame([ev(1, 100, "g", 10.0)], EVENTS_SCHEMA), 0
    )
    with pytest.raises(OutOfOrderBatch):
        stream.process_batch(
            spark.createDataFrame([ev(2, 50, "g", 20.0)], EVENTS_SCHEMA), 1
        )
