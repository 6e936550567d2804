"""Stream-time OHLC bars (streaming/bars_stream.BarStream): a real
Structured Streaming file source, stream == one-shot batch bars regardless of
how events split across micro-batches, replay idempotency, restart from
persisted state."""

from __future__ import annotations

import datetime
import os
import shutil

from plenario_mapper_spark.streaming.bars_stream import BarStream

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

D0 = datetime.datetime(2024, 6, 1, 0, 0, 0)


def _corpus():
    """Three batches deliberately splitting each bar's open/close/extremes
    ACROSS batches (batch 1 carries day 1's true open, batch 2 its close)."""

    def ev(i, minutes, typ, val):
        return (i, D0 + datetime.timedelta(minutes=minutes), 1, typ, val, "{}")

    b0 = [ev(1, 30, "click", 5.0), ev(2, 400, "click", 9.0), ev(3, 100, "view", 2.0)]
    b1 = [ev(4, 10, "click", 7.0), ev(5, 1300, "click", 1.0), ev(6, 90, "view", 8.0)]
    # day 2 events + a same-ts close tie for day 1 click (higher id wins)
    b2 = [ev(7, 1300, "click", 4.0), ev(8, 24 * 60 + 5, "click", 3.0)]
    return [b0, b1, b2]


def _stage_batches(spark, tmp_path, batches):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for i, rows in enumerate(batches):
        stage = str(tmp_path / f"stage{i}")
        spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.parquet(stage)
        part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        shutil.copy(os.path.join(stage, part), os.path.join(in_dir, f"b{i}.parquet"))
    return in_dir


def _one_shot(spark, batches):
    import plenario_mapper_spark.streaming.bars_stream as BS

    all_rows = [r for b in batches for r in b]
    df = spark.createDataFrame(all_rows, EVENTS_SCHEMA)
    return {
        (str(r["day"]), r["event_type"]): r
        for r in BS._merge(BS._partials(df)).collect()
    }


def _got(stream):
    return {(str(r["day"]), r["event_type"]): r for r in stream.bars().collect()}


def test_stream_equals_one_shot(spark, tmp_path):
    batches = _corpus()
    in_dir = _stage_batches(spark, tmp_path, batches)
    stream = BarStream(spark, str(tmp_path / "state"))
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    stream.start(src, str(tmp_path / "chk")).awaitTermination()
    assert stream._state_ids() == [0, 1, 2]
    got = _got(stream)
    ref = _one_shot(spark, batches)
    assert set(got) == set(ref)
    for k, r in ref.items():
        g = got[k]
        for c in ("open", "high", "low", "close", "n_events"):
            assert g[c] == r[c], (k, c, g[c], r[c])
        assert g["sum_value"] == r["sum_cents"] / 100.0
    # the split-open/close semantics actually exercised: day 1 click opened
    # in batch 1 (id 4, value 7.0) and closed on the id-5/id-7 same-ts tie
    # (higher id 7 wins, value 4.0)
    click = got[("2024-06-01", "click")]
    assert click["open"] == 7.0 and click["close"] == 4.0
    assert click["high"] == 9.0 and click["low"] == 1.0
    assert click["n_events"] == 5


def test_replay_is_idempotent(spark, tmp_path):
    batches = _corpus()
    stream = BarStream(spark, str(tmp_path / "state"))
    for i, rows in enumerate(batches):
        stream.process_batch(spark.createDataFrame(rows, EVENTS_SCHEMA), i)
    before = _got(stream)
    # at-least-once re-delivery of the LAST batch: recomputed from state<2,
    # counts must not double
    stream.process_batch(spark.createDataFrame(batches[2], EVENTS_SCHEMA), 2)
    assert _got(stream) == before


def test_restart_resumes_from_persisted_state(spark, tmp_path):
    batches = _corpus()
    s1 = BarStream(spark, str(tmp_path / "state"))
    for i in (0, 1):
        s1.process_batch(spark.createDataFrame(batches[i], EVENTS_SCHEMA), i)
    # new instance, same state dir — continues the fold
    s2 = BarStream(spark, str(tmp_path / "state"))
    s2.process_batch(spark.createDataFrame(batches[2], EVENTS_SCHEMA), 2)
    got, ref = _got(s2), _one_shot(spark, batches)
    assert set(got) == set(ref)
    for k, r in ref.items():
        g = got[k]
        for c in ("open", "high", "low", "close", "n_events"):
            assert g[c] == r[c]
        assert g["sum_value"] == r["sum_cents"] / 100.0
