"""Stream-time CUSUM monitoring (streaming/cusum_stream.CusumStream): the
per-series fold driven by a REAL Structured Streaming file source, stream ==
one-shot recursion over everything ingested, replay idempotency, restart from
persisted state, and the alarm surface."""

from __future__ import annotations

import os
import shutil

import pytest

from plenario_mapper_spark.streaming.cusum_stream import CusumStream

REFS = {"api": 100.0, "web": 50.0}


def _batches():
    """Three batches; 'api' drifts +30% from observation 12 on, 'web' stays
    at its reference. seq is the event-time order column."""
    api = [100, 98, 103, 97, 101, 99, 102, 96, 104, 100, 98, 101] + [130] * 12
    web = [50, 49, 51, 50, 48, 52, 50, 49, 51, 50, 50, 50] * 2
    rows = [("api", i, float(v)) for i, v in enumerate(api)]
    rows += [("web", i, float(v)) for i, v in enumerate(web)]
    rows.sort(key=lambda r: r[1])
    third = len(rows) // 3
    return [rows[:third], rows[third : 2 * third], rows[2 * third :]]


def _recursion(values, mu, slack=0.05):
    c = 0.0
    for x in values:
        c = max(0.0, c + (x - mu * (1 + slack)))
    return c


def _expected():
    flat = [r for b in _batches() for r in b]
    out = {}
    for s, mu in REFS.items():
        vals = [v for ser, i, v in sorted(flat, key=lambda r: r[1]) if ser == s]
        out[s] = (pytest.approx(_recursion(vals, mu)), len(vals))
    return out


def _stage(spark, tmp_path, batches):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for i, rows in enumerate(batches):
        stage = str(tmp_path / f"stage{i}")
        spark.createDataFrame(
            rows, "series string, seq long, value double"
        ).coalesce(1).write.parquet(stage)
        part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        shutil.copy(os.path.join(stage, part), os.path.join(in_dir, f"b{i}.parquet"))
    return in_dir


def _mk(spark, tmp_path):
    return CusumStream(
        spark, str(tmp_path / "state"), "series", "value", "seq", REFS
    )


def test_stream_equals_one_shot_recursion(spark, tmp_path):
    in_dir = _stage(spark, tmp_path, _batches())
    stream = _mk(spark, tmp_path)
    src = (
        spark.readStream.schema("series string, seq long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    stream.start(src, str(tmp_path / "chk")).awaitTermination()
    assert stream._state_ids() == [0, 1, 2]
    got = {r["series"]: (r["c"], r["n_seen"]) for r in stream.stats().collect()}
    assert got == _expected()
    # the drifted series alarms, the stable one does not
    alarms = [r["series"] for r in stream.alarms(decision_band=50.0).collect()]
    assert alarms == ["api"]


def test_replayed_batch_is_idempotent(spark, tmp_path):
    batches = _batches()
    stream = _mk(spark, tmp_path)
    for i, rows in enumerate(batches):
        stream.process_batch(
            spark.createDataFrame(rows, "series string, seq long, value double"), i
        )
    before = {r["series"]: (r["c"], r["n_seen"]) for r in stream.stats().collect()}
    stream.process_batch(
        spark.createDataFrame(batches[2], "series string, seq long, value double"), 2
    )
    after = {r["series"]: (r["c"], r["n_seen"]) for r in stream.stats().collect()}
    assert before == after


def test_restart_resumes_from_persisted_state(spark, tmp_path):
    batches = _batches()
    s1 = _mk(spark, tmp_path)
    s1.process_batch(
        spark.createDataFrame(batches[0], "series string, seq long, value double"), 0
    )
    s2 = _mk(spark, tmp_path)  # process restart
    for i, rows in enumerate(batches[1:], start=1):
        s2.process_batch(
            spark.createDataFrame(rows, "series string, seq long, value double"), i
        )
    got = {r["series"]: (r["c"], r["n_seen"]) for r in s2.stats().collect()}
    assert got == _expected()


def test_unmonitored_series_ignored_and_empty_state(spark, tmp_path):
    stream = _mk(spark, tmp_path)
    assert stream.stats().collect() == []
    stream.process_batch(
        spark.createDataFrame(
            [("rogue", 0, 999.0), ("api", 0, 100.0)],
            "series string, seq long, value double",
        ),
        0,
    )
    got = {r["series"] for r in stream.stats().collect()}
    assert got == {"api"}


def test_rejects_empty_refs(spark, tmp_path):
    with pytest.raises(ValueError):
        CusumStream(spark, str(tmp_path / "s"), "series", "value", "seq", {})
