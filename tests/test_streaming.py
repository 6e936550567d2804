"""End-to-end streaming test: file source -> foreachBatch mapper -> parquet/json
sinks, reproducing the integration suite's aggregate counts (7 emits / 4 resolves /
5 error messages, integration_tests.js:334-338) across TWO micro-batches with the
blacklist state carried between them."""

import json
import os

import pytest
from pyspark.sql import functions as F

from plenario_mapper_spark.streaming.pipeline import (
    MapperStream,
    StreamSinks,
    decode_kinesis_records,
    file_obs_source,
)
from tests.conftest import CANONICAL_OBS, FEATURE_META_ROWS, SENSOR_META_ROWS


def _write_obs_json(path, obs_list):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "batch.json"), "w") as f:
        for n, m, d, s, net, data in obs_list:
            f.write(
                json.dumps(
                    {
                        "node_id": n,
                        "meta_id": m,
                        "datetime": d,
                        "sensor": s,
                        "network": net,
                        "data": json.dumps(data),
                    }
                )
                + "\n"
            )


@pytest.fixture()
def sinks(tmp_path):
    return StreamSinks(
        lake_dir=str(tmp_path / "lake"),
        dead_letter_dir=str(tmp_path / "dead"),
        emit_dir=str(tmp_path / "emit"),
        alert_dir=str(tmp_path / "alerts"),
        state_dir=str(tmp_path / "state"),
    )


def _metadata_provider(spark):
    from plenario_mapper_spark.schemas import (
        FEATURE_METADATA_SCHEMA,
        SENSOR_METADATA_SCHEMA,
    )

    return (
        spark.createDataFrame(SENSOR_META_ROWS, SENSOR_METADATA_SCHEMA),
        spark.createDataFrame(FEATURE_META_ROWS, FEATURE_METADATA_SCHEMA),
    )


def test_stream_end_to_end(spark, tmp_path, sinks):
    src_dir = str(tmp_path / "in")
    _write_obs_json(src_dir, CANONICAL_OBS)

    stream = MapperStream(spark, _metadata_provider, sinks)
    q = stream.start(
        file_obs_source(spark, src_dir),
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_once=True,
    )
    q.awaitTermination(120)

    # 001 temp+hum, 002 mag, 003 mag, 004 cv, 007 cv, 008 temp = 7 feature rows,
    # spread across the per-feature tables lake_dir/<feature>
    feature_counts = {}
    for feat in os.listdir(sinks.lake_dir):
        feature_counts[feat] = spark.read.parquet(
            os.path.join(sinks.lake_dir, feat)
        ).count()
    assert sum(feature_counts.values()) == 7
    temps = spark.read.parquet(os.path.join(sinks.lake_dir, "temperature")).filter(
        F.col("network") == "array_of_things_chicago"
    )
    assert temps.select("temperature").collect()[0][0] == pytest.approx(37.91)

    dead = spark.read.parquet(sinks.dead_letter_dir)
    assert dead.count() == 4  # obs 3,4,5,6

    emits = spark.read.json(sinks.emit_dir)
    assert emits.count() == 7

    alerts = spark.read.json(sinks.alert_dir)
    rows = alerts.collect()
    assert sum(1 for r in rows if r["kind"] == "resolve") == 4
    assert (
        sum(len(json.loads(r["value"])) for r in rows if r["kind"] == "error") == 5
    )
    # durable blacklist after batch 1: hmc5883l + wubdb89 (see test_alerts)
    bl = spark.read.parquet(sinks.state_dir)
    assert sorted(r["sensor"] for r in bl.collect()) == ["hmc5883l", "wubdb89"]


def test_stream_state_carries_across_batches(spark, tmp_path, sinks):
    """Batch 2 re-sends obs3 (hmc5883l error): suppressed because the sensor is
    already blacklisted from batch 1 — cross-batch dedup via the state table."""
    src_dir = str(tmp_path / "in")
    _write_obs_json(src_dir, CANONICAL_OBS)
    stream = MapperStream(spark, _metadata_provider, sinks)
    q = stream.start(
        file_obs_source(spark, src_dir), str(tmp_path / "ckpt"), trigger_once=True
    )
    q.awaitTermination(120)

    src2 = str(tmp_path / "in2")
    _write_obs_json(src2, [CANONICAL_OBS[2]])  # obs3 again
    stream2 = MapperStream(spark, _metadata_provider, sinks)
    # NOTE: stale snapshot is empty on a fresh MapperStream; obs3 is discrepant
    # against fresh metadata too, so it yields an error event — suppressed by the
    # carried blacklist.
    q2 = stream2.start(
        file_obs_source(spark, src2), str(tmp_path / "ckpt2"), trigger_once=True
    )
    q2.awaitTermination(120)

    alerts = spark.read.json(sinks.alert_dir)
    hmc_errors = [
        r
        for r in alerts.collect()
        if r["name"] == "hmc5883l" and r["kind"] == "error"
    ]
    assert len(hmc_errors) == 1  # batch 1 only; batch 2 suppressed


def test_stream_checkpoint_resume_no_reprocess(spark, tmp_path, sinks):
    """F1 (kcl_app.js:56-59): restart from the SAME checkpointLocation must not
    re-read committed offsets — the offset WAL + commit log replace the KCL
    sequence-number checkpoint, upgrading at-least-once to exactly-once for the
    idempotent lake sink."""
    src_dir = str(tmp_path / "in")
    _write_obs_json(src_dir, CANONICAL_OBS)
    ckpt = str(tmp_path / "ckpt")

    stream = MapperStream(spark, _metadata_provider, sinks)
    q = stream.start(file_obs_source(spark, src_dir), ckpt, trigger_once=True)
    q.awaitTermination(120)
    first = spark.read.parquet(sinks.dead_letter_dir).count()

    # restart with the same checkpoint and unchanged source: nothing to do
    stream2 = MapperStream(spark, _metadata_provider, sinks)
    q2 = stream2.start(file_obs_source(spark, src_dir), ckpt, trigger_once=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(sinks.dead_letter_dir).count() == first


def test_streaming_session_window_watermark(spark, tmp_path):
    """Event-time sessionization as a true stream: watermark + session_window,
    availableNow trigger, results to a memory sink. Twin of the batch
    q_events_sessionize (same 30-min gap semantics)."""
    src = tmp_path / "sessions_in"
    src.mkdir()
    rows = [
        # user 1: two events 10 min apart (one session), then a 2h gap (new one)
        {"user_id": 1, "ts": "2024-01-01T00:00:00", "v": 1.0},
        {"user_id": 1, "ts": "2024-01-01T00:10:00", "v": 2.0},
        {"user_id": 1, "ts": "2024-01-01T02:30:00", "v": 3.0},
        # user 2: single event
        {"user_id": 2, "ts": "2024-01-01T01:00:00", "v": 4.0},
    ]
    with open(src / "a.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema("user_id long, ts string, v double")
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sum_v"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["n"]): r["sum_v"]
        for r in spark.sql("SELECT user_id, n, sum_v FROM sessions_out").collect()
    }
    assert got == {(1, 2): 3.0, (1, 1): 3.0, (2, 1): 4.0}


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Streaming exact dedup (H1): dropDuplicatesWithinWatermark keyed by
    event id — the at-least-once -> effectively-once repair for replayed
    sources."""
    src = tmp_path / "dedup_in"
    src.mkdir()
    rows = [
        {"event_id": 1, "ts": "2024-01-01T00:00:00"},
        {"event_id": 1, "ts": "2024-01-01T00:00:01"},  # replay dup
        {"event_id": 2, "ts": "2024-01-01T00:05:00"},
        {"event_id": 2, "ts": "2024-01-01T00:05:00"},  # exact dup
        {"event_id": 3, "ts": "2024-01-01T00:06:00"},
    ]
    with open(src / "a.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = (
        spark.readStream.schema("event_id long, ts string")
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = sorted(
        r["event_id"] for r in spark.sql("SELECT event_id FROM dedup_out").collect()
    )
    assert ids == [1, 2, 3]


def test_per_feature_writer_hook_receives_network_splits(spark, tmp_path, sinks):
    """A6 literal-parity hook: the per-(network, feature) writer is invoked once
    per observed network with only that network's rows (app/mapper.js:282-290)."""
    calls = []
    sinks.per_feature_writer = lambda net, feat, df: calls.append(
        (net, feat, df.count())
    )
    src_dir = str(tmp_path / "in")
    _write_obs_json(src_dir, CANONICAL_OBS)
    stream = MapperStream(spark, _metadata_provider, sinks)
    q = stream.start(
        file_obs_source(spark, src_dir), str(tmp_path / "ckpt"), trigger_once=True
    )
    q.awaitTermination(120)
    got = {(n, f): c for n, f, c in calls}
    # obs1 temp+hum (chicago), obs8 temp (seattle) -> temperature seen per network
    assert got[("array_of_things_chicago", "temperature")] == 1
    assert got[("internet_of_stuff_seattle", "temperature")] == 1
    assert got[("array_of_things_chicago", "relative_humidity")] == 1


def _file_pusher(out_dir: str):
    """Executor-side push client for tests: appends each partition's messages as
    JSON lines to a uniquely-named file, stamped with the worker pid — the
    stand-in for the reference's per-process socket/HTTP client
    (app/mapper.js:16). A nested function so cloudpickle ships it by VALUE (the
    tests package is not importable from the Python workers). Local mode runs
    workers as separate processes, so the recorded pids prove the push never
    transited the driver."""

    def push(msgs: list[dict]) -> None:
        import json as _json
        import os as _os
        import uuid

        _os.makedirs(out_dir, exist_ok=True)
        path = _os.path.join(out_dir, f"{_os.getpid()}-{uuid.uuid4().hex}.jsonl")
        with open(path, "w") as f:
            for m in msgs:
                f.write(_json.dumps({"pid": _os.getpid(), **m}) + "\n")

    return push


def _read_pushed(out_dir):
    msgs = []
    for fn in os.listdir(out_dir):
        with open(os.path.join(out_dir, fn)) as f:
            msgs.extend(json.loads(line) for line in f)
    return msgs


def test_emit_and_alert_push_hooks(spark, tmp_path, sinks):
    """A8/A9 literal-parity hooks: the socket-emit and alert-POST callables see
    the reference counts (7 emit messages; 4 resolves + 5 error messages,
    integration_tests.js:334-338) — and run on the EXECUTORS (worker pid !=
    driver pid), i.e. there is no driver-side collect on the emit path."""
    emit_out, alert_out = str(tmp_path / "pushed"), str(tmp_path / "posted")
    sinks.emit_pusher = _file_pusher(emit_out)
    sinks.alert_poster = _file_pusher(alert_out)
    src_dir = str(tmp_path / "in")
    _write_obs_json(src_dir, CANONICAL_OBS)
    stream = MapperStream(spark, _metadata_provider, sinks)
    q = stream.start(
        file_obs_source(spark, src_dir), str(tmp_path / "ckpt"), trigger_once=True
    )
    q.awaitTermination(120)
    pushed, posted = _read_pushed(emit_out), _read_pushed(alert_out)
    assert len(pushed) == 7
    assert {m["feature"] for m in pushed} >= {"temperature", "magnetic_field"}
    assert sum(1 for a in posted if a["kind"] == "resolve") == 4
    assert (
        sum(len(json.loads(a["value"])) for a in posted if a["kind"] == "error") == 5
    )
    # worker-side execution: every push happened in a Python worker process
    assert all(m["pid"] != os.getpid() for m in pushed + posted)


def test_long_stream_bounded_cached_state(spark, tmp_path, sinks):
    """Registry-snapshot hygiene over a long-running stream: process_batch caches
    the fresh registry every micro-batch, so without the outgoing-snapshot
    unpersist the storage layer accumulates one cached plan per batch forever.
    After N direct batch invocations the number of persisted RDDs must be O(1),
    not O(N)."""
    src_dir = str(tmp_path / "in")
    _write_obs_json(src_dir, CANONICAL_OBS)
    batch_df = spark.read.schema(
        "node_id string, meta_id double, datetime string, sensor string, "
        "network string, data string"
    ).json(src_dir)
    stream = MapperStream(spark, _metadata_provider, sinks)
    n_batches = 12
    # assert on GROWTH, not absolute count: the shared test session may carry
    # persisted RDDs from other modules (e.g. CC localCheckpoints)
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    for i in range(n_batches):
        stream.process_batch(batch_df, i)
    grown = spark.sparkContext._jsc.getPersistentRDDs().size() - before
    assert grown <= 3, f"+{grown} persisted RDDs after {n_batches} batches"


def test_jdbc_writer_table_naming(monkeypatch, spark):
    """jdbc_per_feature_writer formats <network>__<feature> and drops the
    network column (it lives in the table name, per the reference DDL)."""
    from plenario_mapper_spark.streaming.pipeline import jdbc_per_feature_writer

    seen = {}

    def fake_jdbc(self, url, table, mode=None, properties=None):
        seen["url"], seen["table"] = url, table

    from pyspark.sql.readwriter import DataFrameWriter

    monkeypatch.setattr(DataFrameWriter, "jdbc", fake_jdbc)
    df = spark.createDataFrame(
        [("n1", "array_of_things_chicago", 1.5)],
        "node_id string, network string, temperature double",
    )
    w = jdbc_per_feature_writer("jdbc:postgresql://h/db")
    w("array_of_things_chicago", "temperature", df)
    assert seen["table"] == "array_of_things_chicago__temperature"
    assert seen["url"] == "jdbc:postgresql://h/db"


def test_decode_kinesis_records(spark):
    import base64

    good = json.dumps(
        {
            "node_id": "00A",
            "meta_id": 1.0,
            "datetime": "2017-01-01T00:00:00",
            "sensor": "HTU21D",
            "network": "n",
            "data": json.dumps({"temp": 1.5}),
        }
    )
    bad = "{not json"
    raw = spark.createDataFrame(
        [(base64.b64encode(good.encode()).decode(),),
         (base64.b64encode(bad.encode()).decode(),)],
        "data string",
    )
    out = decode_kinesis_records(raw)
    rows = out.collect()
    ok = [r for r in rows if r["_corrupt"] is None]
    corrupt = [r for r in rows if r["_corrupt"] is not None]
    assert len(ok) == 1 and ok[0]["sensor"] == "HTU21D"
    assert len(corrupt) == 1 and "not json" in corrupt[0]["_corrupt"]


def test_streaming_stream_stream_join_with_watermarks(spark, tmp_path):
    """Watermarked stream-stream inner join (SURVEY §2.F declared surface):
    impressions joined to clicks within a 30-min event-time interval. Both
    sides carry watermarks so the join state is bounded — the shape that holds
    at 100 TB (state eviction by watermark, not unbounded buffering)."""
    imp_dir = tmp_path / "ss_imp"
    clk_dir = tmp_path / "ss_clk"
    imp_dir.mkdir()
    clk_dir.mkdir()
    imps = [
        {"ad_id": 1, "imp_ts": "2024-01-01T00:00:00"},
        {"ad_id": 2, "imp_ts": "2024-01-01T00:05:00"},
        {"ad_id": 3, "imp_ts": "2024-01-01T01:00:00"},
    ]
    clks = [
        {"ad_id": 1, "clk_ts": "2024-01-01T00:10:00"},  # in window
        {"ad_id": 2, "clk_ts": "2024-01-01T02:00:00"},  # too late (>30min)
        {"ad_id": 3, "clk_ts": "2024-01-01T01:20:00"},  # in window
    ]
    with open(imp_dir / "a.json", "w") as f:
        for r in imps:
            f.write(json.dumps(r) + "\n")
    with open(clk_dir / "a.json", "w") as f:
        for r in clks:
            f.write(json.dumps(r) + "\n")

    impressions = (
        spark.readStream.schema("ad_id long, imp_ts string")
        .json(str(imp_dir))
        .withColumn("imp_ts", F.to_timestamp("imp_ts"))
        .withWatermark("imp_ts", "1 hour")
    )
    clicks = (
        spark.readStream.schema("ad_id long, clk_ts string")
        .json(str(clk_dir))
        .withColumn("clk_ts", F.to_timestamp("clk_ts"))
        .withWatermark("clk_ts", "1 hour")
    )
    joined = impressions.join(
        clicks,
        (impressions.ad_id == clicks.ad_id)
        & (clicks.clk_ts >= impressions.imp_ts)
        & (clicks.clk_ts <= impressions.imp_ts + F.expr("INTERVAL 30 MINUTES")),
    ).select(impressions.ad_id, "imp_ts", "clk_ts")
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r["ad_id"] for r in spark.sql("SELECT ad_id FROM ss_join_out").collect()
    )
    assert got == [1, 3]


def test_streaming_watermark_drops_late_data(spark, tmp_path):
    """Late-data handling: with a 10-minute watermark on a tumbling window, an
    event arriving in a later batch whose event time is beyond the watermark is
    DROPPED (its window has already been finalized and emitted in append mode).
    Two source files processed as separate micro-batches force the watermark to
    advance between them."""
    src = tmp_path / "late_in"
    src.mkdir()
    with open(src / "a.json", "w") as f:
        f.write(json.dumps({"k": 1, "ts": "2024-01-01T00:05:00"}) + "\n")
        f.write(json.dumps({"k": 1, "ts": "2024-01-01T01:30:00"}) + "\n")
    stream = (
        spark.readStream.schema("k long, ts string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    chk = str(tmp_path / "late_chk")
    out = str(tmp_path / "late_out")
    flat = stream.select(F.col("w.start").alias("w_start"), "n")

    def run_once():
        q = (
            flat.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # watermark now 01:20; the 00:00-01:00 window is finalized with n=1
    with open(src / "b.json", "w") as f:
        f.write(json.dumps({"k": 1, "ts": "2024-01-01T00:10:00"}) + "\n")  # late
        f.write(json.dumps({"k": 1, "ts": "2024-01-01T01:45:00"}) + "\n")  # on time
    run_once()
    rows = {
        (r["w_start"].isoformat(), r["n"])
        for r in spark.read.parquet(out).collect()
    }
    # the finalized 00:00 window emitted once with n=1; the late 00:10 event
    # must not re-emit it or bump its count
    assert ("2024-01-01T00:00:00", 1) in rows
    assert not any(s.startswith("2024-01-01T00:00") and n == 2 for s, n in rows)


def test_streaming_incremental_rollup_maintenance(spark, tmp_path):
    """The H17 maintained-aggregate lifecycle as a real stream: each
    foreachBatch folds its micro-batch into the persisted day-partitioned
    rollup (update_rollup), new files arriving between runs become new
    micro-batches via the checkpoint, and after all batches the maintained
    rollup equals a full recompute over everything ingested — including a
    late row that lands in an already-written day partition."""
    import os

    from plenario_mapper_spark.operators import incremental as IC

    src = tmp_path / "roll_in"
    src.mkdir()
    rollup_path = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "roll_ckpt")

    def run_once():
        stream = (
            spark.readStream.schema("ts string, event_type string, value double")
            .json(str(src))
            .withColumn("ts", F.to_timestamp("ts"))
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda batch, _bid: IC.update_rollup(spark, rollup_path, batch)
                if batch.count()
                else None
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    batch1 = [
        {"ts": "2024-01-01T01:00:00", "event_type": "click", "value": 1.5},
        {"ts": "2024-01-01T02:00:00", "event_type": "view", "value": 4.0},
    ]
    batch2 = [
        {"ts": "2024-01-02T01:00:00", "event_type": "click", "value": 10.0},
        {"ts": "2024-01-01T23:00:00", "event_type": "click", "value": 0.5},  # late
    ]
    with open(src / "b1.json", "w") as f:
        for r in batch1:
            f.write(json.dumps(r) + "\n")
    run_once()
    with open(src / "b2.json", "w") as f:
        for r in batch2:
            f.write(json.dumps(r) + "\n")
    run_once()

    all_rows = (
        spark.read.schema("ts string, event_type string, value double")
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    got = {
        (str(r["day"]), r["event_type"]): (r["n"], float(r["sum_value"]))
        for r in spark.read.parquet(rollup_path).collect()
    }
    want = {
        (str(r["day"]), r["event_type"]): (r["n"], float(r["sum_value"]))
        for r in IC.daily_rollup(all_rows).collect()
    }
    assert got == want
    assert got[("2024-01-01", "click")] == (2, 2.0)  # late row merged into day 1


def test_streaming_quality_gate_quarantines_bad_batches(spark, tmp_path):
    """Batch-level circuit breaker (H15 wired into ingest): a micro-batch
    violating the constraint battery diverts WHOLE to quarantine with its
    failure report; clean batches reach the sink; the stream keeps running
    through both."""
    import os

    from plenario_mapper_spark.operators.quality import Check
    from plenario_mapper_spark.streaming.gate import gated_foreach_batch

    src = tmp_path / "gate_in"
    src.mkdir()
    sink_dir = str(tmp_path / "sink")
    qdir = str(tmp_path / "quarantine")
    ckpt = str(tmp_path / "gate_ckpt")

    checks = [
        Check("k_not_null", "not_null", cols=("k",)),
        Check("k_unique", "unique", cols=("k",)),
    ]
    sunk = []

    def on_pass(batch, batch_id):
        sunk.append(batch_id)
        batch.write.mode("append").parquet(sink_dir)

    def run_once():
        stream = spark.readStream.schema("k long, v string").json(str(src))
        q = (
            stream.writeStream.foreachBatch(
                gated_foreach_batch(checks, on_pass, qdir)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    with open(src / "good.json", "w") as f:
        f.write(json.dumps({"k": 1, "v": "a"}) + "\n")
        f.write(json.dumps({"k": 2, "v": "b"}) + "\n")
    run_once()
    with open(src / "bad.json", "w") as f:
        f.write(json.dumps({"k": 3, "v": "c"}) + "\n")
        f.write(json.dumps({"k": 3, "v": "dup"}) + "\n")  # uniqueness breach
    run_once()

    assert spark.read.parquet(sink_dir).count() == 2  # only the clean batch
    qbatches = [d for d in os.listdir(qdir)] if os.path.isdir(qdir) else []
    assert len(qbatches) == 1
    qdata = spark.read.parquet(os.path.join(qdir, qbatches[0], "data"))
    assert qdata.count() == 2
    with open(os.path.join(qdir, qbatches[0], "report.json")) as f:
        report = {r["check_name"]: r for r in json.load(f)}
    assert report["k_unique"]["passed"] is False
    assert report["k_unique"]["violations"] == 1
    assert report["k_not_null"]["passed"] is True


def test_streaming_progress_recorder_captures_batches(spark, tmp_path):
    """Observability: the listener materializes per-batch progress as rows a
    SQL rollup can consume — batch ids, input row counts, durations."""
    import time

    from plenario_mapper_spark.streaming.observability import (
        ProgressRecorder,
        throughput_summary,
    )

    src = tmp_path / "obs_in"
    src.mkdir()
    with open(src / "a.json", "w") as f:
        for i in range(10):
            f.write(json.dumps({"k": i}) + "\n")

    rec = ProgressRecorder()
    spark.streams.addListener(rec)
    try:
        q = (
            spark.readStream.schema("k long").json(str(src))
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "obs_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener delivery is async; give the event bus a moment
        for _ in range(40):
            if rec.rows:
                break
            time.sleep(0.25)
    finally:
        spark.streams.removeListener(rec)
    assert rec.rows, "no progress events captured"
    df = rec.to_df(spark)
    got = df.collect()
    assert sum(r["num_input_rows"] for r in got) == 10
    assert all(r["query_id"] is not None for r in got)
    summary = throughput_summary(df).collect()
    assert summary[0]["total_rows"] == 10
    assert summary[0]["n_batches"] >= 1


def test_streaming_sliding_window_watermark(spark, tmp_path):
    """Hopping windows (2h size / 1h slide) as a true stream: each event must
    appear in exactly two overlapping windows under a watermark — the
    streaming twin of the batch q_events_sliding_window."""
    src = tmp_path / "sliding_in"
    src.mkdir()
    rows = [
        {"k": "a", "ts": "2024-01-01T00:15:00", "v": 1.0},
        {"k": "a", "ts": "2024-01-01T01:45:00", "v": 2.0},
        {"k": "b", "ts": "2024-01-01T00:30:00", "v": 4.0},
    ]
    with open(src / "a.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema("k string, ts string, v double")
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sum_v"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sliding_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["k"], str(r["start"])): (r["n"], r["sum_v"])
        for r in spark.sql(
            "SELECT k, w.start AS start, n, sum_v FROM sliding_out"
        ).collect()
    }
    assert got == {
        # a@00:15 -> windows starting 23:00 and 00:00; a@01:45 -> 00:00 and 01:00
        ("a", "2023-12-31 23:00:00"): (1, 1.0),
        ("a", "2024-01-01 00:00:00"): (2, 3.0),
        ("a", "2024-01-01 01:00:00"): (1, 2.0),
        ("b", "2023-12-31 23:00:00"): (1, 4.0),
        ("b", "2024-01-01 00:00:00"): (1, 4.0),
    }


def test_streaming_throttle_per_key_budget(spark, tmp_path):
    """throttle_stream: per-key budget of 2 per 60s event-time window across
    TWO micro-batches — state carries the window count over the batch
    boundary (b's third event in batch 2 must still be suppressed), and a
    new window resets the budget."""
    from plenario_mapper_spark.streaming.state import throttle_stream

    src = tmp_path / "throttle_in"
    src.mkdir()
    batch1 = [
        {"key": "a", "seq": 1, "event_sec": 10},
        {"key": "a", "seq": 2, "event_sec": 20},
        {"key": "a", "seq": 3, "event_sec": 30},   # 3rd in window 0 -> blocked
        {"key": "b", "seq": 4, "event_sec": 15},
        {"key": "b", "seq": 5, "event_sec": 40},
    ]
    batch2 = [
        {"key": "b", "seq": 6, "event_sec": 50},   # 3rd in window 0 -> blocked
        {"key": "a", "seq": 7, "event_sec": 70},   # window 60 -> budget reset
        {"key": "a", "seq": 8, "event_sec": 80},
        {"key": "a", "seq": 9, "event_sec": 85},   # 3rd in window 60 -> blocked
    ]
    with open(src / "b1.json", "w") as f:
        for r in batch1:
            f.write(json.dumps(r) + "\n")

    stream = throttle_stream(
        spark.readStream.schema("key string, seq long, event_sec long").json(
            str(src)
        ),
        limit=2,
        window_seconds=60,
    )
    ckpt = str(tmp_path / "throttle_ckpt")
    out_dir = str(tmp_path / "throttle_out")

    def run_once():
        # parquet (not memory) sink: memory sinks cannot recover from a
        # checkpoint, and the restart IS what this test exercises
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    with open(src / "b2.json", "w") as f:
        for r in batch2:
            f.write(json.dumps(r) + "\n")
    run_once()

    got = {
        r["seq"]: (r["passed"], r["n_in_window"], r["window_start"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {
        1: (True, 1, 0), 2: (True, 2, 0), 3: (False, 3, 0),
        4: (True, 1, 0), 5: (True, 2, 0),
        6: (False, 3, 0),                     # state crossed the batch boundary
        7: (True, 1, 60), 8: (True, 2, 60), 9: (False, 3, 60),
    }


def test_streaming_session_finalizer_emits_only_closed_sessions(spark, tmp_path):
    """Timer-based session close: batch 1 opens sessions; nothing is emitted
    for a session still inside its gap. Batch 2 advances the event-time
    watermark far past user 1's horizon — the TIMEOUT (no new user-1
    event; user 2's events drive the watermark) must flush user 1's
    session; user 2's own over-gap event closes its first session inline.
    Timestamps sit on a nonzero base: a row at exactly epoch 0 equals the
    stream's initial watermark and is dropped as late."""
    from plenario_mapper_spark.streaming.state import session_finalizer

    B = 100000
    src = tmp_path / "sessfin_in"
    src.mkdir()
    b1 = [
        {"user_id": 1, "event_sec": B + 0},
        {"user_id": 1, "event_sec": B + 100},   # same session (gap 300)
        {"user_id": 2, "event_sec": B + 50},
    ]
    b2 = [
        {"user_id": 2, "event_sec": B + 5000},  # inline-closes user 2's first
        {"user_id": 2, "event_sec": B + 9000},  # advances watermark way past u1
    ]
    with open(src / "b1.json", "w") as f:
        for r in b1:
            f.write(json.dumps(r) + "\n")

    stream = session_finalizer(
        spark.readStream.schema("user_id long, event_sec long")
        .json(str(src))
        .withColumn("ts", F.timestamp_seconds("event_sec"))
        .withWatermark("ts", "10 seconds"),
        gap_seconds=300,
    )
    ckpt = str(tmp_path / "sessfin_ckpt")
    out_dir = str(tmp_path / "sessfin_out")

    def run_once():
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = spark.read.parquet(out_dir).collect()
    assert first == []  # all sessions still open inside their gap
    with open(src / "b2.json", "w") as f:
        for r in b2:
            f.write(json.dumps(r) + "\n")
    run_once()
    # a further batch with fresh data: availableNow runs no batch on an empty
    # source, and timers only fire inside a batch — an unrelated user's event
    # provides the tick for any timer the second run left pending
    with open(src / "b3.json", "w") as f:
        f.write(json.dumps({"user_id": 3, "event_sec": B + 20000}) + "\n")
    run_once()

    got = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got[(1, B + 0)] == (B + 100, 2)   # closed by TIMER, no new u1 event
    assert got[(2, B + 50)] == (B + 50, 1)   # closed inline by the +5000s event


def test_throttle_stream_matches_batch_window_rank(spark, tmp_path):
    """Backfill/live agreement (the q_events_throttle_batch contract): the
    stateful streaming fold and the batch ROW_NUMBER formulation must yield
    identical per-event verdicts on the same input."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from plenario_mapper_spark.streaming.state import throttle_stream

    rng = random.Random(11)
    rows = [
        {"key": f"k{rng.randrange(5)}", "seq": i, "event_sec": rng.randrange(0, 300)}
        for i in range(200)
    ]
    src = tmp_path / "thr_parity_in"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = throttle_stream(
        spark.readStream.schema("key string, seq long, event_sec long").json(str(src)),
        limit=3,
        window_seconds=60,
    )
    out_dir = str(tmp_path / "thr_parity_out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "thr_parity_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_verdicts = {
        r["seq"]: r["passed"] for r in spark.read.parquet(out_dir).collect()
    }

    df = spark.createDataFrame(rows)
    w = Window.partitionBy("key", F.expr("event_sec div 60")).orderBy(
        "event_sec", "seq"
    )
    batch_verdicts = {
        r["seq"]: r["passed"]
        for r in df.select(
            "seq", (F.row_number().over(w) <= 3).alias("passed")
        ).collect()
    }
    assert stream_verdicts == batch_verdicts
    assert len(stream_verdicts) == 200
    assert not all(stream_verdicts.values())  # budget actually binds somewhere


def test_session_finalizer_matches_batch_closed_sessions(spark, tmp_path):
    """Backfill/live agreement for the closed-session set (the
    q_events_sessions_closed contract): a full replay through the stateful
    timer-based finalizer must emit exactly the sessions the batch twin
    computes — inline closes and timer closes alike, every open tail
    withheld. Even-second events with an odd gap keep end+gap strictly off
    the watermark so neither engine sits on the fires-at-equality edge."""
    import random

    from plenario_mapper_spark.streaming.state import (
        closed_sessions_batch,
        session_finalizer,
    )

    B = 200000
    rng = random.Random(23)
    rows = [
        {"user_id": u, "event_sec": B + 2 * rng.randrange(0, 2000)}
        for u in range(1, 7)
        for _ in range(20)
    ]
    tick1 = {"user_id": 9001, "event_sec": B + 50000}
    tick2 = {"user_id": 9001, "event_sec": B + 60000}

    src = tmp_path / "sessparity_in"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = session_finalizer(
        spark.readStream.schema("user_id long, event_sec long")
        .json(str(src))
        .withColumn("ts", F.timestamp_seconds("event_sec"))
        .withWatermark("ts", "0 seconds"),
        gap_seconds=301,
    )
    ckpt = str(tmp_path / "sessparity_ckpt")
    out_dir = str(tmp_path / "sessparity_out")

    def run_once():
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # ticks arrive in later batches: the first advances the watermark past
    # every horizon, the second provides the in-batch tick for pending timers
    for i, tick in ((2, tick1), (3, tick2)):
        with open(src / f"b{i}.json", "w") as f:
            f.write(json.dumps(tick) + "\n")
        run_once()

    stream_sessions = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    }
    all_events = spark.createDataFrame(
        [(r["user_id"], r["event_sec"]) for r in rows + [tick1, tick2]],
        "user_id long, event_sec long",
    ).withColumn("ts", F.timestamp_seconds("event_sec"))
    batch_sessions = {
        (
            r["user_id"],
            int(r["session_start"].timestamp()),
            int(r["session_end"].timestamp()),
            r["n_events"],
        )
        for r in closed_sessions_batch(all_events, gap_seconds=301).collect()
    }
    assert stream_sessions == batch_sessions
    assert len(stream_sessions) > 10  # non-vacuous: real session structure


def test_kinesis_wire_format_end_to_end(spark, tmp_path, sinks):
    """The FULL A1->A6 chain in the connector's wire format without the
    connector: CANONICAL_OBS base64-wrapped exactly as the Kinesis frame
    delivers them (kcl_app.js:38,44) plus two malformed records, replayed via
    kinesis_replay_source -> decode_kinesis_records -> MapperStream. The
    mapper outputs must be IDENTICAL to the plain-JSON e2e run (7 feature
    rows / 4 dead letters / 7 emits), and the malformed records land in a
    corrupt sink with their raw text preserved — never in the pipeline,
    never killing the stream."""
    import base64

    from plenario_mapper_spark.sources import kinesis_replay_source

    src_dir = tmp_path / "wire"
    src_dir.mkdir()
    lines = []
    for n, m, d, s, net, data in CANONICAL_OBS:
        rec = json.dumps(
            {
                "node_id": n, "meta_id": m, "datetime": d,
                "sensor": s, "network": net, "data": json.dumps(data),
            }
        )
        lines.append(base64.b64encode(rec.encode()).decode())
    lines.insert(3, base64.b64encode(b"{definitely not json").decode())
    lines.append(base64.b64encode(b"\x00\xff binary garbage").decode())
    (src_dir / "records.txt").write_text("\n".join(lines) + "\n")

    decoded = decode_kinesis_records(kinesis_replay_source(spark, str(src_dir)))
    corrupt_dir = str(tmp_path / "corrupt")
    valid = decoded.filter(F.col("_corrupt").isNull()).drop("_corrupt")

    stream = MapperStream(spark, _metadata_provider, sinks)

    def batch(df, bid):
        df.persist()
        df.filter(F.col("_corrupt").isNotNull()).select("_corrupt").write.mode(
            "append"
        ).json(corrupt_dir)
        stream.process_batch(df.filter(F.col("_corrupt").isNull()).drop("_corrupt"), bid)
        df.unpersist()

    _ = valid  # the corrupt split happens inside the batch body (single pass)
    q = (
        decoded.writeStream.foreachBatch(batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    feature_total = sum(
        spark.read.parquet(os.path.join(sinks.lake_dir, feat)).count()
        for feat in os.listdir(sinks.lake_dir)
    )
    assert feature_total == 7
    assert spark.read.parquet(sinks.dead_letter_dir).count() == 4
    assert spark.read.json(sinks.emit_dir).count() == 7
    corrupt = spark.read.json(corrupt_dir).collect()
    assert len(corrupt) == 2
    assert any("definitely not json" in r["_corrupt"] for r in corrupt)
