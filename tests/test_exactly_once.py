"""Exactly-once foreachBatch ledger: skip-on-replay, commit ordering, and the
non-idempotent-merge redelivery scenario it exists for."""

import json

import pyspark.sql.functions as F

from plenario_mapper_spark.streaming.exactly_once import idempotent_foreach_batch


def test_wrapper_applies_once_per_batch_id(spark, tmp_path):
    applied = []
    wrapped = idempotent_foreach_batch(
        lambda df, bid: applied.append(bid), str(tmp_path / "ledger")
    )
    df = spark.range(1)
    wrapped(df, 0)
    wrapped(df, 0)  # redelivery: must not re-apply
    wrapped(df, 1)
    wrapped(df, 1)
    assert applied == [0, 1]


def test_marker_written_after_body(spark, tmp_path):
    """A body crash must leave NO marker (the batch re-applies on replay) —
    the ledger records completion, not attempts."""
    ledger = tmp_path / "ledger"

    def exploding(df, bid):
        raise RuntimeError("sink down")

    wrapped = idempotent_foreach_batch(exploding, str(ledger))
    try:
        wrapped(spark.range(1), 7)
    except RuntimeError:
        pass
    assert not list(ledger.glob("batch_7.done"))
    # recovery: the fixed body applies and commits
    ok = idempotent_foreach_batch(lambda df, bid: None, str(ledger))
    ok(spark.range(1), 7)
    assert list(ledger.glob("batch_7.done"))


def test_rollup_redelivery_does_not_double_merge(spark, tmp_path):
    """The H17 rollup is read-merge-overwrite — NOT idempotent under replay.
    Stream it through the ledger, then wipe the checkpoint so availableNow
    redelivers everything under already-committed batch ids: the maintained
    rollup must be byte-identical, not doubled."""
    import shutil

    from plenario_mapper_spark.operators import incremental as IC

    src = tmp_path / "in"
    src.mkdir()
    rollup_path = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    ledger = str(tmp_path / "ledger")

    with open(src / "b1.json", "w") as f:
        for r in [
            {"ts": "2024-01-01T01:00:00", "event_type": "click", "value": 1.5},
            {"ts": "2024-01-02T01:00:00", "event_type": "view", "value": 4.0},
        ]:
            f.write(json.dumps(r) + "\n")

    def run_once():
        stream = (
            spark.readStream.schema("ts string, event_type string, value double")
            .json(str(src))
            .withColumn("ts", F.to_timestamp("ts"))
        )
        body = idempotent_foreach_batch(
            lambda batch, _bid: IC.update_rollup(spark, rollup_path, batch),
            ledger,
        )
        q = (
            stream.writeStream.foreachBatch(body)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    before = {
        (str(r["day"]), r["event_type"]): (r["n"], float(r["sum_value"]))
        for r in spark.read.parquet(rollup_path).collect()
    }
    assert before[("2024-01-01", "click")] == (1, 1.5)

    # crash-and-lose-the-checkpoint: same source, same batch ids, full replay
    shutil.rmtree(ckpt)
    run_once()
    after = {
        (str(r["day"]), r["event_type"]): (r["n"], float(r["sum_value"]))
        for r in spark.read.parquet(rollup_path).collect()
    }
    assert after == before  # without the ledger this doubles to (2, 3.0)
