"""Stream-time KMV sketches (streaming/sketch_stream.KmvStream): the fold
driven by a REAL Structured Streaming file source, stream == one-shot batch
sketch per label (the KMV composition property), replay idempotency, and
restart from persisted state."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from plenario_mapper_spark.operators import sketches as SK
from plenario_mapper_spark.streaming.sketch_stream import KmvStream

K = 32


def _rows(lo, hi, label):
    return [(label, i) for i in range(lo, hi)]


def _corpus():
    # two overlapping audiences arriving interleaved across batches
    b0 = _rows(0, 700, "A") + _rows(400, 900, "B")
    b1 = _rows(500, 1_200, "A") + _rows(800, 1_500, "B")
    b2 = _rows(100, 600, "A") + _rows(1_400, 2_000, "B")  # re-deliveries of keys too
    return [b0, b1, b2]


def _stage_batches(spark, tmp_path, batches):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for i, rows in enumerate(batches):
        stage = str(tmp_path / f"stage{i}")
        spark.createDataFrame(rows, "label string, key long").coalesce(1).write.parquet(
            stage
        )
        part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        shutil.copy(os.path.join(stage, part), os.path.join(in_dir, f"b{i}.parquet"))
    return in_dir


def _batch_sketch(spark, batches, label):
    all_rows = [r for b in batches for r in b if r[0] == label]
    df = spark.createDataFrame(all_rows, "label string, key long")
    return [r["h"] for r in SK.kmv_sketch(df, "key", K).collect()]


def test_stream_equals_one_shot_batch_sketch(spark, tmp_path):
    batches = _corpus()
    in_dir = _stage_batches(spark, tmp_path, batches)
    stream = KmvStream(spark, str(tmp_path / "state"), "label", "key", k=K)
    src = (
        spark.readStream.schema("label string, key long")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    stream.start(src, str(tmp_path / "chk")).awaitTermination()
    assert stream._sketch_ids() == [0, 1, 2]
    for label in ("A", "B"):
        got = [r["h"] for r in stream.sketch(label).collect()]
        assert got == _batch_sketch(spark, batches, label)


def test_overlap_matches_batch_overlap_stats(spark, tmp_path):
    batches = _corpus()
    stream = KmvStream(spark, str(tmp_path / "state"), "label", "key", k=K)
    for i, rows in enumerate(batches):
        stream.process_batch(
            spark.createDataFrame(rows, "label string, key long"), i
        )
    got = stream.overlap("A", "B").collect()[0]
    all_rows = [r for b in batches for r in b]
    df = spark.createDataFrame(all_rows, "label string, key long")
    ska = SK.kmv_sketch(df.filter(F.col("label") == "A"), "key", K)
    skb = SK.kmv_sketch(df.filter(F.col("label") == "B"), "key", K)
    want = SK.kmv_overlap_stats(ska, skb, K).collect()[0]
    assert got.asDict() == want.asDict()
    # sanity: true overlap exists and the estimate sees it
    assert 0.0 < got["est_jaccard"] < 1.0


def test_replayed_batch_is_idempotent(spark, tmp_path):
    batches = _corpus()
    stream = KmvStream(spark, str(tmp_path / "state"), "label", "key", k=K)
    for i, rows in enumerate(batches):
        stream.process_batch(
            spark.createDataFrame(rows, "label string, key long"), i
        )
    before = {
        lab: [r["h"] for r in stream.sketch(lab).collect()] for lab in ("A", "B")
    }
    # crash-replay of the LAST batch: at-least-once re-delivery of (df, 2)
    stream.process_batch(
        spark.createDataFrame(batches[2], "label string, key long"), 2
    )
    after = {
        lab: [r["h"] for r in stream.sketch(lab).collect()] for lab in ("A", "B")
    }
    assert before == after


def test_restart_resumes_from_persisted_state(spark, tmp_path):
    batches = _corpus()
    s1 = KmvStream(spark, str(tmp_path / "state"), "label", "key", k=K)
    s1.process_batch(spark.createDataFrame(batches[0], "label string, key long"), 0)
    s1.process_batch(spark.createDataFrame(batches[1], "label string, key long"), 1)
    # a fresh instance (process restart) picks up where s1 left off
    s2 = KmvStream(spark, str(tmp_path / "state"), "label", "key", k=K)
    s2.process_batch(spark.createDataFrame(batches[2], "label string, key long"), 2)
    for label in ("A", "B"):
        got = [r["h"] for r in s2.sketch(label).collect()]
        assert got == _batch_sketch(spark, batches, label)


def test_empty_state_before_any_batch(spark, tmp_path):
    stream = KmvStream(spark, str(tmp_path / "state0"), "label", "key", k=K)
    assert stream.sketch("A").collect() == []


def test_rejects_bad_k(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        KmvStream(spark, str(tmp_path / "state"), "label", "key", k=1)
