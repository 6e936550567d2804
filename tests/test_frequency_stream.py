"""Stream-time heavy hitters (streaming/frequency_stream.HeavyHittersStream):
the Misra-Gries fold driven by a REAL Structured Streaming file source, its
guarantees certified against exact counts over everything ingested, plus the
replayed-micro-batch idempotency the at-least-once foreachBatch contract
requires."""

from __future__ import annotations

import collections
import os
import shutil

import numpy as np
import pytest

from plenario_mapper_spark.streaming.frequency_stream import HeavyHittersStream

K = 32


def _zipf_corpus(n=9_000, vocab=400, seed=23):
    rng = np.random.default_rng(seed)
    w = 1.0 / np.arange(1, vocab + 1)
    items = rng.choice(vocab, size=n, p=w / w.sum())
    return [f"tok{int(i):04d}" for i in items]


def _stage_batches(spark, tmp_path, corpus, n_batches=3):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    step = len(corpus) // n_batches
    for i in range(n_batches):
        chunk = corpus[i * step : (i + 1) * step if i < n_batches - 1 else len(corpus)]
        stage = str(tmp_path / f"stage{i}")
        spark.createDataFrame([(t,) for t in chunk], "tok string").coalesce(
            1
        ).write.parquet(stage)
        part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        shutil.copy(os.path.join(stage, part), os.path.join(in_dir, f"b{i}.parquet"))
    return in_dir


def _assert_guarantees(stream, corpus):
    true = collections.Counter(corpus)
    est = {r["item"]: r["est"] for r in stream.summary().collect()}
    total_dec, n_seen = stream.bounds()
    assert n_seen == len(corpus)
    assert total_dec <= n_seen // (K + 1)
    assert len(est) <= K
    for item, e in est.items():
        assert e <= true[item]
        assert true[item] - e <= total_dec
    for item, t in true.items():
        if t > total_dec:
            assert item in est and est[item] > 0
    return est, total_dec


def test_stream_fold_keeps_guarantees_over_all_batches(spark, tmp_path):
    corpus = _zipf_corpus()
    in_dir = _stage_batches(spark, tmp_path, corpus)
    stream = HeavyHittersStream(spark, str(tmp_path / "state"), "tok", k=K)
    src = (
        spark.readStream.schema("tok string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    stream.start(src, str(tmp_path / "chk")).awaitTermination()
    # three summary partitions: one fold per micro-batch
    assert stream._summary_ids() == [0, 1, 2]
    est, total_dec = _assert_guarantees(stream, corpus)
    assert total_dec > 0  # vocab >> k: the stream actually pruned


def test_replayed_batch_is_idempotent(spark, tmp_path):
    corpus = _zipf_corpus(n=4_000, vocab=200, seed=5)
    stream = HeavyHittersStream(spark, str(tmp_path / "state"), "tok", k=K)
    third = len(corpus) // 3
    batches = [corpus[:third], corpus[third : 2 * third], corpus[2 * third :]]
    for i, chunk in enumerate(batches):
        stream.process_batch(
            spark.createDataFrame([(t,) for t in chunk], "tok string"), i
        )
    est_once = {r["item"]: r["est"] for r in stream.summary().collect()}
    bounds_once = stream.bounds()
    # crash-replay of the LAST batch: at-least-once re-delivery of (df, 2)
    stream.process_batch(
        spark.createDataFrame([(t,) for t in batches[2]], "tok string"), 2
    )
    est_again = {r["item"]: r["est"] for r in stream.summary().collect()}
    assert est_again == est_once
    assert stream.bounds() == bounds_once
    _assert_guarantees(stream, corpus)


def test_restart_resumes_from_persisted_state(spark, tmp_path):
    corpus = _zipf_corpus(n=4_000, vocab=200, seed=9)
    half = len(corpus) // 2
    s1 = HeavyHittersStream(spark, str(tmp_path / "state"), "tok", k=K)
    s1.process_batch(
        spark.createDataFrame([(t,) for t in corpus[:half]], "tok string"), 0
    )
    # a NEW instance over the same state dir (driver restart)
    s2 = HeavyHittersStream(spark, str(tmp_path / "state"), "tok", k=K)
    s2.process_batch(
        spark.createDataFrame([(t,) for t in corpus[half:]], "tok string"), 1
    )
    _assert_guarantees(s2, corpus)


def test_empty_state_before_any_batch(spark, tmp_path):
    stream = HeavyHittersStream(spark, str(tmp_path / "state"), "tok", k=K)
    assert stream.summary().collect() == []
    assert stream.bounds() == (0, 0)


def test_rejects_bad_k(spark, tmp_path):
    with pytest.raises(ValueError):
        HeavyHittersStream(spark, str(tmp_path / "state"), "tok", k=0)
