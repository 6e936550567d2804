"""State-store cardinality soak (VERDICT r12 item 4): session_finalizer at
~10^6 keys under the RocksDB state store.

The stateful operators (streaming/state.py) are semantics-tested; this tool
pins the CARDINALITY story the 100 TB design claims: state sharded by the
store, memory bounded per executor, eviction actually reclaiming closed
sessions, and restart-from-checkpoint cost proportional to state size, not
stream history.

Harness: the deterministic `rate-micro-batch` source (fixed rowsPerBatch,
fixed event-time advance per batch — replayable, no wall-clock coupling)
keyed `value % n_keys` drives session_finalizer(gap) with a watermark whose
advance closes older sessions as batches progress, so the run exercises the
full lifecycle: state GROWTH (new keys), timer FIRES (closed sessions
emitted with no new event for the key), and state EVICTION (removed rows).
Per batch we record the progress JSON's stateOperators block — numRowsTotal,
numRowsUpdated, numRowsRemoved, memoryUsedBytes and the RocksDB
customMetrics (SST sizes, compaction counters) — then stop mid-stream and
RESTART from the checkpoint, timing recovery to first completed batch.

Output: one JSON line (paste into PERF_NOTES.md) + per-batch detail on
stderr.

Usage: python tools/state_soak.py [n_batches] [rows_per_batch]
       defaults 14 x 100,000 rows -> ~10^6 open sessions at peak, then the
       eviction phase (see lifecycle note below)
       env: SPARK_GRAFT_CPUS (default 8), STATE_SOAK_PROVIDER=rocksdb|hdfs
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_KEYS = 1_000_000
# Lifecycle tuning: 10 batches x 100k sequential values grow state to ~1M
# open sessions (one per key); with gap=80s and event time advancing 10s
# per batch, batch-0 sessions hit their timer horizon around batch 9-10 —
# so the default 14-batch run shows growth to the ~10^6-row peak AND the
# eviction/closure phase (timer fires + inline closes on key reuse past
# the 1M wrap), which is what pins compaction behavior.
GAP_SECONDS = 80
ADVANCE_MS_PER_BATCH = 10_000  # event time moves 10s per batch
WATERMARK = "5 seconds"


def _state_ops(progress: dict) -> dict:
    ops = progress.get("stateOperators") or []
    if not ops:
        return {}
    op = ops[0]
    keep = {
        k: op.get(k)
        for k in (
            "numRowsTotal",
            "numRowsUpdated",
            "numRowsRemoved",
            "memoryUsedBytes",
        )
    }
    cm = op.get("customMetrics") or {}
    keep["rocksdb"] = {
        k: cm[k]
        for k in sorted(cm)
        if k
        in (
            "rocksdbSstFileSize",
            "rocksdbTotalMemoryUsageBytes",
            "rocksdbTotalCompactionLatencyMs",
            "rocksdbCommitCompactLatency",
            "rocksdbBytesCopied",
            "rocksdbFilesCopied",
        )
    }
    return keep


def _start(spark, ckpt: str, n_keys: int, rows_per_batch: int):
    from pyspark.sql import functions as F

    from plenario_mapper_spark.streaming.state import session_finalizer

    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("numPartitions", int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
        .option("startTimestamp", 0)
        .option("advanceMillisPerBatch", ADVANCE_MS_PER_BATCH)
        .load()
    )
    events = (
        src.withWatermark("timestamp", WATERMARK)
        .select(
            (F.col("value") % n_keys).alias("user_id"),
            F.unix_timestamp("timestamp").alias("event_sec"),
            F.col("timestamp").alias("ts"),
        )
    )
    closed = session_finalizer(events, GAP_SECONDS)
    return (
        closed.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )


def _drain(query, n_batches: int, detail: list[dict], t_deadline: float) -> int:
    """Wait until n_batches NEW batches complete; return rows emitted."""
    seen: set[int] = set()
    last_len = 0
    while len(seen) < n_batches and time.monotonic() < t_deadline:
        time.sleep(0.3)
        for p in query.recentProgress[last_len:]:
            if p["batchId"] in seen:
                continue
            seen.add(p["batchId"])
            row = {
                "batchId": p["batchId"],
                "inputRows": p["numInputRows"],
                "batchMs": (p.get("durationMs") or {}).get("triggerExecution"),
                **_state_ops(p),
            }
            detail.append(row)
            print(f"# batch {json.dumps(row)}", file=sys.stderr)
        last_len = len(query.recentProgress)
    return len(seen)


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    rows_per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    provider = os.environ.get("STATE_SOAK_PROVIDER", "rocksdb")

    from plenario_mapper_spark.session import get_spark

    spark = get_spark(app_name="state-soak")
    spark.sparkContext.setLogLevel("ERROR")
    if provider == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        # changelog checkpointing: restart replays the changelog instead of
        # re-downloading full snapshots — the production restart path
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing."
            "enabled",
            "true",
        )
    ckpt = tempfile.mkdtemp(prefix="state_soak_ckpt_")
    detail: list[dict] = []
    try:
        t0 = time.monotonic()
        q = _start(spark, ckpt, N_KEYS, rows_per_batch)
        done = _drain(q, n_batches, detail, t0 + 600)
        q.stop()
        q.awaitTermination(30)
        phase1_s = round(time.monotonic() - t0, 1)

        # RESTART from checkpoint: recovery must reload ~1M-key state before
        # the first new batch commits — the number that decides whether a
        # 1000-executor failover is seconds or minutes.
        t1 = time.monotonic()
        q2 = _start(spark, ckpt, N_KEYS, rows_per_batch)
        restart_detail: list[dict] = []
        _drain(q2, 2, restart_detail, t1 + 300)
        restart_s = round(time.monotonic() - t1, 1)
        q2.stop()
        q2.awaitTermination(30)

        tot_rows = sum(d["inputRows"] for d in detail)
        peak = max((d.get("numRowsTotal") or 0) for d in detail)
        peak_mem = max((d.get("memoryUsedBytes") or 0) for d in detail)
        removed = sum(d.get("numRowsRemoved") or 0 for d in detail)
        out = {
            "metric": "state_soak_session_finalizer",
            "provider": provider,
            "n_batches": done,
            "rows": tot_rows,
            "distinct_keys_touched": min(tot_rows, N_KEYS),
            "peak_state_rows": peak,
            "peak_state_memory_mb": round(peak_mem / 1e6, 1),
            "state_rows_removed": removed,
            "soak_wall_s": phase1_s,
            "rows_per_sec": round(tot_rows / phase1_s) if phase1_s else None,
            "restart_to_batch_s": restart_s,
            "restart_state_rows": (restart_detail[0].get("numRowsTotal")
                                   if restart_detail else None),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
