"""Kinesis observation source as a PySpark Python Data Source (SURVEY §2.A A1).

The reference consumes AWS Kinesis through the KCL MultiLangDaemon — a
single-node, per-shard polling loop with sequence-number checkpoints
(/root/reference/app/consumer/kcl_app.js:28-60, lease/checkpoint plumbing in
app/lib/kcl/kcl_manager.js:160-341). This module is the same consumption
model expressed as a Structured Streaming source via PySpark 4's
`pyspark.sql.datasource` API (public, in-box, no connector jar needed):

- offsets are per-shard sequence numbers — exactly KCL's checkpoint unit —
  so `checkpointLocation` gives restart/resume and the at-least-once
  replay contract F1 pins;
- each micro-batch polls every open shard from its last committed sequence
  number with GetRecords until caught up (MillisBehindLatest == 0), capped
  by `max_records_per_shard` per batch (the backpressure knob, mirroring
  the connector option maxRecordsPerFetch);
- shard lifecycle (F2): ListShards runs every batch; a shard that closes
  (resharding: split/merge) drains to its ending sequence number and is
  marked terminal, and its children are only opened AFTER the parent
  drains — KCL's parent-first ordering rule, which preserves per-key
  ordering across a reshard;
- replayability: `readBetweenOffsets` re-reads a committed range
  deterministically (AT_SEQUENCE_NUMBER → end), which is what makes the
  WAL-backed exactly-once-per-batch contract hold on restart.

Scale shape (the honest version): this reader polls on the driver, which is
ALSO the reference's shape (one KCL worker process per box, ~10k records/s
per shard ceiling, BASELINE.md). Kinesis itself caps reads at 2 MB/s/shard,
so the stream's shard count — not Spark — bounds ingest; a driver-side
poller feeding a 32-core local cluster saturates a few dozen shards. For a
1000-shard deployment, slot in the dedicated executor-distributed connector
jar per the SURVEY.md:157-171 recipe — this source is option-compatible
(stream name / region / endpoint / starting position) so the swap is one
`format()` string.

The payload column `data` is the raw record bytes exactly as the Kinesis API
returns them (boto3 delivers the blob already de-base64'd; the base64 step
in the reference lives in the MultiLangDaemon's stdin protocol, kcl_app.js:38,
not in the wire payload). `decode_kinesis_records(..., payload_encoding=
"binary")` is the matching A2 decode.

boto3 is an optional dependency: import is deferred to reader construction
and gated, so environments without it can still import this module.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone
from typing import Iterator, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

KINESIS_SCHEMA = StructType(
    [
        StructField("shard_id", StringType()),
        StructField("sequence_number", StringType()),
        StructField("partition_key", StringType()),
        StructField("approximate_arrival", TimestampType()),
        StructField("data", BinaryType()),
    ]
)

_FORMAT_NAME = "kinesis_py"


class KinesisPyDataSource(DataSource):
    """`spark.readStream.format("kinesis_py")` after
    `spark.dataSource.register(KinesisPyDataSource)`.

    Options:
      stream_name          (required) Kinesis stream name
      region               AWS region (default us-east-1)
      endpoint_url         custom endpoint (moto/localstack/VPC endpoint)
      starting_position    trim_horizon (default) | latest
      latest_anchor_margin_sec  clock-skew safety margin subtracted from the
                           LATEST anchor (default 5; see reader docstring)
      max_records_per_shard  per-batch per-shard cap (default 10000)
      aws_access_key_id / aws_secret_access_key   explicit credentials
                           (default: boto3's standard resolution chain)
    """

    @classmethod
    def name(cls) -> str:
        return _FORMAT_NAME

    def schema(self) -> StructType:
        return KINESIS_SCHEMA

    def simpleStreamReader(self, schema: StructType):
        return KinesisSimpleStreamReader(self.options)


class KinesisSimpleStreamReader(SimpleDataSourceStreamReader):
    """Per-shard sequence-number polling reader (KCL consumption model).

    Offset format (JSON dict, one entry per known shard):
        {"shards": {shard_id: {"seq": str|None, "closed": bool[, "ts": float]}}}
    `seq` is the LAST CONSUMED sequence number (None = nothing consumed yet,
    start from the configured starting position); `closed` means the shard
    reached its ending sequence number and will never be polled again.

    LATEST is resolved ONCE, at initialOffset time, to an AT_TIMESTAMP
    anchor (`ts`, epoch seconds) rather than re-deriving a LATEST iterator
    every batch: a per-batch LATEST iterator skips records that arrived
    BETWEEN batches while the shard's offset still says "nothing consumed"
    — a silent data-loss window. AT_TIMESTAMP(query start) is the exact
    "skip history, lose nothing thereafter" semantics (the same resolution
    the Flink/kinesis-sql connectors use).

    Clock-skew guard (ADVICE r11): the anchor compares the DRIVER's clock
    against SERVER-side ApproximateArrivalTimestamp values; if the driver
    runs ahead of Kinesis, records arriving in the skew window at query
    start would be silently skipped. The anchor therefore subtracts
    `latest_anchor_margin_sec` (default 5 s — well past typical NTP drift).
    The trade is explicitly toward at-least-once: up to margin seconds of
    pre-start records are included rather than any post-start record lost;
    downstream dedup (the mapper's exactly-once sink contract keys on the
    record, not arrival) absorbs them the same way it absorbs a replay.
    """

    def __init__(self, options: dict) -> None:
        self._opts = dict(options)
        self._stream = options.get("stream_name") or options.get("streamname")
        if not self._stream:
            raise ValueError("kinesis_py requires option stream_name")
        self._region = options.get("region", "us-east-1")
        self._endpoint = options.get("endpoint_url") or options.get("endpointurl")
        start = (
            options.get("starting_position")
            or options.get("startingposition")
            or "trim_horizon"
        ).upper()
        if start not in ("TRIM_HORIZON", "LATEST"):
            raise ValueError(
                f"starting_position must be trim_horizon or latest, got {start}"
            )
        self._start_pos = start
        self._max_per_shard = int(
            options.get("max_records_per_shard")
            or options.get("maxrecordspershard")
            or 10000
        )
        # Explicit None check (not an `or` chain): a caller passing "" or
        # another falsy-but-present value must fail loudly like a negative
        # does, not silently fall through to the 5.0 default (ADVICE r12).
        margin_raw = options.get(
            "latest_anchor_margin_sec", options.get("latestanchormarginsec")
        )
        self._latest_margin = 5.0 if margin_raw is None else float(margin_raw)
        if self._latest_margin < 0:
            raise ValueError("latest_anchor_margin_sec must be >= 0")
        self._boto = None

    # -- boto3 plumbing -----------------------------------------------------

    def __getstate__(self) -> dict:
        state = dict(self.__dict__)
        state["_boto"] = None  # clients are not picklable; rebuild lazily
        return state

    def _client(self):
        if self._boto is None:
            try:
                import boto3
            except ImportError as exc:  # pragma: no cover - boto3 is baked in
                raise RuntimeError(
                    "kinesis_py needs boto3 on the driver; install it or use "
                    "kinesis_replay_source for wire-format replays"
                ) from exc
            kwargs = {"region_name": self._region}
            if self._endpoint:
                kwargs["endpoint_url"] = self._endpoint
            key = self._opts.get("aws_access_key_id")
            secret = self._opts.get("aws_secret_access_key")
            if key and secret:
                kwargs["aws_access_key_id"] = key
                kwargs["aws_secret_access_key"] = secret
            self._boto = boto3.client("kinesis", **kwargs)
        return self._boto

    def _list_shards(self) -> list[dict]:
        client = self._client()
        shards: list[dict] = []
        kwargs: dict = {"StreamName": self._stream}
        while True:
            resp = client.list_shards(**kwargs)
            shards.extend(resp.get("Shards", []))
            token = resp.get("NextToken")
            if not token:
                return shards
            kwargs = {"NextToken": token}

    # -- offset lifecycle ---------------------------------------------------

    def initialOffset(self) -> dict:
        import time

        # margin-shifted anchor: never lose a post-start record to driver
        # clock skew; at worst re-read `margin` seconds of pre-start records
        anchor = (
            time.time() - self._latest_margin
            if self._start_pos == "LATEST"
            else None
        )
        entries = {}
        for s in self._list_shards():
            e: dict = {"seq": None, "closed": False}
            if anchor is not None:
                e["ts"] = anchor
            entries[s["ShardId"]] = e
        return {"shards": entries}

    def commit(self, end: dict) -> None:
        pass  # Kinesis has no server-side consumer position to release

    # -- reading ------------------------------------------------------------

    def _shard_iterator(
        self, shard_id: str, seq: str | None, ts: float | None = None
    ) -> str:
        client = self._client()
        if seq is not None:
            kwargs = {
                "ShardIteratorType": "AFTER_SEQUENCE_NUMBER",
                "StartingSequenceNumber": seq,
            }
        elif ts is not None:
            kwargs = {"ShardIteratorType": "AT_TIMESTAMP", "Timestamp": ts}
        else:
            kwargs = {"ShardIteratorType": "TRIM_HORIZON"}
        return client.get_shard_iterator(
            StreamName=self._stream, ShardId=shard_id, **kwargs
        )["ShardIterator"]

    def _poll_shard(
        self, shard_id: str, seq: str | None, limit: int, ts: float | None = None
    ) -> tuple[list[tuple], str | None, bool]:
        """GetRecords from AFTER seq until caught up / closed / limit.
        Returns (rows, last_seq, shard_closed_and_drained)."""
        client = self._client()
        it = self._shard_iterator(shard_id, seq, ts)
        rows: list[tuple] = []
        last = seq
        while it is not None and len(rows) < limit:
            resp = client.get_records(
                ShardIterator=it, Limit=min(limit - len(rows), 10000)
            )
            for rec in resp.get("Records", []):
                last = rec["SequenceNumber"]
                rows.append(_row(shard_id, rec))
            it = resp.get("NextShardIterator")
            if it is None:
                return rows, last, True  # closed shard fully drained
            if not resp.get("Records") and resp.get("MillisBehindLatest", 0) == 0:
                return rows, last, False  # caught up on an open shard
        return rows, last, False  # per-batch cap hit; resume next batch

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        known = {k: dict(v) for k, v in start.get("shards", {}).items()}
        live = {s["ShardId"]: s for s in self._list_shards()}
        # parent-first rule: a child shard opens only after its parent (and
        # co-parent, for merges) has drained — KCL's per-key ordering across
        # resharding. Unknown parents (expired from the stream's retention
        # listing) count as drained.
        def parents_drained(s: dict) -> bool:
            for pk in ("ParentShardId", "AdjacentParentShardId"):
                pid = s.get(pk)
                if pid and pid in live and not known.get(pid, {}).get("closed"):
                    return False
            return True

        for sid, s in live.items():
            if sid not in known and parents_drained(s):
                # a brand-new child starts at its TRIM_HORIZON regardless of
                # the configured LATEST start: records routed to it after the
                # reshard must not be skipped
                known[sid] = {"seq": None, "closed": False}

        all_rows: list[tuple] = []
        for sid, st in known.items():
            if st["closed"]:
                continue
            rows, last, closed = self._poll_shard(
                sid, st["seq"], self._max_per_shard, st.get("ts")
            )
            new_st: dict = {"seq": last, "closed": closed}
            if last is None and st.get("ts") is not None:
                new_st["ts"] = st["ts"]  # keep the LATEST anchor until a read
            known[sid] = new_st
            all_rows.extend(rows)
        return iter(all_rows), {"shards": known}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        """Deterministic replay of a committed range (restart recovery)."""
        rows: list[tuple] = []
        start_shards = start.get("shards", {})
        for sid, st_end in end.get("shards", {}).items():
            end_seq = st_end.get("seq")
            st_start = start_shards.get(sid, {})
            start_seq = st_start.get("seq")
            if end_seq is None or end_seq == start_seq:
                continue  # shard contributed nothing in this range
            client = self._client()
            it = self._shard_iterator(sid, start_seq, st_start.get("ts"))
            while it is not None:
                resp = client.get_records(ShardIterator=it, Limit=10000)
                done = False
                for rec in resp.get("Records", []):
                    rows.append(_row(sid, rec))
                    if rec["SequenceNumber"] == end_seq:
                        done = True
                        break
                if done:
                    break
                it = resp.get("NextShardIterator")
                if not resp.get("Records") and resp.get("MillisBehindLatest", 0) == 0:
                    break  # defensive: end seq not found (trimmed); stop
        return iter(rows)


def _row(shard_id: str, rec: dict) -> tuple:
    ts = rec.get("ApproximateArrivalTimestamp")
    if isinstance(ts, datetime) and ts.tzinfo is not None:
        ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
    return (
        shard_id,
        rec["SequenceNumber"],
        rec.get("PartitionKey"),
        ts,
        bytes(rec["Data"]),
    )


def register(spark) -> None:
    """Register the source on a session: readStream.format('kinesis_py')."""
    spark.dataSource.register(KinesisPyDataSource)


def kinesis_py_source(
    spark,
    stream_name: str,
    region: str = "us-east-1",
    endpoint_url: str | None = None,
    starting_position: str = "trim_horizon",
    max_records_per_shard: int = 10000,
):
    """One-call reader: register + readStream with options. Returns the raw
    connector frame; feed through decode_kinesis_records(payload_encoding=
    'binary') for the A2 decode chain."""
    register(spark)
    reader = (
        spark.readStream.format(_FORMAT_NAME)
        .option("stream_name", stream_name)
        .option("region", region)
        .option("starting_position", starting_position)
        .option("max_records_per_shard", str(max_records_per_shard))
    )
    if endpoint_url:
        reader = reader.option("endpoint_url", endpoint_url)
    for k in ("aws_access_key_id", "aws_secret_access_key"):
        if os.environ.get(k.upper()):
            reader = reader.option(k, os.environ[k.upper()])
    return reader.load()
