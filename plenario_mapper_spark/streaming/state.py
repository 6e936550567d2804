"""Stateful alert dedup as a true streaming operator.

The batch implementation (operators/alerts.py) folds per-sensor event sequences
with a window + a state DataFrame. This module is the Structured Streaming twin:
applyInPandasWithState keyed by sensor, state = blacklisted flag — the reference's
in-memory `blacklist` array (app/mapper.js:42) as a fault-tolerant keyed state
store (checkpointed; survives restarts, which the reference does not).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "seq long, name string, kind string, value string"
STATE_SCHEMA = "blacklisted boolean"


def _fold_sensor_events(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold one sensor's alert events through the blacklist state machine.

    Input rows: (seq, sensor, kind, value) where kind in {error, resolve} and
    value is the ready-to-post payload. Emits every resolve; emits an error only
    when not blacklisted; updates state per transition (send_error/send_resolve,
    app/mapper.js:455-489)."""
    (sensor,) = key
    blacklisted = state.get[0] if state.exists else False
    out = []
    for pdf in pdfs:
        for row in pdf.sort_values("seq").itertuples():
            if row.kind == "resolve":
                out.append((row.seq, sensor, "resolve", row.value))
                blacklisted = False
            else:
                if not blacklisted:
                    out.append((row.seq, sensor, "error", row.value))
                blacklisted = True
    state.update((blacklisted,))
    yield pd.DataFrame(out, columns=["seq", "name", "kind", "value"])


def streaming_alert_dedup(events: DataFrame) -> DataFrame:
    """events: streaming DataFrame (seq, sensor, kind, value) -> deduped alerts.

    State volume is one boolean per sensor — trivially shardable by the state
    store; the shuffle is on `sensor`, the same key the events already carry."""
    return events.groupBy("sensor").applyInPandasWithState(
        _fold_sensor_events,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


THROTTLE_OUTPUT_SCHEMA = (
    "key string, seq long, passed boolean, n_in_window long, window_start long"
)
THROTTLE_STATE_SCHEMA = "window_start long, n_in_window long"


def _throttle_key_events(limit: int, window_seconds: int):
    """Build the per-key fold for throttle_stream (closure over the config)."""

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        win_start, n = state.get if state.exists else (None, 0)
        out = []
        for pdf in pdfs:
            for row in pdf.sort_values(["event_sec", "seq"]).itertuples():
                w = (row.event_sec // window_seconds) * window_seconds
                if win_start is None or w > win_start:
                    win_start, n = w, 0
                # a late event from an already-closed window counts against
                # the CURRENT window (state only moves forward — reopening
                # closed windows would need unbounded history)
                n += 1
                out.append((k, row.seq, n <= limit, n, win_start))
        state.update((win_start, n))
        yield pd.DataFrame(
            out,
            columns=["key", "seq", "passed", "n_in_window", "window_start"],
        )

    return fold


def throttle_stream(
    events: DataFrame,
    limit: int,
    window_seconds: int,
    key_col: str = "key",
) -> DataFrame:
    """Per-key rate limiting as durable keyed state — the alert-storm /
    abusive-producer guard every ingest front door needs (the reference
    throttles nothing: a flapping sensor POSTs an alert per record until
    blacklisted; this generalizes the blacklist to a budget per time
    window). Each event is tagged `passed` = whether its key has emitted
    fewer than `limit` events in the event-time window containing it;
    callers route passed/suppressed like the mapper's clean/misfit split.

    Deterministic: events fold in (event_sec, seq) order within each
    micro-batch, so replay yields identical verdicts (checkpoint-safe —
    the same at-least-once replay contract as the alert state machine).
    State is two longs per key, sharded by the state store on the same
    key the stream already shuffles on. Input rows: (key, seq, event_sec
    — event-time seconds, any monotone integer clock)."""
    return events.groupBy(key_col).applyInPandasWithState(
        _throttle_key_events(limit, window_seconds),
        outputStructType=THROTTLE_OUTPUT_SCHEMA,
        stateStructType=THROTTLE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
