"""Stream-stream event-time join — the §2.F surface piece batch joins can't
substitute for.

Use case: attribute each purchase to the same user's preceding click within
an attribution horizon, with BOTH sides arriving as unbounded streams. Spark's
native stream-stream inner join handles it once three things are declared:

- a WATERMARK on each side (how late each stream can be) — without both,
  the join state grows forever because neither side's buffer can ever be
  pruned;
- an EVENT-TIME RANGE condition tying the two time columns (here
  `purchase.ts BETWEEN click.ts AND click.ts + horizon`) — this is what
  bounds how long a click must be buffered waiting for its purchases;
- the equality key (user) that routes both sides to the same state store
  partition.

State bound (the 100 TB argument): each side buffers only rows newer than
(its own watermark) minus (the range the OTHER side may still match), i.e.
clicks live ~ horizon + click-lateness, purchases ~ purchase-lateness — a
sliding window of state per user, never the history. That pruning is exactly
what the watermark + range condition pair buys; drop either and Spark
(correctly) refuses or buffers unboundedly.

Semantics note: an INNER stream-stream join emits a pair as soon as both
sides have arrived (results stream incrementally); rows whose partner never
arrives inside the horizon are simply never emitted. The batch twin
(`attributed_pairs_batch`) is the same relational join over bounded data —
the stream == batch equivalence test in tests/test_stream_join.py feeds the
same rows through both paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _sides(events: DataFrame, horizon_minutes: int):
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon_minutes} MINUTES")
        )
    )
    return clicks, purchases, cond


def attributed_pairs_stream(
    click_stream: DataFrame,
    purchase_stream: DataFrame,
    horizon_minutes: int = 60,
    click_lateness: str = "30 minutes",
    purchase_lateness: str = "30 minutes",
) -> DataFrame:
    """(c_user, click_id, click_ts, purchase_id, purchase_ts,
    purchase_value) for every click->purchase pair within the horizon; both
    inputs are streaming DataFrames with the events schema (each side
    filters its own event_type, so the same source stream can feed both)."""
    clicks, _, cond = _sides(click_stream, horizon_minutes)
    _, purchases, _ = _sides(purchase_stream, horizon_minutes)
    clicks = clicks.withWatermark("click_ts", click_lateness)
    purchases = purchases.withWatermark("purchase_ts", purchase_lateness)
    return clicks.join(purchases, cond, "inner").select(
        "c_user",
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def attributed_pairs_batch(events: DataFrame, horizon_minutes: int = 60) -> DataFrame:
    """The bounded twin: identical join condition over a batch events table."""
    clicks, purchases, cond = _sides(events, horizon_minutes)
    return clicks.join(purchases, cond, "inner").select(
        "c_user",
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )
