"""Hand-constructed journey pins for weekly lifecycle growth accounting
(H170): every state transition (new, retained, gap-resurrection, churn
attribution to the week after last activity) exercised by two engineered
users."""

import datetime
import os
import tempfile

from plenario_mapper_spark.plans.registry import QUERIES

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

# epoch weeks are DIV 604800e6 of unix micros; pick a base aligned to a week
# boundary so "week k" below is base_week + k exactly
BASE = datetime.datetime(2024, 1, 4)  # 2024-01-04 = epoch day 19726 = 2818*7


def test_lifecycle_states_hand_journeys(spark):
    # user 1: active weeks 0, 1, 3 -> new@0, retained@1, churned@2,
    # resurrected@3 (the gap makes it a resurrection, not retention)
    # user 2: active week 0 only -> new@0, churned@1
    rows, eid = [], 0
    for uid, weeks in [(1, [0, 1, 3]), (2, [0])]:
        for w in weeks:
            ts = BASE + datetime.timedelta(weeks=w, hours=1)
            rows.append((eid, ts, uid, "view", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(rows, EV_SCHEMA)
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = {
            r["week"] - min(
                x["week"] for x in QUERIES["q_events_lifecycle_states"](spark, d).collect()
            ): r
            for r in QUERIES["q_events_lifecycle_states"](spark, d).collect()
        }
    assert len(got) == 4  # dense spine weeks 0..3
    w0, w1, w2, w3 = (got[k] for k in range(4))
    assert (w0["n_new"], w0["n_retained"], w0["n_resurrected"], w0["n_churned"]) == (2, 0, 0, 0)
    assert (w1["n_new"], w1["n_retained"], w1["n_resurrected"], w1["n_churned"]) == (0, 1, 0, 1)
    assert (w2["n_new"], w2["n_retained"], w2["n_resurrected"], w2["n_churned"]) == (0, 0, 0, 1)
    assert (w3["n_new"], w3["n_retained"], w3["n_resurrected"], w3["n_churned"]) == (0, 0, 1, 0)
    # quick ratio: week 2 has churn 1, inflow 0 -> 0.0; week 0 churn 0 -> NULL
    assert w2["quick_ratio"] == 0.0
    assert w0["quick_ratio"] is None
