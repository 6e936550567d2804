"""Alert derivation tests: reproduce the integration suite's 4 resolves / 5 error
messages over the 8 canonical observations (integration_tests.js:334-338), including
the startup-empty-registry behavior (map={}, type_map={} at :103-104 means every
record takes the discrepancy path; refresh then yields resolve for clean records —
app/mapper.js:72-112)."""

import json

import pytest

from plenario_mapper_spark import metadata
from plenario_mapper_spark.operators import alerts as A
from plenario_mapper_spark.operators import mapper as M


@pytest.fixture(scope="module")
def derived(spark, obs_df, kmap_df):
    norm = M.normalize(obs_df)
    stale = M.annotate(norm, metadata.empty_kmap(spark))  # startup: empty registry
    fresh = M.annotate(norm, kmap_df)
    return A.derive_alerts(stale, fresh, A.empty_blacklist(spark))


def test_counts(derived):
    alerts, _ = derived
    rows = alerts.collect()
    resolves = [r for r in rows if r["kind"] == "resolve"]
    errors = [r for r in rows if r["kind"] == "error"]
    assert len(resolves) == 4  # obs1, obs2, obs7, obs8
    n_messages = sum(len(json.loads(r["value"])) for r in errors)
    assert n_messages == 5  # integration_tests.js:337


def test_resolve_targets(derived):
    alerts, _ = derived
    resolved = sorted(
        (r["seq"], r["name"]) for r in alerts.collect() if r["kind"] == "resolve"
    )
    assert resolved == [(1, "htu21d"), (2, "hmc5883l"), (7, "camera"), (8, "htu21d")]


def test_error_messages(derived):
    alerts, _ = derived
    errs = {r["name"]: json.loads(r["value"]) for r in alerts.collect() if r["kind"] == "error"}
    assert set(errs) == {"hmc5883l", "camera", "htu21d", "wubdb89"}
    # obs3: unknown keys x1,y1 (array .toString() comma-join, no space before 'from')
    assert errs["hmc5883l"] == [
        "Received data from sensor hmc5883l with unknown key(s) x1,y1"
        "from network array_of_things_chicago. Please update the keys and "
        "properties in this sensors metadata."
    ]
    # obs4: coercion error on standing_water (value 10, a number)
    assert errs["camera"] == [
        "Property standing_water of sensor camera expected type bool and could "
        "not correctly coerce value 10 of type number"
    ]
    # obs5: unknown key + coercion error (2 messages in one alert)
    assert len(errs["htu21d"]) == 2
    assert any("unknown key(s) humdrum" in m for m in errs["htu21d"])
    assert (
        "Property temperature of sensor htu21d expected type float and could "
        "not correctly coerce value high of type string" in errs["htu21d"]
    )
    # obs6: unknown sensor
    assert errs["wubdb89"] == [
        "Sensor wubdb89 not found in sensor metadata for network "
        "array_of_things_chicago. Please add this sensor."
    ]


def test_blacklist_state(derived):
    _, new_blacklist = derived
    # htu21d errored (obs5) but resolved later (obs8); camera errored (obs4) then
    # resolved (obs7); hmc5883l errored last (obs3 after obs2's resolve);
    # wubdb89 errored and never resolved.
    assert sorted(r["sensor"] for r in new_blacklist.collect()) == ["hmc5883l", "wubdb89"]


def test_error_dedup_suppression(spark, obs_df, kmap_df):
    """A second error for an already-blacklisted sensor is suppressed
    (send_error guard, app/mapper.js:455-468); a resolve always posts."""
    norm = M.normalize(obs_df)
    stale = M.annotate(norm, metadata.empty_kmap(spark))
    fresh = M.annotate(norm, kmap_df)
    pre_blacklisted = spark.createDataFrame([("wubdb89",), ("camera",)], "sensor string")
    alerts, new_bl = A.derive_alerts(stale, fresh, pre_blacklisted)
    rows = alerts.collect()
    # wubdb89's error is suppressed now
    assert not any(r["name"] == "wubdb89" and r["kind"] == "error" for r in rows)
    # camera: obs4 error suppressed (carried blacklist), obs7 resolve still posts
    camera = [(r["seq"], r["kind"]) for r in rows if r["name"] == "camera"]
    assert camera == [(7, "resolve")]
    # wubdb89 stays blacklisted (error, suppressed or not, keeps it in)
    assert "wubdb89" in {r["sensor"] for r in new_bl.collect()}
