"""Golden end-to-end tests of the mapper pipeline on the 8 canonical observations
(integration_tests.js:110-207; expected sink/emit contents :281-322, 340-425)."""

import json

import pytest
from pyspark.sql import functions as F

from plenario_mapper_spark.operators import mapper as M


@pytest.fixture(scope="module")
def result(obs_df, kmap_df, registry):
    return M.run_mapper(obs_df, kmap_df, registry)


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_normalization(obs_df, kmap_df):
    ann = M.annotate(M.normalize(obs_df), kmap_df)
    r = {row["seq"]: row for row in ann.collect()}
    assert r[1]["node_id"] == "001" and r[1]["sensor"] == "htu21d"
    assert sorted(r[1]["data"].keys()) == ["humidity", "temp"]


def test_normalize_duplicate_key_js_last_wins(spark):
    """Case-colliding keys follow app/mapper.js:63-68: the loop reassigns only
    keys that are NOT already lowercase, so a case-variant always overwrites a
    plain-lowercase key regardless of document position, and among several
    case-variants the last in document order wins. (A plain sorted variant map
    would get `{"temp":2,"Temp":1}` wrong — sorted order puts "Temp" first, so
    LAST_WIN over sorted entries keeps 2; JS keeps 1.)"""
    df = spark.createDataFrame(
        [
            ("a", '{"temp": 2, "Temp": 1}'),   # variant overwrites lowercase -> 1
            ("b", '{"Temp": 1, "temp": 2}'),   # variant still overwrites     -> 1
            ("c", '{"TEMP": 3}'),
            ("d", '{"TEMP": 3, "Temp": 1}'),   # last variant in doc order    -> 1
            ("e", '{"Temp": 1, "TEMP": 3}'),   # last variant in doc order    -> 3
            ("f", '{"TEMP": 3, "temp": 2, "Temp": 1}'),  # variants beat plain -> 1
        ],
        "node_id string, data string",
    ).withColumn("sensor", F.lit("htu21d"))
    out = {r["node_id"]: r["data"] for r in M.normalize(df).collect()}
    want = {"a": 1, "b": 1, "c": 3, "d": 1, "e": 3, "f": 1}
    for node, expect in want.items():
        assert json.loads(str(out[node]["temp"])) == expect, node


def test_normalize_unparseable_data_is_null(spark):
    """Same-case duplicate keys are rejected by the variant parser (JS
    JSON.parse would dedupe last-wins — documented divergence): data must come
    back NULL, not a map of lowercased keys with all-NULL values."""
    df = spark.createDataFrame(
        [("a", '{"temp": 1, "temp": 2}'), ("b", "not json")],
        "node_id string, data string",
    ).withColumn("sensor", F.lit("htu21d"))
    out = {r["node_id"]: r["data"] for r in M.normalize(df).collect()}
    assert out["a"] is None and out["b"] is None


def test_validation_split(result):
    r = {row["seq"]: row for row in result.annotated.collect()}
    assert r[1]["invalid_keys"] == [] and r[1]["error_keys"] == []
    assert sorted(r[3]["invalid_keys"]) == ["x1", "y1"]
    assert r[4]["error_keys"] == ["standing_water"]  # 10 is not coercible to bool
    assert sorted(r[5]["bad_keys"]) == ["humdrum", "temp"]
    assert sorted(r[6]["invalid_keys"]) == ["intensity"]  # unknown sensor: all keys
    assert r[7]["bad_keys"] == []
    assert sorted(r[1]["features"]) == ["relative_humidity", "temperature"]
    assert r[2]["features"] == ["magnetic_field"]


def test_feature_tables(result):
    net = "network"
    temp = _rows(result.features["temperature"], net, "node_id", "temperature")
    assert temp == [
        ("array_of_things_chicago", "001", pytest.approx(37.91)),
        ("internet_of_stuff_seattle", "008", pytest.approx(40.01)),
    ]
    hum = _rows(result.features["relative_humidity"], "node_id", "humidity")
    assert hum == [("001", pytest.approx(27.48))]

    mag = _rows(result.features["magnetic_field"], "node_id", "x", "y", "z")
    assert mag == [
        ("002", None, pytest.approx(32.11), pytest.approx(90.92)),
        ("003", None, None, pytest.approx(90.92)),
    ]

    cv = _rows(
        result.features["computer_vision"],
        "node_id", "standing_water", "cloud_type", "num_pedestrians", "traffic_density",
    )
    assert cv == [
        ("004", None, "cumulonimbus", 9, pytest.approx(0.38)),
        ("007", True, "cumulonimbus", 11, pytest.approx(0.22)),
    ]


def test_dead_letter(result):
    dl = {
        r["node_id"]: (r["network"], r["sensor"], json.loads(r["data"]))
        for r in result.dead_letter.collect()
    }
    assert set(dl) == {"003", "004", "005", "006"}
    assert dl["003"][2] == {"x1": 56.77, "y1": 32.11}
    assert dl["004"][2] == {"standing_water": 10}
    assert dl["005"][2] == {"temp": "high", "humdrum": 27.48}
    assert dl["006"][2] == {"intensity": 90}
    assert dl["006"][1] == "wubdb89"


def test_emit_messages(result):
    emits = result.emits.collect()
    assert len(emits) == 7  # integration_tests.js:335 (data_count == 7)
    by_key = {(r["node"], r["feature"]): json.loads(r["results"]) for r in emits}
    assert by_key[("001", "temperature")] == {"temperature": 37.91}
    assert by_key[("001", "relative_humidity")] == {"humidity": 27.48}
    assert by_key[("002", "magnetic_field")] == {"y": 32.11, "z": 90.92}
    assert by_key[("003", "magnetic_field")] == {"z": 90.92}
    assert by_key[("004", "computer_vision")] == {
        "cloud_type": "cumulonimbus", "num_pedestrians": 9, "traffic_density": 0.38
    }
    assert by_key[("007", "computer_vision")] == {
        "standing_water": True, "cloud_type": "cumulonimbus",
        "num_pedestrians": 11, "traffic_density": 0.22,
    }
    assert by_key[("008", "temperature")] == {"temperature": 40.01}
    nets = {r["node"]: r["network"] for r in emits}
    assert nets["008"] == "internet_of_stuff_seattle"
    assert nets["001"] == "array_of_things_chicago"


def test_pipeline_is_shuffle_free(result):
    """The hot path must stay narrow: broadcast join only, no exchange. At 1000
    executors a shuffle here would dominate; the reference's per-record hash lookup
    maps to a broadcast hash join precisely so the pipeline scales linearly."""
    from tests.conftest import final_plan

    plan = final_plan(result.annotated)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning" not in plan
