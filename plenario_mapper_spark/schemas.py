"""Schemas for the observation stream, metadata dimensions, and sinks.

Derived from the reference's documented record shape (app/mapper.js:49-55), metadata
loaders (app/mapper.js:123-179), and sink DDL (tests/configure_tests.js:79-161).
"""

from __future__ import annotations

from pyspark.sql import types as T

# The observation envelope. `datetime` is kept VERBATIM as a string — the reference
# never parses it (interpolated into SQL at app/mapper.js:308,338). `data` arrives as
# the raw JSON object text and is parsed to MAP<STRING, VARIANT> inside the pipeline so
# JS-type-dependent coercion (Number(true)=1 vs Number("true")=NaN) stays exact.
OBS_JSON_SCHEMA = T.StructType(
    [
        T.StructField("node_id", T.StringType()),
        T.StructField("meta_id", T.DoubleType()),
        T.StructField("datetime", T.StringType()),
        T.StructField("sensor", T.StringType()),
        T.StructField("network", T.StringType()),
        # Declared STRING: from_json hands back the raw JSON object text for the
        # heterogeneous payload, preserving value types for parse_json downstream.
        T.StructField("data", T.StringType()),
    ]
)

# sensor__sensor_metadata (app/mapper.js:131-147; fixtures tests/configure_tests.js:38-51)
SENSOR_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        # raw_key -> "feature.property"
        T.StructField(
            "observed_properties", T.MapType(T.StringType(), T.StringType())
        ),
    ]
)

# sensor__feature_metadata (app/mapper.js:159-179; fixtures tests/configure_tests.js:55-75)
FEATURE_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField(
            "observed_properties",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("type", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

# Flattened schema-registry join table the engine derives once per metadata refresh
# (SURVEY §2 C1/C2): one row per (sensor, raw_key).
MAPPING_SCHEMA = T.StructType(
    [
        T.StructField("sensor", T.StringType()),
        T.StructField("raw_key", T.StringType()),
        T.StructField("feature", T.StringType()),
        T.StructField("property", T.StringType()),
        T.StructField("type", T.StringType()),
    ]
)

# Dead-letter sink row (<network>__unknown_feature, tests/configure_tests.js:136-148;
# writer app/mapper.js:306-310).
DEAD_LETTER_SCHEMA = T.StructType(
    [
        T.StructField("network", T.StringType()),
        T.StructField("node_id", T.StringType()),
        T.StructField("datetime", T.StringType()),
        T.StructField("meta_id", T.DoubleType()),
        T.StructField("sensor", T.StringType()),
        T.StructField("data", T.StringType()),  # residue as JSON text
    ]
)

# Emit-message shape (format_obs, app/mapper.js:365-380): one message per feature
# touched by an observation; `results` carries the coerced values as JSON text so the
# heterogeneous typing survives a fixed schema.
EMIT_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),  # constant "sensorObservations"
        T.StructField("attributes", T.StructType(
            [
                T.StructField("node", T.StringType()),
                T.StructField("datetime", T.StringType()),
                T.StructField("sensor", T.StringType()),
                T.StructField("network", T.StringType()),
                T.StructField("feature", T.StringType()),
                T.StructField("results", T.StringType()),  # JSON object text
            ]
        )),
    ]
)

# Alert message (app/mapper.js:456-466, 477-487): value is a JSON array of
# human-readable error strings, or the literal "resolve".
ALERT_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),  # sensor
        T.StructField("value", T.StringType()),
    ]
)
