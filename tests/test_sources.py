"""Sources package: metadata providers and the batch observation readers.

(decode_kinesis_records and file_obs_source are e2e-covered in test_streaming.)
"""

from __future__ import annotations

import pytest

from plenario_mapper_spark import metadata
from plenario_mapper_spark.schemas import (
    FEATURE_METADATA_SCHEMA,
    SENSOR_METADATA_SCHEMA,
)
from plenario_mapper_spark.sources import (
    kinesis_source,
    parquet_metadata_provider,
)


def test_parquet_metadata_provider_roundtrip(spark, tmp_path):
    sensor = spark.createDataFrame(
        [("HTU21D", {"Temp": "temperature.temperature"})], SENSOR_METADATA_SCHEMA
    )
    feature = spark.createDataFrame(
        [("temperature", [{"name": "temperature", "type": "FLOAT"}])],
        FEATURE_METADATA_SCHEMA,
    )
    sp, fp = str(tmp_path / "sensor"), str(tmp_path / "feature")
    sensor.write.parquet(sp)
    feature.write.parquet(fp)

    provider = parquet_metadata_provider(sp, fp)
    s2, f2 = provider(spark)
    mapping = metadata.build_mapping(s2, f2)
    rows = {(r["sensor"], r["raw_key"]): r for r in mapping.collect()}
    assert ("htu21d", "temp") in rows
    r = rows[("htu21d", "temp")]
    # names AND type strings arrive lowercased (the reference lowercases on load,
    # app/mapper.js:139-140 / the coercion switch keys on lowercased types :199)
    assert (r["feature"], r["property"], r["type"]) == (
        "temperature",
        "temperature",
        "float",
    )


def test_kinesis_source_unavailable_raises_clear_error(spark):
    with pytest.raises(RuntimeError, match="Kinesis connector not available"):
        kinesis_source(spark)
