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


def test_jdbc_metadata_provider_contract(spark):
    """No Postgres in this container, so the JDBC provider is contract-tested:
    it must issue exactly the reference's two full-table reads
    (app/mapper.js:133,161) with the caller's url/properties, in (sensor,
    feature) order, and surface a clear failure when no driver exists."""
    from unittest.mock import patch

    from plenario_mapper_spark.sources.metadata_store import jdbc_metadata_provider

    provider = jdbc_metadata_provider(
        "jdbc:postgresql://db:5432/meta",
        properties={"user": "u", "driver": "org.postgresql.Driver"},
    )
    calls = []
    sentinel_a, sentinel_b = object(), object()

    def fake_jdbc(self, url, table, properties=None, **kw):
        calls.append((url, table, dict(properties or {})))
        return sentinel_a if table == "sensor__sensor_metadata" else sentinel_b

    with patch("pyspark.sql.readwriter.DataFrameReader.jdbc", new=fake_jdbc):
        sensor, feature = provider(spark)
    assert sensor is sentinel_a and feature is sentinel_b
    assert calls == [
        ("jdbc:postgresql://db:5432/meta", "sensor__sensor_metadata",
         {"user": "u", "driver": "org.postgresql.Driver"}),
        ("jdbc:postgresql://db:5432/meta", "sensor__feature_metadata",
         {"user": "u", "driver": "org.postgresql.Driver"}),
    ]

    # without a driver on the classpath the real call must fail loudly, not hang
    import pytest as _pytest

    with _pytest.raises(Exception) as exc:
        jdbc_metadata_provider("jdbc:postgresql://nope:1/x")(spark)
    assert "driver" in str(exc.value).lower() or "jdbc" in str(exc.value).lower()
