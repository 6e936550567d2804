"""Metadata-dimension readers (SURVEY §2.A A4/A5).

The reference loads `sensor__sensor_metadata` and `sensor__feature_metadata`
from Postgres with full-table SELECTs (app/mapper.js:133, :161) into process
memory. Here a provider returns the two dimension DataFrames; the micro-batch
driver re-invokes it per batch (the per-batch relaxation of the reference's
refresh-on-discrepancy, SURVEY §2.F F3) and broadcast-joins the flattened
mapping against the stream.

Both dimensions are tiny (one row per sensor / per feature), so a full re-read
per micro-batch is cheaper than any invalidation protocol — and on a cluster
the JDBC read happens once on one executor, then broadcasts.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

MetadataProvider = Callable[[SparkSession], tuple[DataFrame, DataFrame]]


def normalize_metadata_frames(
    sensor: DataFrame, feature: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Coerce provider output to the canonical dimension schemas.

    A JDBC source hands `observed_properties` back as the JSON TEXT of the
    row (Postgres json/jsonb columns render as VARCHAR through the driver —
    the reference consumes them the same way, JSON.parse on the loaded rows,
    app/mapper.js:139,169); parquet/DataFrame fixtures are already typed.
    Parse the string shape into MAP / ARRAY<STRUCT> when present so every
    downstream consumer (metadata.lower_*, build_mapping) sees one schema."""
    from plenario_mapper_spark.schemas import (
        FEATURE_METADATA_SCHEMA,
        SENSOR_METADATA_SCHEMA,
    )

    # SQL engines fold unquoted identifiers differently (Postgres lower,
    # Derby/Oracle UPPER); canonicalize to the schema's lowercase names first
    sensor = sensor.toDF(*[c.lower() for c in sensor.columns])
    feature = feature.toDF(*[c.lower() for c in feature.columns])
    if dict(sensor.dtypes).get("observed_properties") == "string":
        sensor = sensor.select(
            "name",
            F.from_json(
                "observed_properties", SENSOR_METADATA_SCHEMA["observed_properties"].dataType
            ).alias("observed_properties"),
        )
    if dict(feature.dtypes).get("observed_properties") == "string":
        feature = feature.select(
            "name",
            F.from_json(
                "observed_properties", FEATURE_METADATA_SCHEMA["observed_properties"].dataType
            ).alias("observed_properties"),
        )
    return sensor, feature


def jdbc_metadata_provider(
    url: str,
    properties: dict[str, str] | None = None,
    sensor_table: str = "sensor__sensor_metadata",
    feature_table: str = "sensor__feature_metadata",
) -> MetadataProvider:
    """Production provider: JDBC full-table reads, matching the reference's two
    SELECTs (app/mapper.js:133,161). `observed_properties` arrives as the JSON
    text of the metadata row and is parsed to the typed shape here
    (normalize_metadata_frames); `metadata.lower_*` then lowercases it.
    Contract-tested against Spark's bundled embedded Derby (a real JDBC
    driver + database in-process — no live Postgres in this container)."""

    def provider(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
        props = properties or {}
        sensor = spark.read.jdbc(url, sensor_table, properties=props)
        feature = spark.read.jdbc(url, feature_table, properties=props)
        return normalize_metadata_frames(sensor, feature)

    return provider


def parquet_metadata_provider(
    sensor_path: str, feature_path: str
) -> MetadataProvider:
    """Lake-resident metadata (the local/test stand-in for Postgres): re-read per
    batch so an external writer updating the files is picked up next batch."""

    def provider(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
        return spark.read.parquet(sensor_path), spark.read.parquet(feature_path)

    return provider
