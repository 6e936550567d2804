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

from pyspark.sql import DataFrame, SparkSession

MetadataProvider = Callable[[SparkSession], tuple[DataFrame, DataFrame]]


def jdbc_metadata_provider(
    url: str,
    properties: dict[str, str] | None = None,
    sensor_table: str = "sensor__sensor_metadata",
    feature_table: str = "sensor__feature_metadata",
) -> MetadataProvider:
    """Production provider: JDBC full-table reads, matching the reference's two
    SELECTs (app/mapper.js:133,161). `observed_properties` arrives as the JSON
    text of the metadata row; `metadata.lower_*` parses + lowercases it."""

    def provider(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
        props = properties or {}
        sensor = spark.read.jdbc(url, sensor_table, properties=props)
        feature = spark.read.jdbc(url, feature_table, properties=props)
        return sensor, feature

    return provider


def parquet_metadata_provider(
    sensor_path: str, feature_path: str
) -> MetadataProvider:
    """Lake-resident metadata (the local/test stand-in for Postgres): re-read per
    batch so an external writer updating the files is picked up next batch."""

    def provider(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
        return spark.read.parquet(sensor_path), spark.read.parquet(feature_path)

    return provider
