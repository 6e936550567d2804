"""Metadata subsystem: the schema registry driving validation/coercion/routing.

The reference caches two Postgres tables in process memory as hash maps
(`map`, `type_map` — app/mapper.js:39-40, loaders :131-179) and re-pulls them on any
discrepancy. Spark-first equivalent: read the two small dimension tables (JDBC in
prod, parquet/DataFrame fixtures in tests), lower-case exactly as the reference does
(names + the whole observed_properties JSON, app/mapper.js:139-140 and :169-172),
flatten them into ONE mapping table `(sensor, raw_key, feature, property, type)`,
and broadcast-join it against the stream — the in-memory hash lookup becomes a
broadcast hash join (SURVEY §2 C1/C2).

At 100 TB the stream side is huge but this dimension is a schema registry (KBs-MBs):
it is always broadcastable, so the whole validation pipeline is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Columns of the flattened registry.
MAPPING_COLS = ("sensor", "raw_key", "feature", "property", "type")


def lower_sensor_metadata(sensor_meta: DataFrame) -> DataFrame:
    """name -> lower; observed_properties keys AND values -> lower (the reference
    lowercases the whole JSON blob, app/mapper.js:139-140)."""
    return sensor_meta.select(
        F.lower("name").alias("name"),
        F.transform_keys(
            F.transform_values("observed_properties", lambda _, v: F.lower(v)),
            lambda k, _: F.lower(k),
        ).alias("observed_properties"),
    )


def lower_feature_metadata(feature_meta: DataFrame) -> DataFrame:
    """name, property names and type strings -> lower (app/mapper.js:169-172)."""
    return feature_meta.select(
        F.lower("name").alias("name"),
        F.transform(
            "observed_properties",
            lambda p: F.struct(
                F.lower(p["name"]).alias("name"), F.lower(p["type"]).alias("type")
            ),
        ).alias("observed_properties"),
    )


def _pin_local(df: DataFrame) -> DataFrame:
    """Evaluate a registry dimension once and rebuild it as a JVM literal
    relation. Registry dimensions are KB-sized by contract, but they usually
    arrive as driver-created frames whose plan is a pickled Python RDD sliced
    to defaultParallelism — and with no size statistics, the build_mapping
    join plans as a full 32-partition sort-merge join over Python scans
    (measured 24-88 executor task-sec PER MICRO-BATCH at bench). Pinning
    costs one tiny collect and makes every downstream registry plan a pure
    local-relation job with exact (KB) size estimates.

    Idempotent and cheap to repeat: a frame that is already a literal relation
    (local_rows output — including a prior pin) is returned as-is, so callers
    can pin once at entry (streaming.process_batch) and the pins inside
    build_mapping/feature_registry become no-ops instead of extra collects."""
    if getattr(df, "_plenario_local", False):
        return df
    from pyspark.errors import AnalysisException

    from plenario_mapper_spark.functions.local_rel import local_rows

    try:
        return local_rows(df.sparkSession, df.collect(), df.schema)
    except AnalysisException:
        return df  # a streaming frame: collect() is unsupported, keep the plan


def build_mapping(sensor_meta: DataFrame, feature_meta: DataFrame) -> DataFrame:
    """Flatten both dimensions into (sensor, raw_key, feature, property, type).

    `feature.property` splits like the reference: feature = text before the first
    dot, property = everything after it (split(/\\.(.+)?/), app/mapper.js:196-197).
    A (feature, property) with no type row keeps type NULL — which downstream is a
    coercion error, matching the reference's unrecognized-type branch
    (app/mapper.js:233-239).
    """
    sm = lower_sensor_metadata(_pin_local(sensor_meta))
    fm = lower_feature_metadata(_pin_local(feature_meta))

    keys = sm.select(
        F.col("name").alias("sensor"),
        F.explode("observed_properties").alias("raw_key", "fp"),
    ).select(
        "sensor",
        "raw_key",
        F.substring_index("fp", ".", 1).alias("feature"),
        F.when(
            F.col("fp").contains("."),
            F.expr("substring(fp, instr(fp, '.') + 1)"),
        ).alias("property"),
    )

    types = fm.select(
        F.col("name").alias("feature"),
        F.explode("observed_properties").alias("p"),
    ).select("feature", F.col("p.name").alias("property"), F.col("p.type").alias("type"))

    return keys.join(types, ["feature", "property"], "left").select(*MAPPING_COLS)


KMAP_SCHEMA = (
    "sensor string, kmap map<string, "
    "struct<feature:string, property:string, type:string, fp:string>>"
)


def sensor_kmap(mapping: DataFrame) -> DataFrame:
    """One row per sensor with a MAP raw_key -> struct(feature, property, type, fp).

    This is the broadcast side of the stream join; a per-record O(1) hash lookup in
    the reference (map[obs.sensor][key], app/mapper.js:196) becomes a broadcast hash
    join on `sensor` plus JVM map functions over the row's payload.

    The registry is KB-sized by construction (a schema registry, not data), so it
    is assembled on the DRIVER and shipped as LocalTableScan -> BroadcastExchange:
    no groupBy shuffle just to build a dimension, and the stream-side plan stays
    completely exchange-free (verified by test_pipeline_is_shuffle_free).
    """
    spark = mapping.sparkSession
    by_sensor: dict[str, dict] = {}
    for r in mapping.collect():
        # concat_ws semantics: a NULL property yields fp == feature
        fp = r["feature"] if r["property"] is None else f"{r['feature']}.{r['property']}"
        by_sensor.setdefault(r["sensor"], {})[r["raw_key"]] = (
            r["feature"],
            r["property"],
            r["type"],
            fp,
        )
    rows = sorted(by_sensor.items())
    # JVM literal relation, not createDataFrame: the registry is re-scanned by
    # every mapper job (and per micro-batch in streaming), and the pickled-RDD
    # form spawns a fleet of Python workers per scan — see functions/local_rel.
    from plenario_mapper_spark.functions.local_rel import local_rows

    return local_rows(spark, rows, KMAP_SCHEMA) if rows else empty_kmap(spark)


def feature_registry(feature_meta: DataFrame) -> list[dict]:
    """Driver-side list of features and their typed properties — the sink-table
    registry (DDL pre-created in the reference, tests/configure_tests.js:79-161).
    Small by construction (a schema registry), so collecting it is correct."""
    fm = lower_feature_metadata(_pin_local(feature_meta))
    return [
        {
            "feature": r["name"],
            "properties": [(p["name"], p["type"]) for p in r["observed_properties"]],
        }
        for r in fm.collect()
    ]


def empty_kmap(spark) -> DataFrame:
    """Empty schema registry — models the reference's startup state (map = {},
    type_map = {}, app/mapper.js:36-40), where every record is a discrepancy.
    Built as an empty JVM LocalRelation (zero tasks, no Python scan) — the
    stale side of batch 1 joins this against the whole batch."""
    from plenario_mapper_spark.functions.local_rel import local_rows

    return local_rows(spark, [], KMAP_SCHEMA)
