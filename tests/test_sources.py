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
    """The JDBC provider must issue exactly the reference's two full-table
    reads (app/mapper.js:133,161) with the caller's url/properties, in
    (sensor, feature) order, pass already-typed frames through unchanged,
    and surface a clear failure when no driver exists."""
    from unittest.mock import patch

    from plenario_mapper_spark.sources.metadata_store import jdbc_metadata_provider

    provider = jdbc_metadata_provider(
        "jdbc:postgresql://db:5432/meta",
        properties={"user": "u", "driver": "org.postgresql.Driver"},
    )
    calls = []
    sentinel_a = spark.createDataFrame(
        [("HTU21D", {"Temp": "temperature.temperature"})], SENSOR_METADATA_SCHEMA
    )
    sentinel_b = spark.createDataFrame(
        [("temperature", [{"name": "temperature", "type": "FLOAT"}])],
        FEATURE_METADATA_SCHEMA,
    )

    def fake_jdbc(self, url, table, properties=None, **kw):
        calls.append((url, table, dict(properties or {})))
        return sentinel_a if table == "sensor__sensor_metadata" else sentinel_b

    with patch("pyspark.sql.readwriter.DataFrameReader.jdbc", new=fake_jdbc):
        sensor, feature = provider(spark)
    # typed frames pass through normalize with schema and content intact
    assert sensor.schema == sentinel_a.schema and feature.schema == sentinel_b.schema
    assert sensor.collect() == sentinel_a.collect()
    assert feature.collect() == sentinel_b.collect()
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


def test_jdbc_metadata_provider_derby_end_to_end(spark):
    """REAL JDBC round-trip without a live Postgres: Spark bundles embedded
    Derby (the Hive-metastore dependency), a genuine JDBC driver + database
    in this very JVM. Create the reference's two metadata tables with
    observed_properties as JSON TEXT (how Postgres json/jsonb columns render
    through a driver), read them back through jdbc_metadata_provider, and
    require build_mapping to produce the exact rows the typed-fixture path
    produces — the provider's from_json normalization and the downstream
    lowering both under test."""
    import json

    from plenario_mapper_spark.sources.metadata_store import jdbc_metadata_provider

    url = "jdbc:derby:memory:metaContract;create=true"
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        for ddl in (
            "CREATE TABLE sensor__sensor_metadata "
            "(name VARCHAR(64), observed_properties VARCHAR(2048))",
            "CREATE TABLE sensor__feature_metadata "
            "(name VARCHAR(64), observed_properties VARCHAR(2048))",
        ):
            st.executeUpdate(ddl)
        sensor_rows = [
            ("HTU21D", {"Temp": "temperature.temperature",
                        "Humidity": "relative_humidity.humidity"}),
            ("HMC5883L", {"X": "magnetic_field.x"}),
        ]
        feature_rows = [
            ("Temperature", [{"name": "Temperature", "type": "FLOAT"}]),
            ("relative_humidity", [{"name": "humidity", "type": "FLOAT"}]),
            ("magnetic_field", [{"name": "x", "type": "FLOAT"}]),
        ]
        ins = conn.prepareStatement(
            "INSERT INTO sensor__sensor_metadata VALUES (?, ?)"
        )
        for name, props in sensor_rows:
            ins.setString(1, name)
            ins.setString(2, json.dumps(props))
            ins.executeUpdate()
        ins = conn.prepareStatement(
            "INSERT INTO sensor__feature_metadata VALUES (?, ?)"
        )
        for name, props in feature_rows:
            ins.setString(1, name)
            ins.setString(2, json.dumps(props))
            ins.executeUpdate()
    finally:
        conn.close()

    provider = jdbc_metadata_provider(
        "jdbc:derby:memory:metaContract",
        properties={"driver": "org.apache.derby.jdbc.EmbeddedDriver"},
    )
    sensor, feature = provider(spark)
    assert dict(sensor.dtypes)["observed_properties"] == "map<string,string>"
    got = {
        (r["sensor"], r["raw_key"]): (r["feature"], r["property"], r["type"])
        for r in metadata.build_mapping(sensor, feature).collect()
    }
    typed_sensor = spark.createDataFrame(sensor_rows, SENSOR_METADATA_SCHEMA)
    typed_feature = spark.createDataFrame(
        [(n, [(p["name"], p["type"]) for p in ps]) for n, ps in feature_rows],
        FEATURE_METADATA_SCHEMA,
    )
    want = {
        (r["sensor"], r["raw_key"]): (r["feature"], r["property"], r["type"])
        for r in metadata.build_mapping(typed_sensor, typed_feature).collect()
    }
    assert got == want
    assert got[("htu21d", "temp")] == ("temperature", "temperature", "float")
    assert len(got) == 3


def test_read_evolved_normalizes_and_guards(spark, tmp_path):
    """Missing columns -> typed NULLs; int widening casts; extra columns
    drop; narrowing refuses unless explicitly allowed."""
    from pyspark.sql import functions as F, types as T

    from plenario_mapper_spark.sources.evolved import read_evolved

    v1, v2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    spark.createDataFrame([(1, 10)], "id int, n int").write.parquet(v1)
    spark.createDataFrame(
        [(2, 20, "en", 0.5)], "id bigint, n bigint, lang string, extra double"
    ).write.parquet(v2)
    target = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    out = read_evolved(spark, [v1, v2], target)
    assert out.schema == target
    got = {r["id"]: (r["n"], r["lang"]) for r in out.collect()}
    assert got == {1: (10, None), 2: (20, "en")}

    narrow_target = T.StructType([T.StructField("id", T.IntegerType())])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="narrowing"):
        read_evolved(spark, [v2], narrow_target)
    # explicit opt-in narrows anyway
    assert read_evolved(spark, [v2], narrow_target, allow_narrowing=True).collect()[0]["id"] == 2


def test_read_evolved_int_to_fp_is_lossy_not_widening(spark, tmp_path):
    """bigint->double silently rounds ids above 2^53 — the exact id-drift
    corruption the module guards against — so it must be classed narrowing.

    First demonstrate the corruption the pre-r6 rule would have allowed:
    two DISTINCT int64 ids collapse to the SAME double, so a downstream
    join keyed on the normalized column conflates two entities. Then assert
    read_evolved refuses the cast by default and only performs it under
    allow_narrowing=True."""
    from pyspark.sql import types as T

    from plenario_mapper_spark.sources.evolved import read_evolved

    big = 2**53  # 2^53+1 is the first int64 a double cannot represent
    v = str(tmp_path / "v")
    # both ids round to 9007199254740992.0 as doubles
    spark.createDataFrame([(big,), (big + 1,)], "id bigint").write.parquet(v)

    # the corruption: cast-to-double conflates the two join keys
    collapsed = (
        spark.read.parquet(v)
        .selectExpr("CAST(id AS DOUBLE) AS id")
        .distinct()
        .count()
    )
    assert collapsed == 1  # two ids, one double — a corrupted join key

    import pytest as _pytest

    dbl_target = T.StructType([T.StructField("id", T.DoubleType())])
    with _pytest.raises(ValueError, match="narrowing"):
        read_evolved(spark, [v], dbl_target)
    flt_target = T.StructType([T.StructField("id", T.FloatType())])
    with _pytest.raises(ValueError, match="narrowing"):
        read_evolved(spark, [v], flt_target)
    # int(32)->float is lossy above 2^24 too
    v32 = str(tmp_path / "v32")
    spark.createDataFrame([(2**24 + 1,)], "id int").write.parquet(v32)
    with _pytest.raises(ValueError, match="narrowing"):
        read_evolved(spark, [v32], flt_target)
    # but exactly-representable widenings remain safe: int->double,
    # smallint->float, float->double
    assert read_evolved(spark, [v32], dbl_target).collect()[0]["id"] == float(2**24 + 1)
    vs = str(tmp_path / "vs")
    spark.createDataFrame([(123,)], "id smallint").write.parquet(vs)
    assert read_evolved(spark, [vs], flt_target).collect()[0]["id"] == 123.0
    # explicit opt-in performs the lossy cast anyway (caller's choice)
    forced = read_evolved(spark, [v], dbl_target, allow_narrowing=True)
    assert forced.distinct().count() == 1
