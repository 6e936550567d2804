"""Tiny driver-side row sets as JVM literal relations.

`spark.createDataFrame(py_rows, schema)` compiles to `Scan ExistingRDD` over a
PICKLED Python RDD sliced to defaultParallelism: EVERY execution of any plan
that contains it launches a fleet of Python workers (32 on local[32]) just to
unpickle a KB-sized table, and the executor threads block on the worker socket
(measured: the schema-registry build inside the mapper pipeline accounted for
roughly half of q_mapper_split_events' executor task time, and recurs per
micro-batch in streaming). `local_rows` builds the same rows as a pure JVM
literal expression instead — explode of an array of struct literals over a
one-partition range — so execution is a single trivial JVM task with no Python
boundary, and an empty input optimizes to `LocalRelation <empty>` (zero tasks).

Scope guard: literal expression trees grow with the row count, so inputs
larger than `max_literal_rows` fall back to the classic builder on a
1-partition RDD (one Python round trip instead of defaultParallelism). This
helper is for REGISTRY/GRID/RESULT tables that are small by construction —
never for data.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, Row, SparkSession, functions as F, types as T

_MAX_LITERAL_ROWS = 512


def _lit_value(v, dt: T.DataType):
    """Literal Column for python value `v` of Catalyst type `dt` (recursive)."""
    if v is None:
        return F.lit(None).cast(dt)
    if isinstance(dt, T.StructType):
        if isinstance(v, Row):
            vals = [v[f.name] for f in dt.fields]
        elif isinstance(v, dict):
            vals = [v.get(f.name) for f in dt.fields]
        else:  # tuple/list positional
            vals = list(v)
        return F.struct(
            *[_lit_value(x, f.dataType).alias(f.name) for x, f in zip(vals, dt.fields)]
        )
    if isinstance(dt, T.MapType):
        if not v:
            return F.map_from_arrays(
                F.array().cast(T.ArrayType(dt.keyType)),
                F.array().cast(T.ArrayType(dt.valueType)),
            )
        ks, vs = zip(*v.items())
        return F.map_from_arrays(
            F.array(*[_lit_value(k, dt.keyType) for k in ks]),
            F.array(*[_lit_value(x, dt.valueType) for x in vs]),
        )
    if isinstance(dt, T.ArrayType):
        if not v:
            return F.array().cast(dt)
        return F.array(*[_lit_value(x, dt.elementType) for x in v])
    if isinstance(dt, T.TimestampType) and isinstance(v, datetime.datetime):
        return F.lit(v)
    return F.lit(v).cast(dt)


def local_rows(spark: SparkSession, rows, schema) -> DataFrame:
    """DataFrame over driver-local `rows` with `schema` (DDL string or
    StructType), built as a JVM literal relation when small enough; falls back
    to `spark.createDataFrame` on any unsupported value. Row order preserved."""
    if isinstance(schema, str):
        schema_t = T._parse_datatype_string(schema)
    else:
        schema_t = schema
    rows = list(rows)
    if len(rows) > _MAX_LITERAL_ROWS:
        return spark.createDataFrame(rows, schema)
    if not rows:
        # zero-row literal: a one-row template limited to 0 optimizes to
        # LocalRelation <empty> (zero tasks, no Python)
        tmpl = spark.range(0, 1, 1, 1).select(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in schema_t.fields]
        )
        return tmpl.limit(0)
    try:
        row_structs = [_lit_value(r, schema_t) for r in rows]
    except Exception:
        return spark.createDataFrame(rows, schema)
    return (
        spark.range(0, 1, 1, 1)
        .select(F.explode(F.array(*row_structs)).alias("_r"))
        .select("_r.*")
    )
