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
1-PARTITION RDD (one Python round trip instead of defaultParallelism; no
driver-side row verification on that path). This helper is for
REGISTRY/GRID/RESULT tables that are small by construction — never for data.

Schema fidelity: TOP-LEVEL nullability always matches the passed schema
(nullable fields are widened with a no-op CASE WHEN; a declared non-nullable
field given a None value routes to `createDataFrame`, which raises properly).
Nullability NESTED inside struct/array/map values follows the literal values
(non-nullable where the value is non-null) and may be tighter than
createDataFrame's — unions, parquet writes and downstream casts accept that;
only a strict nested-schema equality check would notice.
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
            if len(vals) != len(dt.fields):
                # surface malformed rows instead of silently zip-truncating;
                # local_rows routes this to createDataFrame, which reports the
                # arity mismatch with a proper error
                raise ValueError(
                    f"row arity {len(vals)} != schema arity {len(dt.fields)}"
                )
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


def _match_top_nullability(df: DataFrame, schema_t: T.StructType) -> DataFrame:
    """Widen literal-derived non-nullable top-level columns to the schema's
    declared nullability by unionAll with an EMPTY all-covering template —
    union nullability is the OR of both sides, and the optimizer prunes the
    empty branch (PropagateEmptyRelation), so the physical plan is unchanged.
    Raises when a declared NON-nullable field came out nullable (a None value
    in the rows) so the caller falls back to createDataFrame's proper
    verification error."""
    fixes, widened = [], False
    for want, got in zip(schema_t.fields, df.schema.fields):
        if got.nullable and not want.nullable:
            raise ValueError(f"field {want.name}: null value in non-nullable field")
        if want.nullable and not got.nullable:
            fixes.append(F.lit(None).cast(want.dataType).alias(want.name))
            widened = True
        else:
            fixes.append(F.col(want.name))
    if not widened:
        return df
    return df.unionAll(df.limit(0).select(*fixes))


def local_rows(spark: SparkSession, rows, schema) -> DataFrame:
    """DataFrame over driver-local `rows` with `schema` (DDL string or
    StructType), built as a JVM literal relation when small enough; falls back
    to a 1-partition `spark.createDataFrame` past `_MAX_LITERAL_ROWS`, or to the
    classic builder on any unsupported/malformed value. Row order preserved.

    The result is tagged `_plenario_local = True` on the literal paths so
    `metadata._pin_local` can skip re-collecting a frame that is already a
    driver-local relation with exact size estimates."""
    if isinstance(schema, str):
        schema_t = T._parse_datatype_string(schema)
    else:
        schema_t = schema
    rows = list(rows)
    if len(rows) > _MAX_LITERAL_ROWS:
        # one Python round trip (1 slice), not a defaultParallelism unpickle
        # fleet — these tables are registry-sized, never data
        return spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1), schema_t
        )
    if not rows:
        if any(not f.nullable for f in schema_t.fields):
            # a zero-row literal template cannot express a non-nullable column
            # (lit(NULL) is nullable); createDataFrame([], schema) honors the
            # declared nullability and its empty RDD runs zero tasks
            return spark.createDataFrame([], schema_t)
        # zero-row literal: a one-row template limited to 0 optimizes to
        # LocalRelation <empty> (zero tasks, no Python)
        tmpl = spark.range(0, 1, 1, 1).select(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in schema_t.fields]
        )
        out = tmpl.limit(0)
        out._plenario_local = True
        return out
    try:
        row_structs = [_lit_value(r, schema_t) for r in rows]
        out = (
            spark.range(0, 1, 1, 1)
            .select(F.explode(F.array(*row_structs)).alias("_r"))
            .select("_r.*")
        )
        out = _match_top_nullability(out, schema_t)
    except Exception:
        return spark.createDataFrame(rows, schema)
    out._plenario_local = True
    return out
