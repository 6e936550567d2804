"""Schema-evolution reads: one logical table across drifting file schemas.

A long-lived lake table accumulates batches written under different schema
versions — columns added, integer types widened, columns retired. Spark's
parquet `mergeSchema` only unions compatible schemas (it hard-errors on
int32-vs-int64 drift, common when a writer migrates id types), and silently
reconciling by scan option hides which batch contributed what. The robust
production pattern — and what this operator implements — is EXPLICIT
normalization: read each batch with its own schema, project every batch onto
the caller's target schema (missing columns become typed NULLs, present
columns CAST — widening is safe, narrowing raises by default), and
unionByName. Per-batch projections stay in the scan stage (no shuffle, no
Python); column pruning and filter pushdown still reach each file because
each leg is a plain parquet scan under a Project.

At 100 TB the alternative failure modes are real: mergeSchema=true must
footer-read EVERY file at planning time (a listing-scale driver cost), and a
type-drifted batch fails the whole read. Explicit per-batch normalization
costs one plan leg per schema VERSION (not per file) and never fails late.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

# A cast is widening-safe iff EVERY src value is exactly representable in
# dst. Integer->integer widening and float->double qualify; integer->float
# only when the integer's value bits fit the 24-bit float mantissa, and
# integer->double only when they fit the 53-bit double mantissa. int->float,
# bigint->float and bigint->double do NOT: ids above 2^24 / 2^53 round
# silently — exactly the migrated-id-column drift this module exists to
# catch — so those require allow_narrowing=True like any other lossy cast.
_INT_BITS = {"tinyint": 7, "smallint": 15, "int": 31, "bigint": 63}
_FP_MANTISSA = {"float": 24, "double": 53}


def _cast_ok(src: str, dst: str) -> bool:
    if src == dst:
        return True
    if src in _INT_BITS and dst in _INT_BITS:
        return _INT_BITS[src] <= _INT_BITS[dst]
    if src in _INT_BITS and dst in _FP_MANTISSA:
        return _INT_BITS[src] <= _FP_MANTISSA[dst]
    if src == "float" and dst == "double":
        return True
    # timestamp_ntz <-> timestamp and string widenings are caller decisions;
    # everything else is narrowing/lossy and must be explicit
    return False


def read_evolved(
    spark: SparkSession,
    batch_dirs: list[str],
    target_schema: T.StructType,
    allow_narrowing: bool = False,
) -> DataFrame:
    """Union `batch_dirs` (each one schema version) onto `target_schema`.

    Missing columns materialize as typed NULLs; extra columns are dropped
    (schema retirement); type drift is CAST when widening-safe, else raises
    unless `allow_narrowing` (then it casts anyway — data loss is the
    caller's explicit choice). Returns columns in target order."""
    legs = []
    for d in batch_dirs:
        src = spark.read.parquet(d)
        have = {f.name: f for f in src.schema.fields}
        cols = []
        for f in target_schema.fields:
            if f.name not in have:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
                continue
            src_t = have[f.name].dataType.simpleString()
            dst_t = f.dataType.simpleString()
            if not _cast_ok(src_t, dst_t) and not allow_narrowing:
                raise ValueError(
                    f"narrowing cast {f.name}: {src_t} -> {dst_t} in {d}; "
                    "pass allow_narrowing=True to force"
                )
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        legs.append(src.select(*cols))
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out
