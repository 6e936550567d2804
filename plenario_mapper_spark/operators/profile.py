"""One-pass column profiling — the data-quality reconnaissance scan.

Before a 100 TB table is joined, deduped, or sampled, a pipeline wants its
shape: row count, null rate, cardinality, numeric ranges per column. The
naive form runs one job per column (N scans of 100 TB); this operator
compiles the whole profile into ONE aggregate over ONE scan and pivots the
single result row to long format driver-side (N struct literals over a
1-row local relation — no second job, no shuffle beyond the agg's own).

Exact vs approximate cardinality: multiple COUNT(DISTINCT) in one aggregate
plan through Expand (each input row multiplied by the number of distinct
aggregates — one pass, xN rows through the partial agg). That is fine into
the low tens of columns; at wider schemas or when +-2% suffices, pass
`exact_distinct=False` and the profile uses approx_count_distinct (HLL,
constant memory, no Expand) — the same switch the big engines' ANALYZE
offers."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from plenario_mapper_spark.functions import parity as PAR

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = True,
    rsd: float = 0.02,
) -> DataFrame:
    """Profile `cols` (default: all) in one scan. Output one row per column:
    (column, n_rows, n_null, n_distinct, min_num, max_num) — min/max are
    DOUBLE and NULL for non-numeric columns (string/timestamp extrema are
    type-dependent renderings, deliberately out of the uniform schema)."""
    names = cols or df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}

    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in names:
        aggs.append(F.count(c).alias(f"_nn_{c}"))
        if exact_distinct:
            aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(c, rsd).alias(f"_nd_{c}"))
        if isinstance(schema[c], _NUMERIC):
            aggs.append(F.min(F.col(c).cast("double")).alias(f"_min_{c}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"_max_{c}"))
    one = df.agg(*aggs)

    structs = []
    for c in names:
        is_num = isinstance(schema[c], _NUMERIC)
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).alias("n_null"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                (F.col(f"_min_{c}") if is_num else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"_max_{c}") if is_num else F.lit(None).cast("double")).alias("max_num"),
            )
        )
    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def numeric_histogram(
    df: DataFrame, col: str, n_bins: int, lo: float, hi: float
) -> DataFrame:
    """Fixed-width histogram over [lo, hi) in ONE aggregate: bin index is a
    pure arithmetic projection (floor((x-lo)/w), clamped into [0, n_bins-1]
    so the closed upper bound lands in the last bin; out-of-range and NULL
    rows are dropped), then a hash groupBy whose shuffle carries at most
    n_bins keys. Explicit bounds keep it one-pass — the auto-bounds variant
    is profile_columns' min/max feeding this (two passes total, still two
    scans at 100 TB, not N).

    Bin arithmetic is (x - lo) / w with both engines evaluating the identical
    IEEE expression tree, so bucket membership is deterministic and the
    DuckDB oracle reproduces counts exactly. Output: (bin, bin_lo, bin_hi,
    n) sorted nowhere — the consumer orders."""
    if n_bins <= 0 or not hi > lo:
        raise ValueError("need n_bins > 0 and hi > lo")
    w = (hi - lo) / n_bins
    x = F.col(col).cast("double")
    bin_ = F.least(
        F.greatest(F.floor((x - F.lit(lo)) / F.lit(w)), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("long")
    return (
        df.filter(x.isNotNull() & (x >= lo) & (x <= hi))
        .groupBy(bin_.alias("bin"))
        .agg(F.count("*").alias("n"))
        .withColumns(
            {
                "bin_lo": F.col("bin") * F.lit(w) + F.lit(lo),
                "bin_hi": (F.col("bin") + 1) * F.lit(w) + F.lit(lo),
            }
        )
        .select("bin", "bin_lo", "bin_hi", "n")
    )


def profile_drift(
    a: DataFrame, b: DataFrame, cols: list[str] | None = None
) -> DataFrame:
    """Column-profile DRIFT between two table snapshots — the data-contract
    monitor that catches what row-level diffs (operators/diff) don't state:
    null-rate creep, cardinality collapse, range shift, and SCHEMA drift
    (a column present in only one snapshot emits a half-null row via the
    full-outer join, the companion signal to sources/evolved's read-side
    normalization). Each side is profile_columns' ONE-scan aggregate; the
    join is |columns|-sized. Deltas are reported as raw per-side values
    plus min/max shifts so the consumer chooses its own thresholds."""
    pa = profile_columns(a, cols)
    pb = profile_columns(b, cols)
    sa = pa.select(
        "column",
        F.col("n_rows").alias("n_rows_a"),
        F.col("n_null").alias("n_null_a"),
        F.col("n_distinct").alias("n_distinct_a"),
        F.col("min_num").alias("_min_a"),
        F.col("max_num").alias("_max_a"),
    )
    sb = pb.select(
        "column",
        F.col("n_rows").alias("n_rows_b"),
        F.col("n_null").alias("n_null_b"),
        F.col("n_distinct").alias("n_distinct_b"),
        F.col("min_num").alias("_min_b"),
        F.col("max_num").alias("_max_b"),
    )
    return sa.join(sb, "column", "full").select(
        "column",
        "n_rows_a", "n_rows_b", "n_null_a", "n_null_b",
        "n_distinct_a", "n_distinct_b",
        PAR.round6(F.col("_min_b") - F.col("_min_a")).alias("min_shift"),
        PAR.round6(F.col("_max_b") - F.col("_max_a")).alias("max_shift"),
    )
