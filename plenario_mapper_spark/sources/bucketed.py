"""Bucketed (co-located) tables: pre-shuffled storage for repeated fact-fact joins.

At 100 TB the dominant recurring cost is shuffling the same fact tables on the
same keys for every join (lineitem⋈orders on orderkey, events⋈sessions on
user_id, ...). Bucketing pays that shuffle ONCE at write time: both tables are
hash-partitioned into the same number of buckets on the join key and sorted
within buckets, so Catalyst plans the join with ZERO Exchange on either side
(SortMergeJoin reads bucket i against bucket i) — asserted by
tests/test_bucketed.py on the physical plan.

Rules for the layout to pay off:
- same bucket count AND same key on both tables (mismatch ⇒ one side re-shuffles);
- bucket count chosen for the TARGET cluster's parallelism (e.g. 4096 at 100 TB,
  a multiple of executor cores), not the current input size;
- `spark.sql.sources.bucketing.enabled` (default on) and
  `spark.sql.legacy.bucketedTableScan.outputOrdering=true` to also elide the Sort.

Spark bucketing requires the session catalog (saveAsTable) — plain
`.parquet(path)` writes carry no bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist `df` as a bucketed (and bucket-sorted) catalog table. With
    `path`, an external table at that location (warehouse.dir is a static
    conf — an explicit location sidesteps it)."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed catalog tables on their bucket key.

    With matching bucketing this is a shuffle-free sort-merge join; Spark
    verifies via the catalog's bucket spec, nothing to hint."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
