"""Driver contract for the spark-graft builder (PySpark target).

entry() smoke-runs the flagship pipeline; queries()/oracle_sql() expose the full
declared operator surface (SURVEY.md §2 + §2.H extensions) for the DuckDB oracle
gate. Registry lives in plenario_mapper_spark/plans/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _configure(spark: SparkSession) -> SparkSession:
    # Engine policy knobs that matter for correctness/scale even on a provided
    # session (JS map semantics; AQE for runtime re-planning).
    for k, v in (
        ("spark.sql.mapKeyDedupPolicy", "LAST_WIN"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.adaptive.enabled", "true"),
        # scale-adaptive broadcast policy (see session.get_spark): estimate-driven
        # static broadcasts only for genuinely tiny relations; AQE converts from
        # actual runtime sizes.
        ("spark.sql.autoBroadcastJoinThreshold", "1MB"),
        ("spark.sql.adaptive.autoBroadcastJoinThreshold", "64MB"),
        # cached tiny intermediates coalesce to runtime-right partition counts
        ("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's hot path (normalize -> broadcast schema-registry
    join -> validate -> coerce -> split -> route) over sf0.001 events."""
    from plenario_mapper_spark.plans import QUERIES

    _configure(spark)
    return QUERIES["q_mapper_route_events"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from plenario_mapper_spark.plans import QUERIES

    return {
        name: (lambda s, d, _fn=fn: _fn(_configure(s), d))
        for name, fn in QUERIES.items()
    }


def oracle_sql() -> dict[str, str]:
    from plenario_mapper_spark.plans import ORACLES

    return dict(ORACLES)
