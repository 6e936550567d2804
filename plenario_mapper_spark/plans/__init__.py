"""Query-plan registry: every declared operator surface of the engine.

Each entry couples a Spark DataFrame builder `(spark, sf_dir) -> DataFrame` with an
ANSI-SQL oracle string (DuckDB-runnable on the same parquet tables) or None for
genuinely non-SQL-expressible operators (the driver then records a rows-only check).
"""

from plenario_mapper_spark.plans.registry import QUERIES, ORACLES, register  # noqa: F401
from plenario_mapper_spark.plans import relational  # noqa: F401  (registers on import)
from plenario_mapper_spark.plans import pipeline_ops  # noqa: F401
