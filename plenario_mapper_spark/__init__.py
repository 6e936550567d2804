"""plenario_mapper_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of UrbanCCD-UChicago/plenario-mapper.

The reference (/root/reference, ~2.4k LoC of Node.js) is a streaming ETL/validation
engine: it consumes sensor observations from Kinesis, validates + type-coerces them
against two metadata dimension tables, splits each record into a clean half (routed to
per-(network, feature) tables) and a misfit half (dead-lettered as JSON), emits
per-feature messages, and raises deduplicated error/resolve alerts.

This package re-expresses those semantics Spark-first:

- the observation stream is a DataFrame (batch or Structured Streaming);
- metadata lookup (ref: in-memory hash maps, app/mapper.js:39-40) is a broadcast
  stream-static join;
- validation/coercion/split (app/mapper.js:192-298) are pure Column expressions over a
  MAP<STRING, VARIANT> data column — no Python on the hot path, whole-stage codegen
  throughout;
- routing (app/mapper.js:319-358) is filter+project per (network, feature), or a single
  partitioned lake write;
- alert dedup (app/mapper.js:42,455-489) is keyed streaming state.

Beyond reference parity the package declares the full relational surface (joins, aggs,
windows, set ops — plans/relational.py) verified against a DuckDB oracle, plus
large-scale training-data-pipeline operators (dedup families, similarity search, text
analysis, multimodal columns) designed for 100 TB / 1000-executor scale.
"""

from plenario_mapper_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
