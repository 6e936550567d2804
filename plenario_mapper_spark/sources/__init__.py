"""Source constructors: observation stream readers and metadata-dimension readers.

SURVEY §2.A rows A1-A5. Sinks (A6-A9) live with the micro-batch driver in
`streaming.pipeline` because routing is per-batch logic, not a reader concern.
"""

from plenario_mapper_spark.sources.observations import (
    decode_kinesis_records,
    file_obs_source,
    kinesis_replay_source,
    kinesis_source,
    parquet_obs_source,
)
from plenario_mapper_spark.sources.evolved import read_evolved
from plenario_mapper_spark.sources.kinesis_py import (
    KinesisPyDataSource,
    kinesis_py_source,
)
from plenario_mapper_spark.sources.metadata_store import (
    jdbc_metadata_provider,
    normalize_metadata_frames,
    parquet_metadata_provider,
)

__all__ = [
    "decode_kinesis_records",
    "file_obs_source",
    "kinesis_replay_source",
    "kinesis_source",
    "KinesisPyDataSource",
    "kinesis_py_source",
    "parquet_obs_source",
    "jdbc_metadata_provider",
    "normalize_metadata_frames",
    "parquet_metadata_provider",
    "read_evolved",
]
