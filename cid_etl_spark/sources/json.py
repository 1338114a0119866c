"""JSON-lines source/sink.

The reference reads only CSV (/root/reference/etl_cid10.py:28-45); a
modern corpus pipeline ingests JSONL drops (crawl dumps, API exports)
constantly, and Spark's native JSON source gives schema projection +
predicate pushdown-adjacent pruning for free.  Keep reads
schema-explicit: ``inferSchema`` over 100 TB of JSONL is a full extra
pass, and silently widens types between drops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    multiline: bool = False,
) -> DataFrame:
    """Read newline-delimited JSON.  Pass *schema* (StructType or DDL
    string) in production — inference is a convenience for exploration
    only.  Corrupt lines land in ``_corrupt_record`` (PERMISSIVE mode)
    instead of failing the job, mirroring the reference's defensive
    CSV handling."""
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    )
    if multiline:
        reader = reader.option("multiLine", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    """Write newline-delimited JSON, optionally hive-partitioned (the
    layout that lets downstream readers prune whole directories) and/or
    compressed (``gzip``/``zstd`` — splittable formats matter at scale;
    prefer zstd)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
