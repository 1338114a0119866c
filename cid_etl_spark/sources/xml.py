"""XML source/sink — Spark 4 native (`spark.read.format("xml")`).

The reference reads only CSV (etl_cid10.py:28-45); XML rounds out the
self-describing-format surface next to JSONL (sources/json.py) and ORC
(sources/orc.py).  Spark 4 folded the former spark-xml package into
core, so no external jar is needed.

Scale notes: XML is a LINE-UNSPLITTABLE format only when one record
spans many lines (the usual case) — Spark parallelizes across FILES,
not within one file, so a 100 TB XML drop must arrive as many files
(the parser is per-record streaming, memory is bounded by record
size).  Schema inference scans the data once; production paths should
pass an explicit schema like every other source here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """Read XML records under *row_tag* (one row per element)."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """Write *df* as XML part files (one *row_tag* element per row)."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode(mode)
        .save(path)
    )
