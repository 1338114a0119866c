"""ORC source/sink.

The reference reads only CSV (/root/reference/etl_cid10.py:28-49); a
complete engine must also speak the columnar formats a lakehouse
actually stores.  ORC rides Spark's native vectorized reader/writer:
predicate pushdown, column pruning, and partition pruning all work
exactly as for parquet (`spark.read.orc` → OrcScan with PushedFilters),
so there is no custom code path to maintain — these wrappers pin the
options that matter at scale and give the format a tested seam.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_orc(spark: SparkSession, path: str, merge_schema: bool = False) -> DataFrame:
    """Vectorized ORC scan; ``merge_schema`` reconciles files written
    with evolving schemas (costs a footer read per file — leave off
    unless needed)."""
    return (
        spark.read.option("mergeSchema", str(merge_schema).lower()).orc(path)
    )


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """ORC sink with zstd (best scan-speed/size tradeoff of the
    supported codecs) and optional hive partitioning for partition
    pruning downstream."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
