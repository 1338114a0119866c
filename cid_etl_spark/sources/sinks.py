"""Sinks.

S6 — quoted single-file CSV export (reference: etl_cid10.py:196,370
``to_csv(sep=';', encoding='utf-8-sig', quoting=QUOTE_ALL)``).

Spark's writer is directory-of-parts by design (each task writes its
partition — that's what makes the sink scale).  For the reference's
"one Excel-friendly file" contract we coalesce to one part and
optionally prepend the UTF-8 BOM in a driver-side post-step, since
Spark's CSV writer cannot emit ``utf-8-sig`` itself (SURVEY §4.2.3).

At 100 TB you would *never* call the single-file variant — use
``write_csv`` (partitioned) or parquet; the single-file form exists for
reference-parity exports of small consolidated outputs (~12.4k rows).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame

_BOM = b"\xef\xbb\xbf"


def write_csv(
    df: DataFrame,
    path: str,
    sep: str = ";",
    quote_all: bool = True,
    header: bool = True,
    mode: str = "overwrite",
    encoding: str = "UTF-8",
) -> None:
    """Partitioned (scalable) CSV sink — one part per task.

    *encoding* feeds Spark's writer charset (use ``iso-8859-1`` for
    latin1 exports mirroring the official DataSUS dialect; Spark 4
    rejects the ``latin1`` alias)."""
    (
        df.write.mode(mode)
        .options(
            sep=sep,
            quoteAll=str(quote_all).lower(),
            header=str(header).lower(),
            encoding=encoding,
        )
        .csv(path)
    )


def write_csv_single(
    df: DataFrame,
    out_file: str,
    sep: str = ";",
    quote_all: bool = True,
    header: bool = True,
    bom: bool = True,
) -> str:
    """Single-file CSV export with optional UTF-8 BOM (S6 parity).

    Writes via a temp directory with ``coalesce(1)`` then moves the part
    file to *out_file*, prepending the BOM so Excel detects UTF-8 the
    way the reference's ``utf-8-sig`` did.
    """
    tmp_dir = out_file + "._spark_tmp"
    write_csv(df.coalesce(1), tmp_dir, sep=sep, quote_all=quote_all, header=header)
    parts = sorted(glob.glob(os.path.join(tmp_dir, "part-*")))
    if len(parts) != 1:
        raise RuntimeError(f"expected exactly one part file in {tmp_dir}, got {parts}")
    os.makedirs(os.path.dirname(os.path.abspath(out_file)), exist_ok=True)
    with open(parts[0], "rb") as src, open(out_file, "wb") as dst:
        if bom:
            dst.write(_BOM)
        shutil.copyfileobj(src, dst)
    shutil.rmtree(tmp_dir)
    return out_file


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet sink with optional hive-style partition directories.

    Partition columns become directory keys (``.../lang=en/...``), so
    any downstream filter on them is PARTITION PRUNING — at 100 TB a
    query touching one language reads one directory, not the lake.
    Pick low-cardinality keys (lang, date, source); high-cardinality
    partitioning creates a small-file explosion instead.
    """
    w = df.write.mode(mode)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        w = w.partitionBy(*cols)
    w.parquet(path)


def write_table_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | list[str],
    num_buckets: int = 32,
    sort_cols: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table sink: pre-shuffles data into
    *num_buckets* hash buckets on *bucket_cols* (optionally sorted
    within each bucket).

    The payoff is CO-LOCATED JOINS: two tables bucketed the same way
    on the join key sort-merge-join with NO exchange on either side —
    the shuffle was paid once at write time and amortizes over every
    subsequent join/aggregation on that key (asserted in
    tests/test_sinks.py by checking the physical plan has no Exchange).
    Use for the 2-3 fact tables a pipeline joins repeatedly (orders ⋈
    lineitem on orderkey at every turn of this schema).
    """
    bcols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode(mode).bucketBy(num_buckets, *bcols)
    if sort_cols:
        scols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*scols)
    w.saveAsTable(table)


def compact_parquet(
    spark,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-files maintenance: rewrite a parquet directory into files
    of ~*target_file_bytes* each and return the file count written.

    The small-files problem is the silent killer of 100 TB tables —
    every file costs a task, an open, a footer read; a streaming sink
    or over-parallel write that leaves 10⁶ tiny files makes scans
    scheduler-bound.  Sizing uses the actual on-disk byte size of the
    source (driver-side listing — no data pass), then ONE
    ``repartition(n)`` round-robin shuffle so output files are even.
    Run it per partition directory in production so compaction
    parallelizes across partitions and stays restartable.
    """
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(src_dir):
        for f in files:
            if f.endswith(".parquet") or f.startswith("part-"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_dir)
    df.repartition(n_files).write.mode("overwrite").parquet(dst_dir)
    return n_files


def morton_code(x, y, bits: int = 21):
    """Interleave the low *bits* of two non-negative integer columns
    into a Z-order (Morton) key: bit i of x lands at position 2i, bit i
    of y at 2i+1.  Pure bigint expressions (ANSI-safe: no int/bigint
    mixing), fully codegen — no UDF in the layout path.

    *bits* must cover the key domain (values >= 2^bits alias into the
    low bits and scramble locality); the default 21 bits handles 2M
    distinct values per dimension while keeping the 42-bit code well
    inside bigint."""
    from pyspark.sql import functions as F

    xs = (F.col(x) if isinstance(x, str) else x).cast("bigint")
    ys = (F.col(y) if isinstance(y, str) else y).cast("bigint")
    code = F.lit(0).cast("bigint")
    one = F.lit(1).cast("bigint")
    for i in range(bits):
        code = code.bitwiseOR(
            F.shiftleft(F.shiftright(xs, i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(ys, i).bitwiseAND(one), 2 * i + 1))
    return code


def zorder_write(
    df,
    col_x: str,
    col_y: str,
    dst_dir: str,
    n_files: int = 8,
    bits: int = 21,
) -> None:
    """Z-order-clustered parquet write: range-partition and sort by the
    Morton key of (*col_x*, *col_y*) so rows close in BOTH dimensions
    land in the same files.

    Why it matters at 100 TB: parquet scans skip whole files/row-groups
    via footer min-max stats, but a single-column sort only narrows
    that one column — a predicate on the second column still touches
    every file.  Z-ordering bounds each file to a small rectangle of
    the (x, y) space, so 2-D selective scans (the user x time, part x
    supplier shapes) prune most files on either predicate.  The layout
    costs one range shuffle at write time and nothing at read time.
    """
    from pyspark.sql import functions as F

    code = morton_code(col_x, col_y, bits).alias("__z")
    (
        df.withColumn("__z", code)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(dst_dir)
    )
