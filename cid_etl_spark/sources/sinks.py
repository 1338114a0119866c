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
) -> None:
    """Partitioned (scalable) CSV sink — one part per task."""
    (
        df.write.mode(mode)
        .options(sep=sep, quoteAll=str(quote_all).lower(), header=str(header).lower())
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
