"""Robust CSV ingestion.

Reference behaviors reproduced (Spark-first, not a translation):

- S1 dialect-fallback reader  (/root/reference/etl_cid10.py:28-39): try
  ``(sep, encoding)`` pairs in a fixed order and accept the first parse
  that yields more than one column (a wrong separator parses the whole
  header as a single column).  The probe is a cheap ``limit(1)`` driver
  read of the header only — the full scan stays lazy and distributed.
- S2 plain reader             (etl_cid10.py:42-45)
- S3 fragment-based discovery (etl_cid10.py:204-209): pick the ``.csv``
  in a directory whose name contains a fragment, case-insensitively.
- S4 fixed-dialect latin1 reader ×4 (etl_cid10.py:216-227): Spark's CSV
  source supports latin1 natively under its canonical name ``iso-8859-1``
  (Spark 4 rejects the ``latin1`` alias).

Scale note: the dialect probe runs once on the driver per file; the
chosen dialect is then a plain distributed ``spark.read.csv`` which
splits by HDFS block like any other scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

#: Probe order mirrors the reference (etl_cid10.py:30): Brazilian
#: government CSVs are usually ``;``-separated latin1 (iso-8859-1).
DIALECT_CANDIDATES: tuple[tuple[str, str], ...] = (
    (";", "iso-8859-1"),
    (",", "iso-8859-1"),
    (";", "UTF-8"),
    (",", "UTF-8"),
)


def _read(
    spark: SparkSession,
    path: str,
    sep: str,
    encoding: str,
    schema: StructType | None,
) -> DataFrame:
    reader = spark.read.options(header=True, sep=sep, encoding=encoding, mode="PERMISSIVE")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_csv_robust(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    candidates: tuple[tuple[str, str], ...] = DIALECT_CANDIDATES,
) -> DataFrame:
    """S1: CSV scan with dialect fallback (etl_cid10.py:28-39).

    Accepts the first ``(sep, encoding)`` whose parse yields >1 column;
    falls back to Spark defaults if none do.  Raises
    ``FileNotFoundError`` for a missing local path, like the reference.
    """
    _require_exists(path)
    for sep, encoding in candidates:
        df = _read(spark, path, sep, encoding, schema)
        if len(df.columns) > 1:
            return df
    return spark.read.options(header=True).csv(path)


def read_csv_default(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """S2: plain CSV scan, ``,``-separated UTF-8 (etl_cid10.py:42-45)."""
    _require_exists(path)
    return _read(spark, path, ",", "UTF-8", schema)


def read_csv_latin1_semicolon(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """S4: fixed-dialect official scan, ``;`` + latin1 (etl_cid10.py:216-227)."""
    _require_exists(path)
    return _read(spark, path, ";", "iso-8859-1", schema)


def find_file_by_fragment(directory: str, fragment: str) -> str:
    """S3: return the path of the ``.csv`` in *directory* whose filename
    contains *fragment* (case-insensitive); raise if absent
    (etl_cid10.py:204-209)."""
    frag = fragment.lower()
    for name in sorted(os.listdir(directory)):
        if name.lower().endswith(".csv") and frag in name.lower():
            return os.path.join(directory, name)
    raise FileNotFoundError(f"no CSV matching fragment {fragment!r} in {directory}")


#: DataSUS package member fragments (etl_cid10.py:219-222).
DATASUS_FRAGMENTS: dict[str, str] = {
    "chapters": "CAPITULOS",
    "blocks": "GRUPOS",
    "categories": "CATEGORIAS",
    "subcategories": "SUBCATEGORIAS",
}


def read_datasus_dir_files(spark: SparkSession, directory: str) -> dict[str, DataFrame]:
    """S3+S4: discover and scan the four official DataSUS CSVs
    (etl_cid10.py:216-227).  Returns raw DataFrames keyed by logical
    name; schema mapping happens in :mod:`cid_etl_spark.plans.cid_pipeline`."""
    return {
        key: read_csv_latin1_semicolon(spark, find_file_by_fragment(directory, frag))
        for key, frag in DATASUS_FRAGMENTS.items()
    }


def _require_exists(path: str) -> None:
    # Only meaningful for local paths; object-store URIs defer to Spark.
    if "://" not in path and not os.path.exists(path):
        raise FileNotFoundError(path)
