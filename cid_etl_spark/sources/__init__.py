"""Sources and sinks: robust CSV ingestion, parquet fixture loaders,
quoted-CSV export."""

from cid_etl_spark.sources.csv import (
    find_file_by_fragment,
    read_csv_default,
    read_csv_robust,
    read_datasus_dir_files,
)
from cid_etl_spark.sources.parquet import TABLES, load_table, load_tables
from cid_etl_spark.sources.sinks import write_csv_single

__all__ = [
    "find_file_by_fragment",
    "read_csv_default",
    "read_csv_robust",
    "read_datasus_dir_files",
    "TABLES",
    "load_table",
    "load_tables",
    "write_csv_single",
]
