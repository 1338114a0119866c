"""Pipeline compositions — the CID-10 flagship (both reference entry
points) expressed as lazy DataFrame plans."""

from cid_etl_spark.plans.cid_pipeline import (
    OUTPUT_COLUMNS,
    build_structured,
    prepare_datasus,
    run_etl,
    run_etl_from_datasus_dir,
)

__all__ = [
    "OUTPUT_COLUMNS",
    "build_structured",
    "prepare_datasus",
    "run_etl",
    "run_etl_from_datasus_dir",
]
