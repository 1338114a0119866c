"""Pure Column-expression scalar function libraries.

Everything here compiles to Catalyst expressions (whole-stage codegen,
no Python in the row path) — the Spark-first replacement for the
reference's row-wise ``Series.apply`` UDFs (SURVEY §2.8/§2.9).
"""

from cid_etl_spark.functions.strings import (
    concat_range,
    extract_root_category,
    format_subcat,
    normalize_code,
    subcategory_or_null,
)

__all__ = [
    "concat_range",
    "extract_root_category",
    "format_subcat",
    "normalize_code",
    "subcategory_or_null",
]
