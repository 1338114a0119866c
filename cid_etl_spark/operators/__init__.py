"""Relational + extension operators (SURVEY §2.3-§2.7, §7 M7)."""

from cid_etl_spark.operators.dedup import exact_dedup, priority_dedup
from cid_etl_spark.operators.joins import left_broadcast_join, range_join

__all__ = [
    "exact_dedup",
    "priority_dedup",
    "left_broadcast_join",
    "range_join",
]
