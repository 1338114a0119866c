"""Aggregation helpers (SURVEY §2.4) + deterministic-output utilities.

The reference's only aggregates are a row count and a conditional count
(etl_cid10.py:190-193,365-368); the engine exposes them plus the
general grouped-aggregation surface as thin declarative wrappers.

Determinism note for oracle parity: floating-point SUM order is not
associative, so cross-engine hash comparison of raw double sums can
flip in the last ulp.  :func:`decimal_sum` aggregates money-like
doubles as exact decimals (deterministic in any partition order), then
the caller rounds/casts once at the end — the pattern every oracle
query in ``__spark_entry__`` uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def decimal_sum(c: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Exact (order-independent) sum of a money-like double column:
    cast each value to DECIMAL first, sum in decimal arithmetic."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast(f"decimal({precision},{scale})"))


def money(c: Column) -> Column:
    """Render an exact decimal aggregate as a stable double for output
    (round to cents then cast — deterministic both here and in DuckDB)."""
    return F.round(c, 2).cast("double")


def count_if(cond: Column) -> Column:
    """A2 — conditional count (etl_cid10.py:191,366)."""
    return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")


def quality_counts(df: DataFrame, *null_cols: str) -> dict[str, int]:
    """A1/A2 — the reference's end-of-run quality metrics as a dict
    instead of prints (etl_cid10.py:190-193,365-368): total rows and
    rows where ANY of *null_cols* is NULL.  One job, one pass."""
    missing_pred = None
    for c in null_cols:
        p = F.col(c).isNull()
        missing_pred = p if missing_pred is None else (missing_pred | p)
    agg = [F.count(F.lit(1)).alias("total")]
    if missing_pred is not None:
        agg.append(count_if(missing_pred).alias("missing"))
    row = df.agg(*agg).collect()[0]
    out = {"total": row["total"]}
    if missing_pred is not None:
        out["missing_hierarchy"] = row["missing"]
    return out


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """O1-adjacent — global top-k: Spark plans TakeOrderedAndProject
    (per-partition heap + driver merge), never a full sort."""
    return df.orderBy(*order).limit(k)
