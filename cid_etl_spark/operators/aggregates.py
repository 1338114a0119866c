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
from pyspark.sql.window import Window


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


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    salt_buckets: int = 16,
    salt_on: Column | str | None = None,
) -> DataFrame:
    """Two-stage (salted) aggregation for skewed group keys.

    A single ``groupBy(keys)`` sends every row of a hot key to one
    reducer; at 100 TB one executor drags the stage.  Here rows first
    aggregate on ``keys + salt`` (the salt spreads each hot key over
    *salt_buckets* reducers), then the partials merge in a second,
    tiny aggregation on ``keys`` alone.  Results are exactly equal to
    the direct form for decomposable aggregates.

    *aggs* maps output column name → partial-stage aggregate expression;
    the merge stage re-aggregates the partials by name: SUM for sums
    and counts, MIN/MAX for min/max (pass ``merge_`` prefixed names —
    ``sum_x``/``cnt_x``/``min_x``/``max_x`` — so the merge function is
    inferred from the prefix).

    *salt_on* defaults to a deterministic hash of all non-key columns'
    first key — pass an id column for a stable spread.  AQE's skew-join
    handling covers joins; this covers aggregations, where AQE cannot
    split a hot reduce key.
    """
    salt_src = F.col(salt_on) if isinstance(salt_on, str) else salt_on
    if salt_src is None:
        salt_src = F.spark_partition_id()
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(salt_src), F.lit(salt_buckets)))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    merges = []
    for name in aggs:
        if name.startswith(("sum_", "cnt_", "n_")):
            merges.append(F.sum(name).alias(name))
        elif name.startswith("min_"):
            merges.append(F.min(name).alias(name))
        elif name.startswith("max_"):
            merges.append(F.max(name).alias(name))
        else:
            raise ValueError(
                f"salted_agg cannot infer merge for {name!r}; "
                "use a sum_/cnt_/n_/min_/max_ prefix"
            )
    return partial.groupBy(*keys).agg(*merges)


def observed_quality(df: DataFrame, name: str, *null_cols: str):
    """A1/A2 quality counters via ``DataFrame.observe`` — the
    zero-extra-pass form of :func:`quality_counts`: metrics accumulate
    AS the main action runs instead of costing a second scan (the
    reference recomputes its counts with dedicated passes,
    etl_cid10.py:190-193,365-368; at 100 TB a metrics-only rescan is
    real money).  Returns the observed DataFrame; read the metrics
    from ``Observation.get`` after the action, or via a
    ``QueryExecutionListener`` in production.
    """
    from pyspark.sql import Observation

    missing_pred = None
    for c in null_cols:
        p = F.col(c).isNull()
        missing_pred = p if missing_pred is None else (missing_pred | p)
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("total")]
    if missing_pred is not None:
        metrics.append(count_if(missing_pred).alias("missing"))
    return df.observe(obs, *metrics), obs


def _range_bucketed(
    df: DataFrame,
    bucket_value: Column,
    n_buckets: int,
    partition_by: tuple[str, ...] = (),
) -> DataFrame:
    """Tag each row with ``__bucket`` ∈ [0, n_buckets): a range bucket
    of *bucket_value* from a broadcast (min, max) pass — per
    *partition_by* group when given (a low-cardinality grouping like
    lang/region/segment: the bounds rollup stays a |groups|-row
    broadcast).  The bucket function is monotone non-decreasing in the
    value within each group, so per-bucket sorts plus cross-bucket
    offsets reproduce any per-group order exactly — the two-pass trick
    every helper below shares."""
    if partition_by:
        bounds = df.groupBy(*partition_by).agg(
            F.min(bucket_value).cast("double").alias("__lo"),
            F.max(bucket_value).cast("double").alias("__hi"),
        )
        b = df.join(F.broadcast(bounds), list(partition_by))
    else:
        bounds = df.agg(
            F.min(bucket_value).cast("double").alias("__lo"),
            F.max(bucket_value).cast("double").alias("__hi"),
        )
        b = df.join(F.broadcast(bounds))
    # NULL keys get bucket -1: ASC window order puts NULLS FIRST, and
    # Spark's `least` SKIPS nulls, so without the explicit branch a
    # null key would compute a null bucket, fall through `least` to
    # n_buckets-1, and sort AFTER every non-null key — the opposite of
    # the window semantics these helpers must reproduce exactly
    return b.withColumn(
        "__bucket",
        F.when(bucket_value.isNull(), F.lit(-1))
        .when(
            F.col("__hi") > F.col("__lo"),
            F.least(
                F.lit(n_buckets - 1),
                F.floor(
                    (bucket_value.cast("double") - F.col("__lo"))
                    / ((F.col("__hi") - F.col("__lo")) / n_buckets)
                ).cast("int"),
            ),
        )
        .otherwise(F.lit(0)),
    ).drop("__lo", "__hi")


def bucketed_row_number(
    df: DataFrame,
    key: str,
    tiebreaks: tuple[str, ...] = (),
    n_buckets: int = 1024,
    id_col: str = "row_id",
    bucket_value: Column | None = None,
    partition_by: tuple[str, ...] = (),
) -> DataFrame:
    """1-based ``row_number() OVER ([PARTITION BY *partition_by*]
    ORDER BY key, *tiebreaks)`` without the single-partition sort (or,
    with *partition_by*, without one sort partition per group — a
    5-value lang/region/segment key gives only 5 sort tasks however
    big the fact, the same scale killer divided by five): range-bucket
    on *key* (pass *bucket_value* when the key isn't directly castable
    to double, e.g. a DATE — it must be monotone in the key), rank
    within each (group, bucket), and add per-bucket offsets from a
    |groups|·*n_buckets*-row rollup whose own window sorts ≤
    *n_buckets* rows per group.  Equal keys always share a bucket, so
    in-bucket tiebreak ordering composes into the exact per-group
    order."""
    b = _range_bucketed(
        df,
        F.col(key) if bucket_value is None else bucket_value,
        n_buckets,
        partition_by,
    )
    gcols = list(partition_by)
    counts = b.groupBy(*gcols, "__bucket").agg(
        F.count(F.lit(1)).alias("__n")
    )
    w_off = (
        Window.partitionBy(*gcols)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *gcols,
        "__bucket",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__offset"),
    )
    w_in = Window.partitionBy(*gcols, "__bucket").orderBy(key, *tiebreaks)
    return (
        b.join(F.broadcast(offsets), gcols + ["__bucket"])
        .withColumn(id_col, F.col("__offset") + F.row_number().over(w_in))
        .drop("__bucket", "__offset")
    )


def bucketed_cumsum(
    df: DataFrame,
    key: str,
    sum_cols: tuple[str, ...],
    n_buckets: int = 1024,
    inclusive: bool = True,
    prefix: str = "cum_",
    partition_by: tuple[str, ...] = (),
) -> DataFrame:
    """Cumulative sums ``SUM(c) OVER ([PARTITION BY *partition_by*]
    ORDER BY key ROWS UNBOUNDED PRECEDING [AND CURRENT ROW / AND 1
    PRECEDING])`` without the single-partition sort that a global
    ``Window.orderBy`` plans — the classic 100×-scale killer when the
    frame's grain is fact-sized (exact ECDFs, rank sums,
    distinct-value cumulative counts); with *partition_by*, without
    one fact-sized sort task per low-cardinality group.

    Requires *key* unique per row within its group (a distinct-value
    grain, i.e. the output of ``groupBy(*partition_by, key)``), so the
    frame order is total and the ROWS/RANGE distinction is moot.
    Two-pass shape: per-bucket window sums after one range-bucket
    shuffle, plus cross-bucket offsets from a |groups|·*n_buckets*-row
    rollup (its window sorts ≤ *n_buckets* rows per group — bounded by
    a literal, not by data volume)."""
    b = _range_bucketed(df, F.col(key), n_buckets, partition_by)
    gcols = list(partition_by)
    per_bucket = b.groupBy(*gcols, "__bucket").agg(
        *[F.sum(c).alias(f"__t_{c}") for c in sum_cols]
    )
    w_off = (
        Window.partitionBy(*gcols)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.select(
        *gcols,
        "__bucket",
        *[
            F.coalesce(F.sum(f"__t_{c}").over(w_off), F.lit(0)).alias(f"__o_{c}")
            for c in sum_cols
        ],
    )
    upper = 0 if inclusive else -1
    w_in = (
        Window.partitionBy(*gcols, "__bucket")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    out = b.join(F.broadcast(offsets), gcols + ["__bucket"])
    for c in sum_cols:
        out = out.withColumn(
            f"{prefix}{c}",
            F.coalesce(F.sum(c).over(w_in), F.lit(0)) + F.col(f"__o_{c}"),
        )
    return out.drop("__bucket", *[f"__o_{c}" for c in sum_cols])


def assign_contiguous_ids(
    df: DataFrame, key: str, n_buckets: int = 1024, id_col: str = "row_id"
) -> DataFrame:
    """Assign dense 0..N-1 ids in *key* order — the scalable
    ``zipWithIndex``: ``monotonically_increasing_id`` leaves gaps and a
    global ``row_number()`` window funnels every row through ONE
    partition.  Here the fact shuffles once on a range bucket of the
    key: per-bucket counts (a *n_buckets*-row aggregate) turn into
    cumulative offsets with a window over that tiny table, broadcast
    back, and each row's id is its bucket offset plus its rank within
    the bucket.  Bucket boundaries are monotone in *key*, so the result
    equals the single-partition global row_number exactly.
    """
    ranked = bucketed_row_number(
        df, key, n_buckets=n_buckets, id_col=id_col
    )
    return ranked.withColumn(id_col, F.col(id_col) - 1)
