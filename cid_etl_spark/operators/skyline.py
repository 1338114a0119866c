"""Distributed Pareto frontier (skyline) operator.

``pareto_frontier(df, x, y)`` returns the rows not STRICTLY dominated
in both dimensions: no other row has ``x' > x`` AND ``y' > y``.  The
SQL spelling is a quadratic ``NOT EXISTS`` anti-join; the distributed
spelling here is the classic partition-prune-merge skyline:

1. **Local prune (parallel).**  Within every partition, a row survives
   iff no strictly-higher-x row in the SAME partition beats its y.
   Computed as: per-(partition, x) max of y, then a running max over
   strictly-greater x values via a window PARTITIONED BY the partition
   id — every partition's window runs independently, so the pass is
   one balanced shuffle, never a global sort.  Any partitioning is
   CORRECT (the union of local frontiers always contains the global
   frontier — a globally undominated row is locally undominated), so
   the pseudo-random partition id affects only pruning power, not the
   result.

2. **Global merge (tiny).**  The same computation over the surviving
   candidates with a single global window.  The candidate set is at
   most (local frontier sizes summed); for p partitions of n uniform
   random points it concentrates around p·O(log n) — and in the worst
   (fully anti-correlated) case the candidates ARE the answer, so the
   merge is output-bound, which is the best any skyline algorithm can
   claim.

Ties: rows equal in x (or in both dims) never dominate each other —
dominance is strict in BOTH coordinates, matching the ``NOT EXISTS``
oracle exactly.

NULLs: a row with NULL in either coordinate can neither dominate
(``NULL > v`` is never true) nor be dominated (same reason), so under
the ``NOT EXISTS`` oracle it always survives and never affects other
rows.  Such rows bypass the prune entirely and are unioned back —
keeping the prune's equi-join free of NULL keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _prune(df: DataFrame, x: str, y: str, part_cols: list[str]) -> DataFrame:
    """Drop rows dominated WITHIN each group of *part_cols* (empty list
    = global): row survives iff max(y) over strictly-greater x in the
    group is NULL or <= y."""
    gmax = df.groupBy(*part_cols, x).agg(F.max(y).alias("__gmax"))
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col(x).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    ) if part_cols else (
        Window.orderBy(F.col(x).desc()).rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = gmax.withColumn("__prior", F.max("__gmax").over(w)).drop("__gmax")
    return df.join(prior, part_cols + [x]).filter(
        F.col("__prior").isNull() | (F.col(y) >= F.col("__prior"))
    ).drop("__prior")


def pareto_frontier(df: DataFrame, x: str, y: str, buckets: int = 64) -> DataFrame:
    """Rows not strictly dominated in both *x* and *y* (maximize both).

    Two-phase partition-prune-merge (module docstring): the parallel
    local prune does the heavy lifting; the single-partition global
    window runs only over the pruned candidate set, whose size is
    governed by the frontier itself, not the input.

    The local-prune group key is a DETERMINISTIC hash bucket of
    (x, y) — NOT ``spark_partition_id()``, which is re-evaluated
    independently in each branch of the self-join inside the prune and
    can disagree between scans (different column pruning → different
    file splits), silently corrupting the join.  A content hash gives
    every branch the same key for the same row, costs the same one
    balanced shuffle, and keeps the correctness argument (any grouping
    works; grouping only affects pruning power).
    """
    null_mask = F.col(x).isNull() | F.col(y).isNull()
    passthrough = df.filter(null_mask)
    tagged = df.filter(~null_mask).withColumn(
        "__pid", F.pmod(F.xxhash64(F.col(x), F.col(y)), F.lit(buckets))
    )
    local = _prune(tagged, x, y, ["__pid"]).drop("__pid")
    return _prune(local, x, y, []).unionByName(passthrough)
