"""Physical-plan audit helpers — detect the scale anti-patterns that
shuffle counts can't see.

VERDICT r5 found five queries whose plans were green on every shuffle
metric yet funneled a fact-sized grain through ONE window partition: a
window sort is not an ``Exchange hashpartitioning``, so PLANS.md's
shuffle column missed it.  The detector here walks the executed-plan
tree string for ``Window → Sort → Exchange SinglePartition`` chains —
the exact physical shape of ``Window.orderBy`` with no
``partitionBy`` — and classifies each by what feeds the exchange:

- **bounded**: the node under the exchange is the ``__bucket`` offset
  rollup of :func:`cid_etl_spark.operators.aggregates.bucketed_cumsum`
  / ``bucketed_row_number`` (≤ ``n_buckets`` rows by construction, a
  literal, not a data volume) — the sanctioned two-pass pattern.
- **suspect**: anything else.  A suspect window is not automatically a
  bug — a 5-row region rollup is fine — but every one must be
  explicitly justified in ``tests/test_plans.py``'s audit table, so a
  new fact-grain global window fails CI instead of surviving four
  rounds like the r5 statistical batch did.

``Window`` directly over ``TakeOrderedAndProject`` (the heap-cut-then-
rank form hybrid_rrf uses) plans with NO single-partition exchange, so
it never trips the detector.
"""

from __future__ import annotations

import re

#: Node names that start a single-partition-ordered window chain.
_WINDOW_RE = re.compile(r"\b(Window|WindowGroupLimit|RunningWindowFunction)\b")
_SORT_RE = re.compile(r"\bSort \[")
_EXCHANGE_SP = "Exchange SinglePartition"
#: The bucket-offset rollup signature: a grouped aggregate keyed on the
#: range bucket column our helpers generate (bounded by n_buckets).
_BOUNDED_FEED_RE = re.compile(r"HashAggregate\(keys=\[__bucket")


def single_partition_windows(plan: str) -> dict[str, int]:
    """Count ``Window → Sort → Exchange SinglePartition`` chains in an
    executed-plan tree string.  Returns ``{"bounded": b, "suspect":
    s}`` per the classification above."""
    lines = plan.splitlines()
    bounded = suspect = 0
    for i, line in enumerate(lines):
        if _EXCHANGE_SP not in line:
            continue
        # Sort and Window are unary, so the chain is CONSECUTIVE lines:
        # the exchange's parent is the line above, the Sort's parent the
        # line above that (one extra hop when WindowGroupLimit sits
        # between the Window and its Sort)
        if i < 2 or not _SORT_RE.search(lines[i - 1]):
            continue
        window_above = bool(_WINDOW_RE.search(lines[i - 2])) or (
            i >= 3
            and "WindowGroupLimit" in lines[i - 2]
            and _WINDOW_RE.search(lines[i - 3])
        )
        if not window_above:
            continue
        feed_bounded = i + 1 < len(lines) and _BOUNDED_FEED_RE.search(
            lines[i + 1]
        )
        if feed_bounded:
            bounded += 1
        else:
            suspect += 1
    return {"bounded": bounded, "suspect": suspect}


#: Columns whose domain is bounded by a handful of values in the
#: fixture star schema (and in any TPC-H-shaped warehouse): a window
#: partitioned ONLY by these keys runs one task per value, so its
#: per-task input is fact-volume / |values| — the same scale killer as
#: a single-partition window, divided by five (round-6 audit class).
LOW_CARDINALITY_COLS: frozenset[str] = frozenset(
    {
        "lang", "source", "region", "r_name", "n_name", "c_mktsegment",
        "event_type", "flag", "split", "o_orderpriority", "o_orderstatus",
        "l_returnflag", "l_linestatus", "segment", "bucket", "phase",
        "grp", "p", "s",
    }
)

_WINDOW_SPEC_RE = re.compile(
    r"\bWindow \[.*?\], \[([^\]]*)\](?:, \[([^\]]*)\])?"
)
_COL_NAME_RE = re.compile(r"([A-Za-z_][A-Za-z0-9_]*)#\d+")


def lowcard_partition_windows(
    plan: str, lowcard: frozenset[str] = LOW_CARDINALITY_COLS
) -> int:
    """Count Window nodes partitioned ONLY by low-cardinality columns
    over a potentially fact-sized input — each such window runs one
    task per partition value however many executors exist.  A window
    whose next line is a ``WindowGroupLimit`` is exempt: Spark's
    rank-limit pushdown prunes each map partition to the top-k BEFORE
    the shuffle (both Partial and Final group limits appear in the
    plan), so per-value sort tasks see ≤ k·n_input_partitions rows,
    not the fact.  Windows with at least one non-low-cardinality
    partition column (doc_id, user_id, ``__bucket``...) parallelize by
    key and are fine."""
    lines = plan.splitlines()
    hits = 0
    for i, line in enumerate(lines):
        m = _WINDOW_SPEC_RE.search(line)
        if not m:
            continue
        part_spec, order_spec = m.group(1), m.group(2)
        if order_spec is None and (
            " ASC" in part_spec or " DESC" in part_spec
        ):
            # empty partition spec: the single bracket group is the
            # ORDER spec — that's the single-partition-window class,
            # counted by single_partition_windows, not here
            continue
        part_cols = {c.lower() for c in _COL_NAME_RE.findall(part_spec)}
        if not part_cols or not part_cols.issubset(lowcard):
            continue
        if order_spec and "__bucket" in order_spec:
            # the offset rollup of the PARTITIONED bucketed helpers:
            # |groups|·n_buckets rows, each window partition ≤
            # n_buckets rows — bounded by a literal, not data volume
            continue
        if i + 1 < len(lines) and "WindowGroupLimit" in lines[i + 1]:
            continue
        hits += 1
    return hits
