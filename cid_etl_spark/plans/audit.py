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

Structural notes (r7 hardening, ADVICE r6):

- ``Sort`` and ``Window`` are unary operators, and in Spark's tree-art
  ``toString()`` a node's FIRST child is always the next line — so the
  Window → Sort → Exchange chain really is consecutive lines; that
  part of the parser is structurally sound, and
  ``tests/test_plans.py`` pins it against canned plan strings so a
  Spark formatting change breaks a unit test, not silently the audit.
- The bounded-feed check walks the exchange's SUBTREE by tree depth
  (not "the single next line"), skipping AQE/reuse wrapper nodes, so
  an ``AQEShuffleRead`` / ``ShuffleQueryStage`` / ``ReusedExchange``
  between the exchange and its rollup no longer misclassifies the
  sanctioned pattern as suspect.
- Low-cardinality window detection resolves partition columns through
  DIRECT-ALIAS lineage (``lang#45 AS language#123`` chains) before
  consulting the name list, so renaming a low-card column no longer
  dodges the detector.  Only bare renames are followed — an expression
  like ``substring(lang, ..)`` prints with parentheses before ``AS``
  and is deliberately not treated as the same column.
"""

from __future__ import annotations

import re

#: Node names that start a single-partition-ordered window chain.
_WINDOW_RE = re.compile(r"\b(Window|WindowGroupLimit|RunningWindowFunction)\b")
_SORT_RE = re.compile(r"\bSort \[")
_EXCHANGE_SP = "Exchange SinglePartition"
#: The bucket-offset rollup signature: a grouped aggregate keyed on the
#: range bucket column our helpers generate (bounded by n_buckets).
_BOUNDED_FEED_RE = re.compile(r"HashAggregate\(keys=\[(?:[^\]]*,\s*)?__bucket")
#: Wrapper nodes that may sit between an exchange and its real input
#: without changing what feeds it.  Benign row-level unary operators
#: (Project/Filter and codegen wrappers) are included (ADVICE r7 #4):
#: a Project between the exchange and the ``__bucket`` rollup cannot
#: change the feed's bounded cardinality, and stopping at it
#: reclassified the sanctioned pattern as suspect after innocuous plan
#: changes.  The walk still DECIDES only at an aggregate (bounded) or
#: any non-listed node (suspect) — joins, generators, unions, scans
#: all fail through to suspect, preserving fail-safe behavior.
_PASSTHROUGH_RE = re.compile(
    r"\b(AQEShuffleRead|ShuffleQueryStage|ReusedExchange|InputAdapter|"
    r"TableCacheQueryStage|ResultQueryStage|InMemoryRelation|"
    r"Project|Filter|ColumnarToRow|WholeStageCodegen)\b"
)

_ART_PREFIX_RE = re.compile(r"^[\s:+|-]*")


def _tree_depth(line: str) -> int:
    """Length of the tree-art prefix (``'   :- '`` etc.) — child nodes
    print strictly deeper than their parent."""
    return _ART_PREFIX_RE.match(line).end()


def _feed_is_bounded(lines: list[str], i: int) -> bool:
    """True when the subtree under the exchange at *lines[i]* feeds it
    from the ``__bucket`` offset rollup: descend through wrapper nodes;
    the first REAL child decides."""
    depth = _tree_depth(lines[i])
    for j in range(i + 1, len(lines)):
        if _tree_depth(lines[j]) <= depth:
            return False
        if _BOUNDED_FEED_RE.search(lines[j]):
            return True
        if not _PASSTHROUGH_RE.search(lines[j]):
            return False
    return False


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
        if _feed_is_bounded(lines, i):
            bounded += 1
        else:
            suspect += 1
    return {"bounded": bounded, "suspect": suspect}


#: Plan-local DERIVED aliases with a handful-of-values domain —
#: window/bucket labels, split names, region renames — which cannot be
#: measured from fixture schemas because they only exist inside query
#: plans.  The FIXTURE-column portion of the low-cardinality list is
#: no longer hand-maintained: it is generated by
#: ``tools/fixture_cardinality.py`` from measured distinct counts
#: (≤ 100 at BOTH sf0.01 and sf0.1 — requiring both scales rejects
#: columns whose cardinality merely grows slowly with volume), VERDICT
#: r7 #7.
_DERIVED_LOWCARD_ALIASES: frozenset[str] = frozenset(
    {"region", "flag", "split", "segment", "bucket", "phase", "grp", "p", "s"}
)

from cid_etl_spark.plans.fixture_cardinality import (  # noqa: E402
    FIXTURE_LOWCARD_COLS,
)

#: Columns whose domain is bounded by a handful of values: a window
#: partitioned ONLY by these keys runs one task per value, so its
#: per-task input is fact-volume / |values| — the same scale killer as
#: a single-partition window, divided by |values| (round-6 audit
#: class).  Measured fixture columns ∪ derived plan aliases.
LOW_CARDINALITY_COLS: frozenset[str] = (
    FIXTURE_LOWCARD_COLS | _DERIVED_LOWCARD_ALIASES
)

_WINDOW_NODE_RE = re.compile(r"\bWindow \[")
_COL_REF_RE = re.compile(r"([A-Za-z_][A-Za-z0-9_]*)#(\d+)")


def _bracket_groups(s: str) -> list[str]:
    """Split the top-level ``[...]`` groups of a plan-node argument
    list by bracket DEPTH, so a ``], [`` inside the window-function
    list (array literals, lambda expressions) cannot mis-split the
    partition spec the way a non-greedy regex would (ADVICE r6)."""
    groups: list[str] = []
    depth = 0
    start = 0
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == "]" and depth > 0:
            depth -= 1
            if depth == 0:
                groups.append(s[start:i])
    return groups


def _window_specs(line: str) -> tuple[str, str | None] | None:
    """Extract ``(partition_spec, order_spec)`` from a ``Window [...]``
    plan line, or None when the line is not a Window node.  A Window
    prints ``Window [funcs], [partition], [order]``; with no
    partitionBy only two groups appear and the single spec group is
    the ORDER spec (recognizable by its ASC/DESC markers)."""
    m = _WINDOW_NODE_RE.search(line)
    if not m:
        return None
    groups = _bracket_groups(line[m.start() + len("Window ") :])
    if len(groups) >= 3:
        return groups[1], groups[2]
    if len(groups) == 2:
        return groups[1], None
    return None
#: A DIRECT alias — a bare attribute reference immediately before
#: `` AS``.  Derived expressions print with a closing paren before the
#: ``AS`` and do not match (see module docstring).
_DIRECT_ALIAS_RE = re.compile(
    r"(?<![\w#.)\]])([A-Za-z_][A-Za-z0-9_]*)#(\d+)L? AS "
    r"([A-Za-z_][A-Za-z0-9_]*)#(\d+)"
)


def _alias_resolver(plan: str):
    """Return ``resolve(name, expr_id) -> origin_name`` following
    direct-rename chains (``a#1 AS b#2``, ``b#2 AS c#3`` ⇒ c resolves
    to a).  Cycle-guarded; unknown ids resolve to themselves."""
    parent: dict[str, tuple[str, str]] = {}
    for m in _DIRECT_ALIAS_RE.finditer(plan):
        src_name, src_id, _dst_name, dst_id = m.groups()
        parent[dst_id] = (src_name, src_id)

    def resolve(name: str, expr_id: str) -> str:
        seen: set[str] = set()
        while expr_id in parent and expr_id not in seen:
            seen.add(expr_id)
            name, expr_id = parent[expr_id]
        return name

    return resolve


def lowcard_partition_windows(
    plan: str, lowcard: frozenset[str] = LOW_CARDINALITY_COLS
) -> int:
    """Count Window nodes partitioned ONLY by low-cardinality columns
    over a potentially fact-sized input — each such window runs one
    task per partition value however many executors exist.  Partition
    columns are resolved through direct-alias lineage first, so
    ``F.col("lang").alias("language")`` is still caught.  A window
    whose next line is a ``WindowGroupLimit`` is exempt: Spark's
    rank-limit pushdown prunes each map partition to the top-k BEFORE
    the shuffle (both Partial and Final group limits appear in the
    plan), so per-value sort tasks see ≤ k·n_input_partitions rows,
    not the fact.  Windows with at least one non-low-cardinality
    partition column (doc_id, user_id, ``__bucket``...) parallelize by
    key and are fine."""
    lines = plan.splitlines()
    resolve = _alias_resolver(plan)
    hits = 0
    for i, line in enumerate(lines):
        specs = _window_specs(line)
        if specs is None:
            continue
        part_spec, order_spec = specs
        if order_spec is None and (
            " ASC" in part_spec or " DESC" in part_spec
        ):
            # empty partition spec: the single bracket group is the
            # ORDER spec — that's the single-partition-window class,
            # counted by single_partition_windows, not here
            continue
        part_cols = {
            resolve(name, expr_id).lower()
            for name, expr_id in _COL_REF_RE.findall(part_spec)
        }
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
