#!/usr/bin/env python3
"""Mechanical shared-fragment discovery (round 9): find plan subtrees
that appear IDENTICALLY (canonicalized) in two or more registered
queries' analyzed plans — the data-driven version of the question the
fragment catalog answers by hand ("which intermediates do batches
recompute?").

For every registered query, walk the analyzed logical plan and record
each Aggregate / Window / Generate node's canonicalized subtree string
(the grain changes where shared work concentrates; scans and cheap
projections are excluded on purpose — a bare-scan 'fragment' is the
derivation-poisoning case run_batch's bucketed facts exist for).
Subtrees already declared in plans.batch.FRAGMENTS are credited to
their fragment name; anything ELSE shared by >= 2 queries is a
candidate the catalog is missing.

Usage:  python tools/find_shared_subtrees.py [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GRAIN_NODES = {"Aggregate", "Window", "Generate"}


def subtree_keys(root, declared_plans) -> tuple[dict[str, str], set[str]]:
    """Walk *root* and return ``({canonical-subtree: nodeName}, {hit
    fragment names})``.  A node that ``sameResult``s a DECLARED
    fragment plan is credited by name and NOT descended into — its
    internal Aggregates/Windows/Generates are already shared through
    the fragment, so reporting them as candidates would be noise (the
    first sweep listed token_stream's explode and bm25_scores'
    internal rollups as 'undeclared')."""
    out: dict[str, str] = {}
    hits: set[str] = set()
    stack = [root]
    while stack:
        node = stack.pop()
        frag = next(
            (n for n, fp in declared_plans.items() if node.sameResult(fp)),
            None,
        )
        if frag is not None:
            hits.add(frag)
            continue
        name = node.nodeName()
        if name in GRAIN_NODES:
            out[node.canonicalized().toString()] = name
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return out, hits


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from cid_etl_spark.plans.batch import FRAGMENTS
    from cid_etl_spark.queries import spark_queries
    from cid_etl_spark.session import get_spark

    spark = get_spark("find-shared-subtrees")
    spark.sparkContext.setLogLevel("ERROR")
    queries = spark_queries()

    declared_plans = {
        fname: builder(spark, args.sf)._jdf.queryExecution().analyzed()
        for fname, builder in FRAGMENTS.items()
    }

    by_subtree: dict[str, set[str]] = defaultdict(set)
    kinds: dict[str, str] = {}
    frag_consumers: dict[str, set[str]] = defaultdict(set)
    for qname, fn in sorted(queries.items()):
        try:
            root = fn(spark, args.sf)._jdf.queryExecution().analyzed()
        except Exception as exc:  # streaming staging etc.
            print(f"# skip {qname}: {type(exc).__name__}", flush=True)
            continue
        keys, hits = subtree_keys(root, declared_plans)
        for frag in hits:
            frag_consumers[frag].add(qname)
        for key, kind in keys.items():
            by_subtree[key].add(qname)
            kinds[key] = kind

    for fname in FRAGMENTS:
        qs = frag_consumers.get(fname, set())
        print(f"DECLARED {fname}: {len(qs)} consumers {sorted(qs)}")
    candidates = sorted(
        ((k, qs) for k, qs in by_subtree.items() if len(qs) >= 2),
        key=lambda kv: -len(kv[1]),
    )
    for key, qs in candidates:
        digest = hashlib.sha1(key.encode()).hexdigest()[:10]
        head = key.splitlines()[0][:100]
        print(f"CANDIDATE {kinds[key]} {digest} ({len(qs)} queries): "
              f"{sorted(qs)}\n  {head}")
    print(f"# {len(FRAGMENTS)} declared fragments, "
          f"{len(candidates)} undeclared shared candidates")


if __name__ == "__main__":
    main()
