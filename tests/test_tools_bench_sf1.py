"""Drift-guard semantics of tools/bench_sf1.py (ADVICE r9 #2): a
drifted longest-task number must NOT ratchet into the committed
reference — the baseline is sticky under drift so the failure
reproduces on re-run, and only ``--accept-drift`` (a human decision)
resets it to the fresh measurement.  Pure-Python: no Spark session.
"""

from __future__ import annotations

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "bench_sf1",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "bench_sf1.py",
    ),
)
bench_sf1 = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bench_sf1)


def test_green_run_never_loosens_baseline():
    # ADVICE r10 #2: a slow-but-green sample keeps the old reference —
    # upward movement is --accept-drift only
    results = {"q": {"longest_task_sec": 1.1}}
    prev = {"q": {"longest_task_sec": 1.0, "baseline_longest_task_sec": 1.0}}
    drift = bench_sf1._apply_drift_guard(results, prev)
    assert drift == {}
    assert results["q"]["baseline_longest_task_sec"] == 1.0


def test_drift_is_sticky_and_reproduces():
    bound = bench_sf1.DRIFT_BOUND
    results = {"q": {"longest_task_sec": round(2.0 * bound * 1.0, 2)}}
    prev = {"q": {"longest_task_sec": 1.0, "baseline_longest_task_sec": 1.0}}
    drift = bench_sf1._apply_drift_guard(results, prev)
    assert "q" in drift and drift["q"]["baseline_longest_task_sec"] == 1.0
    # the written entry carries the OLD baseline forward...
    assert results["q"]["baseline_longest_task_sec"] == 1.0
    # ...so an identical re-run against the written file still fails
    rerun = {"q": {"longest_task_sec": results["q"]["longest_task_sec"]}}
    drift2 = bench_sf1._apply_drift_guard(rerun, results)
    assert "q" in drift2 and drift2["q"]["baseline_longest_task_sec"] == 1.0


def test_accept_drift_resets_baseline():
    results = {"q": {"longest_task_sec": 9.0}}
    prev = {"q": {"longest_task_sec": 1.0, "baseline_longest_task_sec": 1.0}}
    drift = bench_sf1._apply_drift_guard(results, prev, accept_drift=True)
    assert drift == {}
    assert results["q"]["baseline_longest_task_sec"] == 9.0


def test_legacy_file_without_baseline_field_still_guards():
    # the committed BENCH_SF1.json predates the baseline field: the
    # guard falls back to the recorded longest_task_sec as reference
    results = {"q": {"longest_task_sec": 5.0}}
    prev = {"q": {"longest_task_sec": 1.0}}
    drift = bench_sf1._apply_drift_guard(results, prev)
    assert "q" in drift and drift["q"]["baseline_longest_task_sec"] == 1.0


def test_sub_quarter_second_references_never_flag():
    results = {"q": {"longest_task_sec": 3.0}}
    prev = {"q": {"longest_task_sec": 0.2, "baseline_longest_task_sec": 0.2}}
    assert bench_sf1._apply_drift_guard(results, prev) == {}
    # ...and the slow sample does not loosen the reference either
    assert results["q"]["baseline_longest_task_sec"] == 0.2


def test_sub_second_swings_need_absolute_delta():
    # a 0.6s reference swinging to 1.5s is a 2.5x ratio but only a
    # 0.9s delta — scheduler/stall noise, not a decomposition change
    results = {"q": {"longest_task_sec": 1.5}}
    prev = {"q": {"baseline_longest_task_sec": 0.6, "longest_task_sec": 0.6}}
    assert bench_sf1._apply_drift_guard(results, prev) == {}


def test_green_update_tighten_only():
    cap = bench_sf1.BASELINE_TIGHTEN_CAP
    # lucky fast sample: baseline tightens at most cap per run
    results = {"q": {"longest_task_sec": 1.0}}
    prev = {"q": {"baseline_longest_task_sec": 4.0, "longest_task_sec": 4.0}}
    assert bench_sf1._apply_drift_guard(results, prev) == {}
    assert results["q"]["baseline_longest_task_sec"] == round(cap * 4.0, 2)
    # slow-but-green sample: baseline NEVER loosens (ADVICE r10 #2) —
    # the old 1/cap-per-run loosening let a sustained sub-bound creep
    # ratchet the reference upward indefinitely
    results = {"q": {"longest_task_sec": 5.5}}
    prev = {"q": {"baseline_longest_task_sec": 4.0, "longest_task_sec": 4.0}}
    assert bench_sf1._apply_drift_guard(results, prev) == {}
    assert results["q"]["baseline_longest_task_sec"] == 4.0


def test_sustained_creep_eventually_flags():
    # regression of the ratchet: +30% per run is green each round under
    # the old loosening but must eventually trip DRIFT_BOUND now that
    # the reference is pinned
    ref = {"q": {"baseline_longest_task_sec": 4.0, "longest_task_sec": 4.0}}
    wall = 4.0
    flagged = False
    for _ in range(6):
        wall = round(wall * 1.3, 2)
        results = {"q": {"longest_task_sec": wall}}
        if bench_sf1._apply_drift_guard(results, ref):
            flagged = True
            break
        ref = results
    assert flagged


def test_new_query_has_no_reference():
    results = {"q": {"longest_task_sec": 3.0}}
    assert bench_sf1._apply_drift_guard(results, {}) == {}
    assert results["q"]["baseline_longest_task_sec"] == 3.0


def test_stall_on_raw_max_only_is_discounted():
    # round 11: the raw max drifts 3x but the second-longest stage max
    # holds — one task absorbed a host freeze, not a decomposition
    # change.  Green, baselines untouched, discount recorded.
    results = {"q": {"longest_task_sec": 9.9, "longest_task2_sec": 3.1}}
    prev = {"q": {
        "baseline_longest_task_sec": 3.3, "longest_task_sec": 3.3,
        "baseline_longest_task2_sec": 3.0, "longest_task2_sec": 3.0,
    }}
    assert bench_sf1._apply_drift_guard(results, prev) == {}
    assert results["q"]["baseline_longest_task_sec"] == 3.3
    assert results["q"]["baseline_longest_task2_sec"] == 3.0
    assert results["q"]["stall_discounted"]["longest_task_sec"] == 9.9


def test_drift_confirmed_by_second_max_still_flags():
    # a genuine decomposition change lengthens every iteration's stage:
    # both statistics blow their bounds -> the flag survives
    results = {"q": {"longest_task_sec": 9.9, "longest_task2_sec": 9.0}}
    prev = {"q": {
        "baseline_longest_task_sec": 3.3, "longest_task_sec": 3.3,
        "baseline_longest_task2_sec": 3.0, "longest_task2_sec": 3.0,
    }}
    drift = bench_sf1._apply_drift_guard(results, prev)
    assert "q" in drift and drift["q"]["ratio"] == 3.0
    assert results["q"]["baseline_longest_task_sec"] == 3.3  # sticky


def test_no_runner_up_reference_keeps_raw_semantics():
    # single-heavy-stage queries (or legacy files without the max2
    # field) cannot confirm -> the raw-max flag stands, as before
    results = {"q": {"longest_task_sec": 9.9, "longest_task2_sec": 0.0}}
    prev = {"q": {"baseline_longest_task_sec": 3.3, "longest_task_sec": 3.3}}
    drift = bench_sf1._apply_drift_guard(results, prev)
    assert "q" in drift


def test_green_run_records_and_tightens_second_max():
    results = {"q": {"longest_task_sec": 1.0, "longest_task2_sec": 0.9}}
    prev = {"q": {"baseline_longest_task_sec": 1.1, "longest_task_sec": 1.1}}
    assert bench_sf1._apply_drift_guard(results, prev) == {}
    # first sighting of a runner-up: recorded as its reference
    assert results["q"]["baseline_longest_task2_sec"] == 0.9
    # next green run tightens it damped, never loosens
    nxt = {"q": {"longest_task_sec": 1.0, "longest_task2_sec": 0.5}}
    assert bench_sf1._apply_drift_guard(nxt, results) == {}
    assert nxt["q"]["baseline_longest_task2_sec"] == round(
        bench_sf1.BASELINE_TIGHTEN_CAP * 0.9, 2
    )
    slow = {"q": {"longest_task_sec": 1.0, "longest_task2_sec": 1.2}}
    assert bench_sf1._apply_drift_guard(slow, nxt) == {}
    assert slow["q"]["baseline_longest_task2_sec"] == nxt["q"][
        "baseline_longest_task2_sec"
    ]


# ---------------------------------------------------------------------------
# Round 11: in-run arbitration — retry trigger + final guard semantics
# ---------------------------------------------------------------------------


def test_drift_suspect_triggers_on_bound_and_drift():
    prev = {"q": {"baseline_longest_task_sec": 4.0}}
    # over the drift bound vs baseline -> retry
    assert bench_sf1._drift_suspect("q", {"longest_task_sec": 10.0}, prev)
    # inside the bound -> no retry
    assert not bench_sf1._drift_suspect("q", {"longest_task_sec": 5.0}, prev)
    # over the absolute task bound -> retry even with no baseline
    big = {"longest_task_sec": bench_sf1.TASK_BOUND_SEC + 1}
    assert bench_sf1._drift_suspect("new_row", big, {})
    # new row, small -> no retry
    assert not bench_sf1._drift_suspect("new_row", {"longest_task_sec": 2.0}, {})


def test_drift_suspect_respects_absolute_floor():
    # a sub-second baseline swinging past the ratio but under the
    # absolute delta floor is scheduler noise, not a retry trigger
    prev = {"q": {"baseline_longest_task_sec": 0.5}}
    assert not bench_sf1._drift_suspect("q", {"longest_task_sec": 1.2}, prev)


def test_stall_discount_still_guards_after_retries():
    """The runner-up confirmation layer sits BEHIND the retries: a
    drift that survives min-of-3 but whose runner-up stage holds is
    recorded stall_discounted, baselines untouched."""
    results = {"q": {"longest_task_sec": 12.0, "longest_task2_sec": 4.0,
                     "retries": 2}}
    prev = {"q": {"baseline_longest_task_sec": 4.7,
                  "baseline_longest_task2_sec": 4.0}}
    drift = bench_sf1._apply_drift_guard(results, prev)
    assert drift == {}
    assert "stall_discounted" in results["q"]
    assert results["q"]["baseline_longest_task_sec"] == 4.7


def test_confirmed_drift_after_retries_flags_sticky():
    results = {"q": {"longest_task_sec": 12.0, "longest_task2_sec": 11.0,
                     "retries": 2}}
    prev = {"q": {"baseline_longest_task_sec": 4.7,
                  "baseline_longest_task2_sec": 4.0}}
    drift = bench_sf1._apply_drift_guard(results, prev)
    assert "q" in drift
    assert results["q"]["baseline_longest_task_sec"] == 4.7  # sticky


def test_ambient_wall_drift_median_and_cap():
    prev = {f"q{i}": {"wall_sec": 10.0} for i in range(5)}
    # uniform 1.2x session -> raw 1.2, effective 1.2
    res = {f"q{i}": {"wall_sec": 12.0} for i in range(5)}
    raw, eff = bench_sf1._ambient_wall_drift(res, prev)
    assert raw == eff == 1.2
    # past the cap: effective collapses to 1.0 (arbitration mode)
    res = {f"q{i}": {"wall_sec": 15.0} for i in range(5)}
    raw, eff = bench_sf1._ambient_wall_drift(res, prev)
    assert raw == 1.5 and eff == 1.0
    # fast session floors at 1.0; sub-2s references never vote
    res = {f"q{i}": {"wall_sec": 5.0} for i in range(5)}
    raw, eff = bench_sf1._ambient_wall_drift(res, prev)
    assert raw == eff == 1.0
    raw, eff = bench_sf1._ambient_wall_drift(
        {"q": {"wall_sec": 9.0}}, {"q": {"wall_sec": 1.0}}
    )
    assert raw == eff == 1.0  # no voters


def test_ambient_scales_drift_threshold_but_not_baselines():
    # 1.3x ambience: a 1.8x raw jump (inside 1.5*1.3=1.95) stays green
    # and the baseline still never loosens
    results = {"q": {"longest_task_sec": 9.0}}
    prev = {"q": {"baseline_longest_task_sec": 5.0, "longest_task_sec": 5.0}}
    drift = bench_sf1._apply_drift_guard(results, prev, ambient=1.3)
    assert drift == {}
    assert results["q"]["baseline_longest_task_sec"] == 5.0
    # the same jump with no ambience flags
    results2 = {"q": {"longest_task_sec": 9.0}}
    drift2 = bench_sf1._apply_drift_guard(results2, prev)
    assert "q" in drift2
    # a jump past bound*ambient still flags on a slow session
    results3 = {"q": {"longest_task_sec": 11.0}}
    drift3 = bench_sf1._apply_drift_guard(results3, prev, ambient=1.3)
    assert "q" in drift3


# ---------------------------------------------------------------------------
# Round 12: sticky ambient wall references (ADVICE r11 #2)
# ---------------------------------------------------------------------------


def test_ambient_uses_sticky_wall_baseline_not_last_run():
    # the committed artifact recorded an inflated wall (10 -> 13) but
    # the sticky reference held at 10: the estimator must divide by 10
    prev = {
        f"q{i}": {"wall_sec": 13.0, "baseline_wall_sec": 10.0}
        for i in range(5)
    }
    res = {f"q{i}": {"wall_sec": 13.0} for i in range(5)}
    raw, eff = bench_sf1._ambient_wall_drift(res, prev)
    assert raw == 1.3  # vs sticky 10.0, NOT vs last-run 13.0 (= 1.0)


def test_creeping_slowdown_cannot_renormalize_itself():
    # ADVICE r11 #2's exact scenario: +25% per run, each inside
    # AMBIENT_CAP vs the LAST run but compounding vs truth.  With
    # sticky references the second run's raw ratio is ~1.56 > cap and
    # the artifact flips to requires_arbitration semantics (eff=1.0).
    prev = {f"q{i}": {"wall_sec": 10.0, "baseline_wall_sec": 10.0}
            for i in range(5)}
    run1 = {f"q{i}": {"wall_sec": 12.5} for i in range(5)}
    raw1, eff1 = bench_sf1._ambient_wall_drift(run1, prev)
    assert raw1 == 1.25 and eff1 == 1.25  # under cap: normalized, but...
    bench_sf1._stamp_wall_baselines(run1, prev)
    # ...the reference did NOT move up to 12.5
    assert all(r["baseline_wall_sec"] == 10.0 for r in run1.values())
    run2 = {f"q{i}": {"wall_sec": 15.6} for i in range(5)}
    raw2, eff2 = bench_sf1._ambient_wall_drift(run2, run1)
    assert raw2 > bench_sf1.AMBIENT_CAP and eff2 == 1.0


def test_wall_baseline_seeds_tightens_and_never_loosens():
    # first sighting seeds from the fresh wall
    res = {"q": {"wall_sec": 8.0}}
    bench_sf1._stamp_wall_baselines(res, {})
    assert res["q"]["baseline_wall_sec"] == 8.0
    # lucky fast run tightens, damped by BASELINE_TIGHTEN_CAP
    nxt = {"q": {"wall_sec": 2.0}}
    bench_sf1._stamp_wall_baselines(nxt, res)
    assert nxt["q"]["baseline_wall_sec"] == round(
        bench_sf1.BASELINE_TIGHTEN_CAP * 8.0, 2
    )
    # slow run never loosens
    slow = {"q": {"wall_sec": 20.0}}
    bench_sf1._stamp_wall_baselines(slow, nxt)
    assert slow["q"]["baseline_wall_sec"] == nxt["q"]["baseline_wall_sec"]
    # --accept-drift resets (human decision)
    acc = {"q": {"wall_sec": 20.0}}
    bench_sf1._stamp_wall_baselines(acc, nxt, accept_drift=True)
    assert acc["q"]["baseline_wall_sec"] == 20.0


def test_legacy_artifact_without_wall_baseline_falls_back():
    prev = {"q": {"wall_sec": 10.0}}
    res = {"q": {"wall_sec": 12.0}}
    raw, _ = bench_sf1._ambient_wall_drift(res, prev)
    assert raw == 1.2
    bench_sf1._stamp_wall_baselines(res, prev)
    assert res["q"]["baseline_wall_sec"] == 10.0  # seeded from legacy wall
