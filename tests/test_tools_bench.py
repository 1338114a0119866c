"""Flag-path semantics of the sf0.1 bench (VERDICT r11 #2): a query
still flagged at its median self-arbitrates in-run — up to
ARBITRATION_RETRIES extra measurements, judged at the MIN — so a
rotating host stall produces ZERO false flags while a reproducible
regression survives with its full sample record.  Pure-Python driving
of ``bench.arbitrate_flags`` with a seeded fake host; no Spark.
"""

from __future__ import annotations

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "bench",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench.py",
    ),
)
bench = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bench)

BASE = {"fast": 0.8, "mid": 1.7, "slow": 4.0}


def test_is_flagged_ratio_and_absolute_floor():
    # 1.6x on a 4 s baseline with a 2.4 s delta -> flag
    assert bench.is_flagged("slow", 6.4, BASE)
    # 1.4x: under REGRESSION_RATIO -> green
    assert not bench.is_flagged("slow", 5.6, BASE)
    # sub-1s baseline needs a >=1 s absolute delta: 0.8 -> 1.5 is a
    # 1.9x ratio but only a 0.7 s delta -> green (session band)
    assert not bench.is_flagged("fast", 1.5, BASE)
    assert bench.is_flagged("fast", 2.2, BASE)
    # unknown / zero baselines never flag
    assert not bench.is_flagged("new", 99.0, BASE)
    assert not bench.is_flagged("z", 99.0, {"z": 0.0})


def test_is_flagged_one_to_two_second_band_uses_half_second_gate():
    # VERDICT r12 #1: embedding_split_contamination (2.70 vs 1.706 —
    # ratio 1.58, delta 0.994 s) slipped the old 1 s sub-2 s gate by
    # 6 ms and never reached arbitration.  Baselines in [1, 2) s now
    # use the standard 0.5 s gate: the same numbers flag (and then
    # self-arbitrate at the min).
    assert bench.is_flagged("mid", 2.70, BASE)  # 1.59x, delta 1.0
    # the exact 6 ms-slip shape from r12 on a 1.706 baseline
    assert bench.is_flagged("x", 2.70, {"x": 1.706})
    # oov_rate_by_split shape: 1.53 vs 1.016 -> 1.51x, delta 0.514
    assert bench.is_flagged("y", 1.53, {"y": 1.016})
    # under-ratio or under-delta stays green
    assert not bench.is_flagged("mid", 2.4, BASE)  # 1.41x
    assert not bench.is_flagged("y", 1.45, {"y": 1.016})  # delta 0.43


def test_is_flagged_scales_with_ambient_drift():
    # at 1.3x ambience the effective baseline is 5.2: 6.4 is inside
    # 1.5x of it -> green; 9.0 still flags
    assert not bench.is_flagged("slow", 6.4, BASE, drift=1.3)
    assert bench.is_flagged("slow", 9.0, BASE, drift=1.3)


class _StallingHost:
    """Seeded fake host: returns the scripted sequence of walls for a
    query, then steady-state.  Models this machine's one-sided stall
    pattern — a freeze inflates some runs, never deflates any."""

    def __init__(self, script: dict[str, list[float]], steady: dict[str, float]):
        self.script = {k: list(v) for k, v in script.items()}
        self.steady = steady
        self.calls: dict[str, int] = {}

    def run_once(self, name: str) -> float:
        self.calls[name] = self.calls.get(name, 0) + 1
        seq = self.script.get(name)
        return seq.pop(0) if seq else self.steady[name]


def test_stalling_host_produces_zero_false_flags():
    # the r11 driver pattern: holdout_split's samples [2.13, 2.06,
    # 2.03] all stalled (median flags at 3.5x) but one fresh try lands
    # back at baseline -> arbitration clears it, no regression listed
    host = _StallingHost({"q": [0.55]}, {"q": 0.55})
    samples = {"q": [2.13, 2.06, 2.03]}
    base = {"q": 0.58}
    out = bench.arbitrate_flags(["q"], samples, base, 1.0, host.run_once)
    assert not out["q"]["still_flagged"]
    assert out["q"]["judged_sec"] == 0.55
    assert host.calls["q"] == 1  # cleared on the first retry, stopped


def test_real_regression_survives_all_retries_with_record():
    # a genuine plan regression reproduces in EVERY sample: the min
    # still flags after ARBITRATION_RETRIES and the record keeps all
    # samples for post-hoc audit (ADVICE r11 #5 applied to bench.py)
    host = _StallingHost({}, {"q": 6.2})
    samples = {"q": [6.5, 6.3, 6.4]}
    base = {"q": 2.0}
    out = bench.arbitrate_flags(["q"], samples, base, 1.0, host.run_once)
    assert out["q"]["still_flagged"]
    assert out["q"]["retries"] == bench.ARBITRATION_RETRIES
    assert len(out["q"]["samples"]) == 3 + bench.ARBITRATION_RETRIES
    assert out["q"]["judged_sec"] == 6.2


def test_intermittent_stall_cluster_cleared_by_min():
    # 2-of-3 retries also stall; the single clean sample clears the
    # flag — min-of-N is exactly the statistic a one-sided stall
    # cannot survive
    host = _StallingHost({"q": [5.9, 1.1]}, {"q": 5.8})
    samples = {"q": [6.0, 5.7, 5.9]}
    base = {"q": 1.2}
    out = bench.arbitrate_flags(["q"], samples, base, 1.0, host.run_once)
    assert not out["q"]["still_flagged"]
    assert out["q"]["judged_sec"] == 1.1
    # the stalled retry stays in the record
    assert 5.9 in out["q"]["samples"]


def test_min_already_green_skips_retries():
    # the median flagged but one original sample was already under the
    # bar: no extra wall is spent
    host = _StallingHost({}, {"q": 9.9})
    samples = {"q": [4.4, 1.0, 4.5]}  # median 4.4 flags, min 1.0 green
    base = {"q": 1.2}
    out = bench.arbitrate_flags(["q"], samples, base, 1.0, host.run_once)
    assert not out["q"]["still_flagged"]
    assert host.calls.get("q", 0) == 0


def test_arbitration_respects_ambient_drift():
    # at 1.3x ambience the min must beat baseline*drift*ratio, same
    # threshold family as the median path
    host = _StallingHost({}, {"q": 7.0})
    samples = {"q": [7.2]}
    base = {"q": 4.0}
    out = bench.arbitrate_flags(["q"], samples, base, 1.3, host.run_once)
    assert not out["q"]["still_flagged"]  # 7.0 < 1.5 * (4.0 * 1.3) = 7.8
