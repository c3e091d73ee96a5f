"""bench.py retimer hardening (round 12 — VERDICT r11 "next" #2).

The round-11 retimer ordered candidates cheapest-first and, when its
~20 s budget exhausted, shipped the single contention-inflated reading
raw (the graph trio recorded 2.5–4x their idle values in BENCH_r11).
The hardened `apply_retimer`: worst inflation RATIO first, and
budget-starved candidates carry their prior forward with the raw
reading recorded under `contended` — pure-function tests, no Spark.
"""

from __future__ import annotations

import bench


def _runners(second_reads: dict[str, float]):
    """Fake runners whose re-run 'measures' the given value instantly.

    apply_retimer times the runner call with time.time(); these return
    immediately, so t2 ≈ 0 — tests that need a specific second reading
    patch timings via the retimed pair instead.  For ordering/budget
    behavior the instant-return fake is exactly right: every retimed
    second sample is ~0 and costs no budget.
    """
    return {name: (lambda: None) for name in second_reads}


def test_candidates_ordered_by_inflation_ratio():
    # a: 2x inflated, b: 5x inflated, c: 1.5x — retime order must be
    # b, a, c (ratio desc); with a free budget all three get pairs.
    prior = {"a": 2.0, "b": 1.0, "c": 4.0}
    timings = {"a": 4.0, "b": 5.0, "c": 6.0}
    retimed, contended = bench.apply_retimer(
        timings, prior, _runners(timings), budget=100.0)
    assert list(retimed) == ["b", "a", "c"]
    assert contended == {}
    # min(first, instant-second) is kept
    assert all(timings[n] <= 0.1 for n in ("a", "b", "c"))


def test_budget_exhaustion_carries_prior_annotated():
    # b (4x) retimes first; a's raw reading (15 s) exceeds the 10 s
    # budget so its prior is carried and the raw reading is recorded.
    prior = {"a": 5.0, "b": 1.0}
    timings = {"a": 15.0, "b": 4.0}
    retimed, contended = bench.apply_retimer(
        timings, prior, _runners(timings), budget=10.0)
    assert "b" in retimed and "a" not in retimed
    assert contended == {"a": 15.0}
    assert timings["a"] == 5.0  # prior carried forward, not 15.0


def test_oversized_single_reading_never_ships_raw():
    # one candidate whose reading alone exceeds the whole budget:
    # round-11 behavior shipped 11.1 s for x_graph_sssp; now the prior
    # carries and the reading is annotated.
    prior = {"sssp": 4.9}
    timings = {"sssp": 30.0}
    retimed, contended = bench.apply_retimer(
        timings, prior, _runners(timings), budget=20.0)
    assert retimed == {} and contended == {"sssp": 30.0}
    assert timings["sssp"] == 4.9


def test_non_candidates_untouched():
    prior = {"a": 1.0, "b": 0.2, "d": 2.0}
    timings = {"a": 1.1, "b": 0.3, "c": 9.0, "d": 2.0}
    # a: below 1.3x; b: sub-0.4 jitter; c: no prior; d: equal
    retimed, contended = bench.apply_retimer(
        timings, prior, _runners(timings), budget=20.0)
    assert retimed == {} and contended == {}
    assert timings == {"a": 1.1, "b": 0.3, "c": 9.0, "d": 2.0}


def test_contended_run_never_raises_a_floor():
    """VERDICT r14 next #3: during a degraded host window min-of-2 only
    CONFIRMS contention-inflated readings — with the probe gate up,
    every candidate carries its prior and the raw reading is annotated,
    so a slow-window run cannot raise any floor."""
    prior = {"a": 2.0, "b": 1.0}
    timings = {"a": 6.0, "b": 4.5}
    retimed, contended = bench.apply_retimer(
        timings, prior, _runners(timings), budget=100.0, contended_run=True)
    assert retimed == {}
    assert contended == {"a": 6.0, "b": 4.5}
    assert timings == {"a": 2.0, "b": 1.0}  # priors carried
    # and merge_detail then keeps every prior (nothing retime-confirmed)
    out = bench.merge_detail(dict(timings), prior, retimed)
    assert out == prior


def test_probe_gate_thresholds():
    # adaptive gate: 1.3x the recorded idle floor, never below 0.8 s
    assert not bench.run_is_contended(0.5, probe_floor=0.42)
    assert bench.run_is_contended(0.9, probe_floor=0.42)
    assert bench.run_is_contended(2.076, probe_floor=0.42)  # the r15 run
    # r14's 0.603 driver window sits above 1.3x the 0.423 r13 idle probe
    assert bench.run_is_contended(0.603, probe_floor=0.423)
    # large recorded floor lifts the gate past the 0.8 fallback
    assert not bench.run_is_contended(1.0, probe_floor=0.9)
    # no recorded floor yet -> absolute fallback only
    assert not bench.run_is_contended(0.79, probe_floor=None)
    assert bench.run_is_contended(0.81, probe_floor=None)


def test_detail_min_merge_keeps_prior_on_uncorroborated_slowdown():
    """VERDICT r12 next #6: one slow (contended-adjacent) run must not
    inflate the next round's retime baseline — a single reading above
    the prior keeps the prior in the detail file."""
    prior = {"a": 1.0, "b": 2.0, "c": 3.0}
    detail = {"a": 1.2, "b": 1.5, "c": 3.0, "new": 4.0}
    out = bench.merge_detail(detail, prior, retimed={})
    assert out["a"] == 1.0   # uncorroborated slowdown → prior kept
    assert out["b"] == 1.5   # improvement records
    assert out["c"] == 3.0   # unchanged
    assert out["new"] == 4.0  # no prior → records as-is


def test_detail_min_merge_records_retime_confirmed_regression():
    """A reading the retimer confirmed (min-of-2 still above prior) is a
    real regression and must overwrite the stale prior."""
    prior = {"a": 1.0}
    detail = {"a": 2.0}
    out = bench.merge_detail(detail, prior, retimed={"a": [2.4, 2.0]})
    assert out["a"] == 2.0
