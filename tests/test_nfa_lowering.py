"""Native-lowering correctness: every eligible tier must produce the
exact row set of the Python NFA fold (the semantic reference), and
ineligible shapes must fall back to the fold rather than mis-lower.

The randomized frames deliberately include timestamp ties, null values,
runs of repeated types, and users with no matches.
"""

from __future__ import annotations

import datetime as dt
import random

import pytest

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_1_11_1_spark.streaming import nfa
from flink_1_11_1_spark.streaming.nfa_lowering import eligible_tier


def _events(spark, seed: int, n: int = 240, users: int = 6):
    rng = random.Random(seed)
    base = dt.datetime(2026, 1, 1)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                base + dt.timedelta(minutes=rng.randrange(0, n // 2)),  # ties likely
                rng.randrange(1, users + 1),
                rng.choice(["click", "view", "purchase", "signup", "click", "view"]),
                None if rng.random() < 0.1 else round(rng.uniform(0, 100), 2),
            )
        )
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )


def _canon(df):
    return sorted(
        (r.user_id, r.start_ts, r.end_ts, tuple(r.labels), tuple(r.ids), tuple(r.tss))
        for r in df.collect()
    )


def _xvar_pattern():
    return (
        nfa.PatternSeq.begin("A", "event_type = 'click'")
        .next_("B", "true")
        .where_iterative(
            'EV["event_type"] == \'purchase\' and EV["value"] > LAST("A","value")',
            "value",
            "event_type",
            sql_cond="B.event_type = 'purchase' AND B.value > A.value",
        )
        .after_match_skip("past_last")
        .within("2 days")
    )


_PATTERNS = {
    "A_ab_past_last": (
        lambda: nfa.PatternSeq.begin("A", "event_type = 'click'")
        .next_("B", "event_type = 'purchase'")
        .after_match_skip("past_last")
        .within("1 day"),
        "A",
    ),
    "A_ab_to_next": (
        lambda: nfa.PatternSeq.begin("A", "event_type = 'click'")
        .next_("B", "event_type = 'purchase'")
        .after_match_skip("to_next")
        .within("1 day"),
        "A",
    ),
    "A_optional_middle": (
        lambda: nfa.PatternSeq.begin("A", "event_type = 'signup'")
        .next_("B", "event_type = 'click'")
        .optional()
        .next_("C", "event_type = 'purchase'")
        .after_match_skip("past_last")
        .within("36500 days"),
        "A",
    ),
    "A_two_optionals": (
        # both optionals skippable, independently or together — all four
        # count vectors enumerate, with negations at the advance row
        lambda: nfa.PatternSeq.begin("A", "event_type = 'signup'")
        .next_("B", "event_type = 'click'")
        .optional()
        .next_("C", "event_type = 'view'")
        .optional()
        .next_("D", "event_type = 'purchase'")
        .after_match_skip("no_skip")
        .within("36500 days"),
        "A",
    ),
    "A_counted_range": (
        lambda: nfa.PatternSeq.begin("A", "event_type = 'view'")
        .times(1, 2)
        .consecutive()
        .next_("B", "event_type = 'purchase'")
        .after_match_skip("no_skip")
        .within("36500 days"),
        "A",
    ),
    "A_single_row": (
        lambda: nfa.PatternSeq.begin("A", "event_type = 'signup'")
        .after_match_skip("past_last")
        .within("36500 days"),
        "A",
    ),
    "A_xvar": (_xvar_pattern, "A"),
    "A_xvar_quantified": (
        # cross-variable condition on a counted state: every repetition
        # instantiates against the bound A row and its own offset
        lambda: nfa.PatternSeq.begin("A", "event_type = 'click'")
        .next_("B", "true")
        .times(1, 2)
        .consecutive()
        .where_iterative(
            'EV["event_type"] == \'view\' and EV["value"] > LAST("A","value")',
            "value",
            "event_type",
            sql_cond="B.event_type = 'view' AND B.value > A.value",
        )
        .next_("C", "event_type = 'purchase'")
        .after_match_skip("no_skip")
        .within("2 days"),
        "A",
    ),
    "A_xvar_same_var_first": (
        # same-variable FIRST navigation: rep 0 falls back to the
        # current row (SQL running semantics), rep 1 binds rep 0
        lambda: nfa.PatternSeq.begin("B", "true")
        .times(2)
        .consecutive()
        .where_iterative(
            '(FIRST("B","value") if FIRST("B","value") is not None '
            'else EV["value"]) <= EV["value"]',
            "value",
            sql_cond="B.value >= FIRST(B.value)",
        )
        .after_match_skip("to_next")
        .within("1 day"),
        "A",
    ),
    "B_run3_past_last": (
        lambda: nfa.PatternSeq.begin("D", "value < _prev1_value")
        .times(3)
        .consecutive()
        .after_match_skip("past_last")
        .within("36500 days"),
        "B",
    ),
    "B_run3_to_last": (
        lambda: nfa.PatternSeq.begin("D", "value < _prev1_value")
        .times(3)
        .consecutive()
        .after_match_skip("to_last:D")
        .within("36500 days"),
        "B",
    ),
    "A_run3_to_first": (
        lambda: nfa.PatternSeq.begin("D", "value < _prev1_value")
        .times(3)
        .consecutive()
        .after_match_skip("to_first:D")
        .within("36500 days"),
        "A",
    ),
    "A_run2_no_skip": (
        lambda: nfa.PatternSeq.begin("D", "event_type = 'view'")
        .times(2)
        .consecutive()
        .after_match_skip("no_skip")
        .within("36500 days"),
        "A",
    ),
    "C_plus_tail_bounded_within": (
        # expiry trims the run prefix: only rows within horizon of the
        # tail end survive to be part of the match
        lambda: nfa.PatternSeq.begin("V", "event_type = 'view'")
        .one_or_more()
        .consecutive()
        .next_("P", "event_type = 'purchase'")
        .after_match_skip("past_last")
        .within("40 minutes"),
        "C",
    ),
    "C_plus_tail": (
        lambda: nfa.PatternSeq.begin("V", "event_type = 'view'")
        .one_or_more()
        .consecutive()
        .next_("P", "event_type = 'purchase'")
        .after_match_skip("past_last")
        .within("36500 days"),
        "C",
    ),
    "D_block_then_required": (
        lambda: nfa.PatternSeq.begin("a", "event_type = 'click'")
        .times(2)
        .consecutive()
        .followed_by("b", "event_type = 'purchase'")
        .within("12 hours"),
        "D",
    ),
    "D_chain3": (
        lambda: nfa.PatternSeq.begin("a", "event_type = 'signup'")
        .followed_by("b", "event_type = 'click'")
        .followed_by("c", "event_type = 'purchase'")
        .within("1 day"),
        "D",
    ),
    "D_chain_overlapping_flags": (
        lambda: nfa.PatternSeq.begin("a", "event_type = 'signup'")
        .followed_by("b", "value > 30")
        .followed_by("c", "value > 60")
        .within("1 day"),
        "D",
    ),
    "D_chain4_block2": (
        lambda: nfa.PatternSeq.begin("a", "event_type = 'click'")
        .times(2)
        .consecutive()
        .followed_by("b", "event_type = 'view'")
        .followed_by("c", "event_type = 'purchase'")
        .within("2 days"),
        "D",
    ),
    "D_optional_mid_chain": (
        # optional INSIDE the chain: a → m?(click) → b(view) → c(purchase)
        lambda: nfa.PatternSeq.begin("a", "event_type = 'signup'")
        .followed_by("m", "event_type = 'click'")
        .optional()
        .followed_by("b", "event_type = 'view'")
        .followed_by("c", "event_type = 'purchase'")
        .within("2 days"),
        "D",
    ),
    "D_two_segment_optionals": (
        lambda: nfa.PatternSeq.begin("a", "event_type = 'signup'")
        .times(2)
        .consecutive()
        .followed_by("m1", "event_type = 'click'")
        .optional()
        .followed_by("b", "event_type = 'view'")
        .followed_by("m2", "event_type = 'click'")
        .optional()
        .followed_by("c", "event_type = 'purchase'")
        .within("3 days"),
        "D",
    ),
    "D_optional_funnel": (
        lambda: nfa.PatternSeq.begin("a", "event_type = 'signup'")
        .followed_by("m", "event_type = 'click'")
        .optional()
        .followed_by("b", "event_type = 'purchase'")
        .within("1 day"),
        "D",
    ),
    "D_optional_overlapping_required": (
        # round-6 widen: the optional's literal does NOT contradict its
        # required (an event can be a view AND value > 50) — the union
        # next-occurrence formula binds whichever the first qualifying
        # event satisfies, optional first (greedy)
        lambda: nfa.PatternSeq.begin("a", "event_type = 'signup'")
        .followed_by("m", "value > 50")
        .optional()
        .followed_by("b", "event_type = 'view'")
        .within("1 day"),
        "D",
    ),
    "D_overlap_then_chain": (
        # union segment in the middle of a longer chain: the hop joins
        # after a union-resolved required must still line up
        lambda: nfa.PatternSeq.begin("a", "event_type = 'signup'")
        .followed_by("m", "value > 50")
        .optional()
        .followed_by("b", "event_type = 'view'")
        .followed_by("c", "event_type = 'purchase'")
        .within("2 days"),
        "D",
    ),
    "D_overlap_subset_literals": (
        # optional literal SUBSUMES the required's (value>60 ⇒ value>30):
        # every required candidate also satisfies the optional, so greedy
        # always binds the optional first when any qualifying event comes
        lambda: nfa.PatternSeq.begin("a", "event_type = 'signup'")
        .followed_by("m", "value > 30")
        .optional()
        .followed_by("b", "value > 60")
        .within("2 days"),
        "D",
    ),
    "D_two_adjacent_optionals": (
        # round-6 uni2: a → m1?(click) → m2?(view) → b(purchase) — the
        # first qualifying event binds the earliest state in order it
        # satisfies; bound optionals chain the lookup through two hops
        lambda: nfa.PatternSeq.begin("a", "event_type = 'signup'")
        .followed_by("m1", "event_type = 'click'")
        .optional()
        .followed_by("m2", "event_type = 'view'")
        .optional()
        .followed_by("b", "event_type = 'purchase'")
        .within("2 days"),
        "D",
    ),
    "D_two_adjacent_optionals_overlapping": (
        # uni2 with OVERLAPPING literals: value bands share events with
        # each other and the required — priority order decides
        lambda: nfa.PatternSeq.begin("a", "event_type = 'signup'")
        .followed_by("m1", "value > 80")
        .optional()
        .followed_by("m2", "value > 40")
        .optional()
        .followed_by("b", "event_type = 'view'")
        .within("2 days"),
        "D",
    ),
    "D_uni2_then_chain": (
        # two-optional segment followed by another segment: the hop
        # after a uni2-resolved required must line up
        lambda: nfa.PatternSeq.begin("a", "event_type = 'signup'")
        .followed_by("m1", "event_type = 'click'")
        .optional()
        .followed_by("m2", "value > 50")
        .optional()
        .followed_by("b", "event_type = 'view'")
        .followed_by("c", "event_type = 'purchase'")
        .within("3 days"),
        "D",
    ),
    "D_overlap_second_segment": (
        # the union segment is NOT the first segment: position row comes
        # from a prior hop join
        lambda: nfa.PatternSeq.begin("a", "event_type = 'signup'")
        .followed_by("b", "event_type = 'click'")
        .followed_by("m", "value > 50")
        .optional()
        .followed_by("c", "event_type = 'purchase'")
        .within("2 days"),
        "D",
    ),
}


@pytest.mark.parametrize("name", sorted(_PATTERNS))
@pytest.mark.parametrize("seed", [7, 23])
def test_lowering_equals_fold(spark, name, seed):
    build, expected_tier = _PATTERNS[name]
    pat = build()
    assert eligible_tier(pat.states, pat.horizon_s, pat.skip) == expected_tier
    ev = _events(spark, seed)
    if "run3" in name:
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        ev = ev.withColumn("_prev1_value", F.lag("value", 1).over(w))
    fast = pat.match_batch(ev)
    # the lowered plan must not contain a Python stage
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    assert _canon(fast) == _canon(pat.match_batch(ev, lowering=False))


def test_ineligible_shapes_fall_back():
    # past_last without contradicting literals → overlap possible → fold
    p1 = (
        nfa.PatternSeq.begin("A", "value > 50")
        .next_("B", "event_type = 'purchase'")
        .after_match_skip("past_last")
        .within("1 day")
    )
    assert eligible_tier(p1.states, p1.horizon_s, p1.skip) is None
    # THREE adjacent optionals (deep rebinding chain) → fold
    p2b = (
        nfa.PatternSeq.begin("a", "event_type = 'signup'")
        .followed_by("m1", "event_type = 'click'")
        .optional()
        .followed_by("m2", "event_type = 'view'")
        .optional()
        .followed_by("m3", "event_type = 'error'")
        .optional()
        .followed_by("b", "event_type = 'purchase'")
        .within("1 day")
    )
    assert eligible_tier(p2b.states, p2b.horizon_s, p2b.skip) is None
    # bounded-horizon homogeneous run under past_last → expiry shifts
    # the match lattice → fold
    p3 = (
        nfa.PatternSeq.begin("D", "event_type = 'view'")
        .times(3)
        .consecutive()
        .after_match_skip("past_last")
        .within("1 hour")
    )
    assert eligible_tier(p3.states, p3.horizon_s, p3.skip) is None
    # cross-variable condition without SQL text → fold
    p4 = (
        nfa.PatternSeq.begin("A", "event_type = 'click'")
        .next_("B", "event_type = 'purchase'")
        .where_iterative('EV["value"] > LAST("A","value")', "value")
        .after_match_skip("to_next")
        .within("1 day")
    )
    assert eligible_tier(p4.states, p4.horizon_s, p4.skip) is None


def test_fallback_still_executes(spark):
    ev = _events(spark, 5, n=120)
    p = (
        nfa.PatternSeq.begin("A", "value > 50")
        .next_("B", "event_type = 'purchase'")
        .after_match_skip("past_last")
        .within("1 day")
    )
    assert _canon(p.match_batch(ev)) == _canon(p.match_batch(ev, lowering=False))


def test_fuzzed_patterns_equal_fold(spark):
    """Randomized pattern shapes (quantifiers × contiguity × skip ×
    horizon): every ELIGIBLE one must equal the fold; ineligible ones
    must at least execute on the fold.  Complements the hand-picked
    matrix with shapes nobody thought to write down."""
    rng = random.Random(2026)
    ev = _events(spark, 11, n=160, users=4).cache()
    ev.count()
    types = ["click", "view", "purchase", "signup"]
    conds = [lambda t: f"event_type = '{t}'", lambda t: "value > 50", lambda t: "value < 30"]
    checked = eligible = 0
    for trial in range(24):
        n_states = rng.choice([1, 2, 2, 3])
        strict = rng.random() < 0.5
        pat = None
        used = rng.sample(types, n_states)
        for i in range(n_states):
            cond = rng.choice(conds)(used[i])
            if i == 0:
                pat = nfa.PatternSeq.begin(f"S{i}", cond)
            else:
                pat = (pat.next_ if strict else pat.followed_by)(f"S{i}", cond)
            last = i == n_states - 1
            q = rng.random()
            if last:
                if q < 0.3:
                    pat = pat.times(2).consecutive()
            elif q < 0.2:
                pat = pat.times(1, 2).consecutive()
            elif q < 0.35:
                pat = pat.optional()
            elif q < 0.45:
                pat = pat.one_or_more().consecutive()
        skip = rng.choice(
            ["no_skip", "to_next", "past_last", "to_first:S0", "to_last:S0"]
        )
        horizon = rng.choice(["2 hours", "1 day", "36500 days"])
        pat = pat.after_match_skip(skip).within(horizon)
        tier = eligible_tier(pat.states, pat.horizon_s, pat.skip)
        slow = _canon(pat.match_batch(ev, lowering=False))
        checked += 1
        if tier is not None:
            eligible += 1
            fast = _canon(pat.match_batch(ev))
            assert fast == slow, (
                f"trial {trial}: tier {tier} diverged for "
                f"{[(s.name, s.cond, s.min_count, s.max_count, s.strict_in, s.consecutive) for s in pat.states]} "
                f"skip={skip} horizon={horizon}"
            )
    ev.unpersist()
    # the generator must actually exercise the lowering a fair amount
    assert eligible >= 8, (checked, eligible)


def test_fuzzed_funnel_optionals_equal_fold(spark):
    """Dedicated tier-D fuzz (round 6): relaxed funnels with 0–2
    optionals per segment and deliberately OVERLAPPING literals (value
    bands share events with each other and with requireds) — every
    eligible shape must equal the fold exactly; counts assert both
    union modes actually fire."""
    rng = random.Random(60607)
    ev = _events(spark, 13, n=160, users=4).cache()
    ev.count()
    lits = [
        "event_type = 'click'", "event_type = 'view'",
        "event_type = 'purchase'", "value > 30", "value > 60",
        "value < 50",
    ]
    modes = {"uni1": 0, "uni2": 0, "other": 0}
    checked = 0
    for trial in range(30):
        pat = nfa.PatternSeq.begin("a", rng.choice(lits))
        n_tail = rng.randint(1, 4)
        n_opts_pending = 0
        names = iter("bcdefg")
        for i in range(n_tail):
            last = i == n_tail - 1
            pat = pat.followed_by(next(names), rng.choice(lits))
            if not last and n_opts_pending < 2 and rng.random() < 0.45:
                pat = pat.optional()
                n_opts_pending += 1
            else:
                n_opts_pending = 0
        pat = pat.after_match_skip(
            rng.choice(["no_skip", "to_next"])
        ).within(rng.choice(["4 hours", "1 day", "36500 days"]))
        tier = eligible_tier(pat.states, pat.horizon_s, pat.skip)
        if tier != "D":
            continue
        from flink_1_11_1_spark.streaming.nfa_lowering import (
            _seg_mode, _segments_of,
        )
        segs = _segments_of(pat.states[1:])
        seg_modes = {_seg_mode(o, r) for o, r in segs}
        if "uni2" in seg_modes:
            modes["uni2"] += 1
        elif "uni1" in seg_modes:
            modes["uni1"] += 1
        else:
            modes["other"] += 1
        slow = _canon(pat.match_batch(ev, lowering=False))
        fast = _canon(pat.match_batch(ev))
        checked += 1
        assert fast == slow, (
            f"trial {trial} diverged: "
            f"{[(s.name, s.cond, s.min_count) for s in pat.states]}"
        )
    ev.unpersist()
    assert checked >= 12 and modes["uni1"] >= 2 and modes["uni2"] >= 2, modes


# ------------------------------------------- backtracking ∩ tier A (r7)


def test_tier_a_equals_backtracking_fold_on_overlap(spark):
    """Tier A's greedy count-vector enumeration IS regex backtracking
    for bounded strict-contiguous patterns: on OVERLAPPING conditions
    it must equal the branching fold exactly (the equivalence that
    justifies lowering backtracking-mode tier-A patterns)."""
    import datetime as dt

    from flink_1_11_1_spark.streaming.nfa import PatternSeq

    t0 = dt.datetime(2024, 1, 1)

    def ev(vals):
        rows = [(1, i + 1, t0 + dt.timedelta(seconds=10 * i), float(v))
                for i, v in enumerate(vals)]
        return spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp, value double")

    def norm(df):
        return sorted((tuple(r.labels), tuple(r.ids)) for r in df.collect())

    shapes = [
        # A B? C, B and C share the condition (the x_mr_backtrack shape)
        (PatternSeq.begin("A", "value < 50")
         .next_("B", "value >= 50").optional().consecutive()
         .next_("C", "value >= 50").consecutive()
         .after_match_skip("to_next").with_backtracking()),
        # A{1,2} B, overlapping: greedy takes 2 A's when B still fits
        (PatternSeq.begin("A", "value >= 10").times(1, 2).consecutive()
         .next_("B", "value >= 50").consecutive()
         .after_match_skip("to_next").with_backtracking()),
    ]
    datasets = [
        [10, 60], [10, 60, 70], [10, 60, 70, 80], [10, 20, 60, 90],
        [60, 60, 60], [10, 20, 30], [90, 10, 60, 70, 10, 55],
    ]
    for p in shapes:
        for vals in datasets:
            e = ev(vals)
            lowered = p.match_batch(e)  # tier A allowed under backtrack
            fold = p.match_batch(e, lowering=False)
            assert norm(lowered) == norm(fold), (vals, norm(fold))


def test_backtracking_tier_a_is_native_for_entry_shape(spark):
    """The x_mr_backtrack statement (strict A B? C, TO NEXT ROW) must
    plan natively — no Python stage — now that backtracking-mode
    tier A lowers."""
    from flink_1_11_1_spark.extensions import registry

    from .conftest import SF_SMOKE

    df = registry.queries()["x_mr_backtrack"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    assert "ArrowEvalPython" not in plan


# ------------- SQL:2016 SUBSET membership-only lowering (round 10) ----
#
# A DEFINE referencing a union variable lowers in tier A by resolving
# FIRST/LAST/bare navigation to the member offsets' union per count
# vector, mirroring the fold's _bind/_to_python contract exactly:
# LAST(U.c)/bare U.c with `this` a member = the CURRENT row (running
# semantics); FIRST(U.c) with no member bound binds the current row iff
# `this` is a member, else SQL NULL (statically false).  Shapes the
# instantiation cannot map (COUNT over a union) fall back to the fold.

def _subset_pattern(sql_cond: str, py_cond: str, subsets, last_var="C"):
    p = (
        nfa.PatternSeq.begin("A", "event_type = 'click'")
        .next_("B", "event_type = 'view'")
        .times(1, 2)
        .consecutive()
        .next_(last_var, "true")
        .where_iterative(py_cond, "value", "event_type", sql_cond=sql_cond)
        .within("2 days")
    )
    return p.with_subsets(subsets)


_SUBSET_SHAPES = {
    # this NOT in U: LAST = last bound member row
    "last_other": (
        "C.event_type = 'purchase' AND C.value > LAST(U.value)",
        'EV["event_type"] == \'purchase\' and EV["value"] > '
        'LAST(("A","B"),"value")',
        {"U": ("A", "B")},
    ),
    # this NOT in U: FIRST = first bound member row
    "first_other": (
        "C.event_type = 'purchase' AND C.value < FIRST(U.value)",
        'EV["event_type"] == \'purchase\' and EV["value"] < '
        'FIRST(("A","B"),"value")',
        {"U": ("A", "B")},
    ),
    # bare U.col = LAST default
    "bare_other": (
        "C.event_type = 'purchase' AND C.value <> U.value",
        'EV["event_type"] == \'purchase\' and EV["value"] != '
        'LAST(("A","B"),"value")',
        {"U": ("A", "B")},
    ),
}


@pytest.mark.parametrize("name", sorted(_SUBSET_SHAPES))
@pytest.mark.parametrize("seed", [7, 23, 41])
def test_subset_lowering_equals_fold(spark, name, seed):
    sql_cond, py_cond, subsets = _SUBSET_SHAPES[name]
    pat = _subset_pattern(sql_cond, py_cond, subsets)
    assert eligible_tier(pat.states, pat.horizon_s, pat.skip) == "A"
    ev = _events(spark, seed)
    fast = pat.match_batch(ev)
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    assert _canon(fast) == _canon(pat.match_batch(ev, lowering=False))


@pytest.mark.parametrize("seed", [7, 23])
def test_subset_self_member_running_semantics(spark, seed):
    """this IN U: LAST(U.c) is the CURRENT row, FIRST(U.c) the first
    bound member (A's row once A is bound) — both folds agree."""
    from flink_1_11_1_spark.extensions.match_recognize import _to_python

    subsets = {"U": ("A", "B")}
    for sql_cond in (
        "B.event_type = 'view' AND B.value >= FIRST(U.value)",
        "B.event_type = 'view' AND LAST(U.value) > 10",
        "B.event_type = 'view' AND U.value > 10",
    ):
        py_cond = _to_python(sql_cond, ["A", "B"], "B", subsets)
        pat = (
            nfa.PatternSeq.begin("A", "event_type = 'click'")
            .next_("B", "true")
            .where_iterative(py_cond, "value", "event_type",
                             sql_cond=sql_cond)
            .times(1, 2)
            .consecutive()
            .next_("C", "event_type = 'purchase'")
            .within("2 days")
            .with_subsets(subsets)
        )
        assert eligible_tier(pat.states, pat.horizon_s, pat.skip) == "A"
        ev = _events(spark, seed)
        fast = pat.match_batch(ev)
        plan = fast._jdf.queryExecution().executedPlan().toString()
        assert "FlatMapGroupsInPandas" not in plan, sql_cond
        assert _canon(fast) == _canon(pat.match_batch(ev, lowering=False)), (
            sql_cond
        )


def test_subset_unbound_member_statically_false(spark):
    """A DEFINE on the FIRST state navigating a later-only union has no
    bound member and `this` is not one — SQL NULL, no match, both
    modes."""
    subsets = {"U": ("B",)}
    sql_cond = "A.event_type = 'click' AND A.value > LAST(U.value)"
    py_cond = (
        'EV["event_type"] == \'click\' and EV["value"] > '
        'LAST(("B",),"value")'
    )
    pat = (
        nfa.PatternSeq.begin("A", "true")
        .where_iterative(py_cond, "value", "event_type", sql_cond=sql_cond)
        .next_("B", "event_type = 'purchase'")
        .within("2 days")
        .with_subsets(subsets)
    )
    ev = _events(spark, 7)
    assert _canon(pat.match_batch(ev)) == []
    assert _canon(pat.match_batch(ev, lowering=False)) == []


def test_subset_ineligible_shape_falls_back_to_fold(spark):
    """A subset-referencing DEFINE on a shape outside tier A (unbounded
    middle quantifier) still executes — through the fold, not a
    mis-lowering — and both modes agree."""
    subsets = {"U": ("A", "B")}
    sql_cond = "C.event_type = 'purchase' AND C.value > LAST(U.value)"
    py_cond = (
        'EV["event_type"] == \'purchase\' and EV["value"] > '
        'LAST(("A","B"),"value")'
    )
    pat = (
        nfa.PatternSeq.begin("A", "event_type = 'click'")
        .next_("B", "event_type = 'view'")
        .one_or_more()
        .consecutive()
        .next_("C", "true")
        .where_iterative(py_cond, "value", "event_type", sql_cond=sql_cond)
        .within("2 days")
        .with_subsets(subsets)
    )
    ev = _events(spark, 7)
    fast = pat.match_batch(ev)
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan  # fold fallback, not an error
    assert _canon(fast) == _canon(pat.match_batch(ev, lowering=False))


def test_subset_define_front_door_lowers_natively(spark):
    """The SQL front door: a membership-only SUBSET reference in DEFINE
    plans natively (round-10 close of VERDICT what's-missing #3)."""
    from flink_1_11_1_spark.extensions.match_recognize import match_recognize

    sql = """
    SELECT * FROM ev MATCH_RECOGNIZE (
      PARTITION BY user_id
      ORDER BY ts, event_id
      MEASURES LAST(A.event_id) AS a_id, LAST(C.event_id) AS c_id
      ONE ROW PER MATCH
      PATTERN (A B C)
      SUBSET U = (A, B)
      DEFINE A AS A.event_type = 'click',
             B AS B.event_type = 'view',
             C AS C.event_type = 'purchase' AND C.value > FIRST(U.value)
    )
    """
    ev = _events(spark, 23)
    df = match_recognize(spark, sql, events=ev)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    got = {(r.user_id, r.a_id, r.c_id) for r in df.collect()}
    # hand oracle: contiguous click,view,purchase with purchase.value >
    # click.value (FIRST over U = the A row; ties/nulls excluded)
    rows = sorted(
        ev.collect(), key=lambda r: (r.user_id, r.ts, r.event_id))
    expect = set()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for u, rs in by_user.items():
        i = 0
        while i + 2 < len(rs):
            a, b, c0 = rs[i], rs[i + 1], rs[i + 2]
            if (
                a.event_type == "click" and b.event_type == "view"
                and c0.event_type == "purchase"
                and a.value is not None and c0.value is not None
                and c0.value > a.value
            ):
                expect.add((u, a.event_id, c0.event_id))
                i += 3  # SKIP PAST LAST ROW default
            else:
                i += 1
    assert got == expect


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(24))
def test_subset_lowering_randomized_equivalence(spark, seed):
    """Seeded sweep over the subset-navigation grammar: random member
    sets, navigation forms, comparison ops and thresholds — every
    tier-A-eligible draw must produce the fold's exact row set."""
    rng = random.Random(1000 + seed)
    members = tuple(rng.sample(["A", "B"], rng.choice([1, 1, 2])))
    fn = rng.choice(["FIRST", "LAST", "bare"])
    op_sql, op_py = rng.choice([
        (">", ">"), ("<", "<"), (">=", ">="), ("<=", "<="),
        ("=", "=="), ("<>", "!="),
    ])
    thresh = rng.choice(["U.value", f"{rng.randrange(0, 100)}"])
    nav = "U.value" if fn == "bare" else f"{fn}(U.value)"
    sql_cond = f"C.event_type = 'purchase' AND C.value {op_sql} {nav}"
    if thresh != "U.value":
        sql_cond = f"C.event_type = 'purchase' AND {nav} {op_sql} {thresh}"
    from flink_1_11_1_spark.extensions.match_recognize import _to_python

    py_cond = _to_python(sql_cond, ["A", "B"], "C", {"U": members})
    pat = (
        nfa.PatternSeq.begin("A", "event_type = 'click'")
        .next_("B", "event_type = 'view'")
        .times(1, rng.choice([1, 2, 3]))
        .consecutive()
        .next_("C", "true")
        .where_iterative(py_cond, "value", "event_type", sql_cond=sql_cond)
        .within("2 days")
        .with_subsets({"U": members})
    )
    assert eligible_tier(pat.states, pat.horizon_s, pat.skip) == "A"
    ev = _events(spark, 5000 + seed)
    fast = pat.match_batch(ev)
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    assert _canon(fast) == _canon(pat.match_batch(ev, lowering=False)), (
        sql_cond, members
    )


# -------------------- round 11: greedy quantified FINAL states --------


def _qfinal_patterns():
    return {
        "ab13": lambda: (
            nfa.PatternSeq.begin("A", "event_type = 'signup'")
            .next_("B", "event_type = 'click'").times(1, 3).consecutive()
            .within("2 days")),
        "ab13_bounded": lambda: (
            nfa.PatternSeq.begin("A", "event_type = 'signup'")
            .next_("B", "event_type = 'click'").times(1, 3).consecutive()
            .within("10 minutes")),
        "a12_b13": lambda: (
            nfa.PatternSeq.begin("A", "event_type = 'view'")
            .times(1, 2).consecutive()
            .next_("B", "event_type = 'click'").times(1, 3).consecutive()
            .within("2 days")),
        "d13_single": lambda: (
            nfa.PatternSeq.begin("D", "event_type = 'view'")
            .times(1, 3).consecutive().within("2 days")),
        "ab23_to_next": lambda: (
            nfa.PatternSeq.begin("A", "event_type = 'signup'")
            .next_("B", "event_type = 'click'").times(2, 3).consecutive()
            .after_match_skip("to_next").within("2 days")),
    }


@pytest.mark.parametrize("name", sorted(_qfinal_patterns()))
@pytest.mark.parametrize("seed", [7, 23, 41])
def test_quantified_final_lowering_equals_fold(spark, name, seed):
    """A GREEDY quantified final (round 11) lowers in tier A with the
    extension negation on the row after the match; the lowered plan
    must equal the fold exactly, including bounded-WITHIN closure."""
    pat = _qfinal_patterns()[name]()
    assert eligible_tier(pat.states, pat.horizon_s, pat.skip) == "A"
    ev = _events(spark, seed)
    fast = pat.match_batch(ev)
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    assert _canon(fast) == _canon(pat.match_batch(ev, lowering=False))


@pytest.mark.parametrize("seed", [7, 23])
def test_quantified_final_det_equals_backtracking_fold(spark, seed):
    """With disjoint conditions the deterministic and branching folds
    must agree on quantified-final matches (the pend/deck machinery is
    the bt rendering of greedy-longest)."""
    ev = _events(spark, seed)

    def build(bt):
        p = (
            nfa.PatternSeq.begin("A", "event_type = 'signup'")
            .next_("B", "event_type = 'click'").times(1, 3).consecutive()
            .within("2 days"))
        return p.with_backtracking() if bt else p

    det = _canon(build(False).match_batch(ev, lowering=False))
    bt = _canon(build(True).match_batch(ev, lowering=False))
    assert det == bt and len(det) > 0


@pytest.mark.parametrize("seed", [7, 23])
def test_quantified_final_backtracking_lowering_equals_fold(spark, seed):
    """Backtracking mode (overlapping conditions) lowers quantified
    finals through the greedy-ordered CASE — no negations, order wins."""
    ev = _events(spark, seed)
    pat = (
        nfa.PatternSeq.begin("A", "event_type = 'signup'")
        .next_("B", "value > 20").times(1, 3).consecutive()
        .with_backtracking().within("2 days"))
    assert eligible_tier(pat.states, pat.horizon_s, pat.skip) == "A"
    fast = pat.match_batch(ev)
    assert _canon(fast) == _canon(pat.match_batch(ev, lowering=False))


def test_quantified_final_skip_prune_modes_stay_on_fold(spark):
    """past_last / to_first over a variable-length match shifts the
    prune lattice — those shapes must fall back to the fold (loudly
    visible as tier None) and still execute."""
    p = (
        nfa.PatternSeq.begin("A", "event_type = 'signup'")
        .next_("B", "event_type = 'click'").times(1, 3).consecutive()
        .after_match_skip("past_last").within("2 days"))
    assert eligible_tier(p.states, p.horizon_s, p.skip) is None
    ev = _events(spark, 7)
    assert _canon(p.match_batch(ev)) == _canon(p.match_batch(ev, lowering=False))


def test_unbounded_final_falls_back_and_is_maximal(spark):
    """B+ at pattern end: fold-only (tier None); runs are maximal —
    hand fixture: V C C C C yields exactly one match of length 1+4."""
    import datetime as dt2

    p = (
        nfa.PatternSeq.begin("A", "event_type = 'view'")
        .next_("B", "event_type = 'click'").one_or_more().consecutive()
        .within("2 days"))
    assert eligible_tier(p.states, p.horizon_s, p.skip) is None
    base = dt2.datetime(2026, 1, 1)
    rows = [(i, base + dt2.timedelta(minutes=i), 1, t, 1.0)
            for i, t in enumerate(["view", "click", "click", "click", "click"])]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double")
    got = [(tuple(r.labels), tuple(r.ids)) for r in p.match_batch(ev).collect()]
    assert got == [(("A", "B", "B", "B", "B"), (0, 1, 2, 3, 4))]


def test_quantified_final_greedy_takes_cap(spark):
    """B{1,3} on a run of 4 B-rows takes exactly 3 (the cap), starting
    a fresh match machinery check of cap-completion."""
    import datetime as dt2

    p = (
        nfa.PatternSeq.begin("A", "event_type = 'view'")
        .next_("B", "event_type = 'click'").times(1, 3).consecutive()
        .within("2 days"))
    base = dt2.datetime(2026, 1, 1)
    rows = [(i, base + dt2.timedelta(minutes=i), 1, t, 1.0)
            for i, t in enumerate(["view", "click", "click", "click", "click"])]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double")
    for lowering in (True, False):
        got = [(tuple(r.labels), tuple(r.ids))
               for r in p.match_batch(ev, lowering=lowering).collect()]
        assert got == [(("A", "B", "B", "B"), (0, 1, 2, 3))], lowering


def _qlast_subset_pattern(sql_cond: str, py_cond: str, subsets):
    """SUBSET navigation with a QUANTIFIED LAST state (the round-10
    lesson's silent-tier-None shape, now lowered)."""
    p = (
        nfa.PatternSeq.begin("A", "event_type = 'click'")
        .next_("B", "event_type = 'view'").times(1, 2).consecutive()
        .next_("C", "true")
        .where_iterative(py_cond, "value", "event_type", sql_cond=sql_cond)
        .times(1, 3).consecutive()
        .within("2 days")
    )
    return p.with_subsets(subsets)


_QLAST_SUBSET_SHAPES = {
    # this NOT in U: LAST = last bound member row, per C repetition
    "qlast_other": (
        "C.event_type = 'purchase' AND C.value > LAST(U.value)",
        'EV["event_type"] == \'purchase\' and EV["value"] > '
        'LAST(("A","B"),"value")',
        {"U": ("A", "B")},
    ),
    # this IN U, FIRST navigation: the first bound member row (B's
    # first) — stable across the C repetitions
    "qlast_first_self": (
        "C.event_type = 'purchase' AND C.value >= FIRST(U.value)",
        'EV["event_type"] == \'purchase\' and EV["value"] >= '
        'FIRST(("B","C"),"value")',
        {"U": ("B", "C")},
    ),
}


@pytest.mark.parametrize("name", sorted(_QLAST_SUBSET_SHAPES))
@pytest.mark.parametrize("seed", [7, 23, 41])
def test_subset_quantified_last_lowering_equals_fold(spark, name, seed):
    sql_cond, py_cond, subsets = _QLAST_SUBSET_SHAPES[name]
    pat = _qlast_subset_pattern(sql_cond, py_cond, subsets)
    tier = eligible_tier(pat.states, pat.horizon_s, pat.skip)
    assert tier == "A", f"quantified-last SUBSET shape got tier {tier}"
    ev = _events(spark, seed)
    fast = pat.match_batch(ev)
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    assert _canon(fast) == _canon(pat.match_batch(ev, lowering=False))
