"""Regex-oracle differential fuzzer for the branching (backtracking)
NFA fold and the tier-A backtracking lowering.

For STRICT-contiguous patterns (consecutive repeats + strict edges —
the MATCH_RECOGNIZE shape) the match semantics ARE regular-expression
semantics, and Python's ``re`` engine is a true independent
backtracking implementation: greedy/reluctant quantifier preference,
fork exploration, one match per start.  Each fuzz case builds

- a random pattern (2–4 states; count ranges incl. unbounded;
  random greedy/reluctant on non-final quantified states; conditions =
  random value-class subsets, so overlap arises naturally), and
- a random event sequence of value classes,

then compares THREE implementations:
  1. the branching fold (``match_batch(lowering=False)``),
  2. the tier-A backtracking lowering (bounded shapes only),
  3. the ``re`` oracle (named groups recover each state's span,
     TO NEXT ROW = a match at every start, PAST LAST ROW = leftmost
     match then resume after its end).
"""

from __future__ import annotations

import datetime as dt
import random
import re

import pytest

from flink_1_11_1_spark.streaming.nfa import PatternSeq, State

from .fuzz_rotation import rotating_subset

pytestmark = pytest.mark.slow  # heavy battery: -m 'not slow' skips it


# two seed bands: the original 40 + a second band whose cases 1/75/92
# caught the reluctant-optional advance-ordering bug (fixed: the
# target priority is the regex nested take/skip decision order)
_SEEDS = [1311 + i for i in range(40)] + [900_000 + i for i in
                                          (1, 75, 92, *range(100, 117))]

_CLASSES = "abc"  # row value classes; row char = its class letter


def _random_pattern(rng: random.Random):
    n_states = rng.randint(2, 4)
    states = []
    for i in range(n_states):
        last = i == n_states - 1
        subset = sorted(rng.sample(_CLASSES, rng.randint(1, 2)))
        cond = "(" + " OR ".join(f"cls = '{c}'" for c in subset) + ")"
        if last:
            mn = mx = rng.randint(1, 2)
            greedy = True
        else:
            ranges = [(1, 1), (1, 2), (1, 3), (2, 2), (1, None),
                      (0, 1), (0, None)]
            mn, mx = rng.choice(ranges)
            greedy = rng.random() < 0.7
            if mn == mx:
                greedy = True  # exact counts have no preference
            if i == 0 and mn == 0:
                # leading-optional start forks are state-ordered; the
                # reluctant leading-optional preference is undefined
                greedy = True
        states.append(
            State(f"S{i}", cond, min_count=mn, max_count=mx,
                  strict_in=True, consecutive=True, greedy=greedy))
    skip = rng.choice(["to_next", "past_last"])
    return (PatternSeq(states=tuple(states), horizon_s=36500 * 86400,
                       skip=skip).with_backtracking(max_branches=256),
            [set(re.findall(r"'(\w)'", s.cond)) for s in states], skip)


def _regex_for(states, subsets) -> re.Pattern:
    parts = []
    for i, (s, subset) in enumerate(zip(states, subsets)):
        cls = "[" + "".join(sorted(subset)) + "]"
        mn, mx = s.min_count, s.max_count
        quant = f"{{{mn},{'' if mx is None else mx}}}"
        lazy = "" if s.greedy else "?"
        parts.append(f"(?P<g{i}>{cls}{quant}{lazy})")
    return re.compile("".join(parts))


def _oracle(rx: re.Pattern, states, text: str, skip: str):
    """Expected matches as (start_index, labels tuple)."""
    out = []

    def labels_of(m, base: int):
        labs = []
        for i, s in enumerate(states):
            a, b = m.span(f"g{i}")
            labs.extend([s.name] * (b - a))
        return labs

    if skip == "to_next":
        for p in range(len(text)):
            m = rx.match(text, p)
            if m and m.end() > m.start():
                out.append((p, tuple(labels_of(m, p))))
        return out
    p = 0
    while p < len(text):
        m = rx.match(text, p)
        if m and m.end() > m.start():
            out.append((p, tuple(labels_of(m, p))))
            p = m.end()
        else:
            p += 1
    return out


@pytest.mark.parametrize("case", rotating_subset(_SEEDS, tag="bt"))
def test_backtracking_matches_regex_oracle(spark, case):
    rng = random.Random(case)
    pat, subsets, skip = _random_pattern(rng)
    text = "".join(rng.choice(_CLASSES) for _ in range(rng.randint(8, 14)))
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, i, t0 + dt.timedelta(seconds=i), ch)
            for i, ch in enumerate(text)]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, cls string")

    want = sorted(_oracle(_regex_for(pat.states, subsets), pat.states,
                          text, skip))
    fold = pat.match_batch(ev, lowering=False)
    got_fold = sorted((r.ids[0], tuple(r.labels)) for r in fold.collect())
    assert got_fold == want, (
        f"fold vs regex: pattern="
        f"{[(s.min_count, s.max_count, s.greedy, sorted(ss)) for s, ss in zip(pat.states, subsets)]} "
        f"skip={skip} text={text!r}")

    # the tier-A lowering must agree wherever it applies
    lowered = pat.match_batch(ev)
    got_low = sorted((r.ids[0], tuple(r.labels)) for r in lowered.collect())
    assert got_low == want, f"lowering vs regex: text={text!r}"


# ---------------- alternation band (round 8): (A | B) groups ----------
#
# One state per pattern is an alternation group with two alternatives
# (class subsets that may overlap each other and the neighbors).  The
# regex oracle encodes the group as (?:[..]|[..]){m,n} inside the
# state's named span; per-char labels attribute to the FIRST
# alternative whose class contains the char — exactly the regex
# engine's leftmost-| preference (both alternatives consume one char,
# so re never needs the second when the first contains it), and
# exactly the fold's alternative fork order.

_ALT_SEEDS = [950_000 + i for i in range(24)]


def _random_pattern_alt(rng: random.Random):
    n_states = rng.randint(2, 3)
    alt_pos = rng.randrange(n_states)
    states = []
    classes = []  # per state: [subset] or [subset0, subset1]
    for i in range(n_states):
        last = i == n_states - 1
        if last:
            mn = mx = rng.randint(1, 2)
            greedy = True
        else:
            mn, mx = rng.choice(
                [(1, 1), (1, 2), (1, 3), (2, 2), (1, None), (0, 1)])
            greedy = rng.random() < 0.7
            if mn == mx or (i == 0 and mn == 0):
                greedy = True
        subset = sorted(rng.sample(_CLASSES, rng.randint(1, 2)))
        cond = "(" + " OR ".join(f"cls = '{c}'" for c in subset) + ")"
        if i == alt_pos:
            asub = sorted(rng.sample(_CLASSES, rng.randint(1, 2)))
            acond = "(" + " OR ".join(f"cls = '{c}'" for c in asub) + ")"
            states.append(State(
                f"S{i}", cond, min_count=mn, max_count=mx,
                strict_in=True, consecutive=True, greedy=greedy,
                alts=((f"T{i}", acond, None),)))
            classes.append([set(subset), set(asub)])
        else:
            states.append(State(
                f"S{i}", cond, min_count=mn, max_count=mx,
                strict_in=True, consecutive=True, greedy=greedy))
            classes.append([set(subset)])
    skip = rng.choice(["to_next", "past_last"])
    return (PatternSeq(states=tuple(states), horizon_s=36500 * 86400,
                       skip=skip).with_backtracking(max_branches=256),
            classes, skip)


def _regex_for_alt(states, classes) -> re.Pattern:
    parts = []
    for i, (s, subs) in enumerate(zip(states, classes)):
        body = "|".join("[" + "".join(sorted(ss)) + "]" for ss in subs)
        mn, mx = s.min_count, s.max_count
        quant = f"{{{mn},{'' if mx is None else mx}}}"
        lazy = "" if s.greedy else "?"
        parts.append(f"(?P<g{i}>(?:{body}){quant}{lazy})")
    return re.compile("".join(parts))


def _oracle_alt(rx, states, classes, text: str, skip: str):
    def labels_of(m):
        labs = []
        for i, (s, subs) in enumerate(zip(states, classes)):
            a, b = m.span(f"g{i}")
            for ch in text[a:b]:
                if ch in subs[0]:
                    labs.append(s.name)
                else:
                    labs.append(s.alts[0][0])
        return labs

    out = []
    if skip == "to_next":
        for p in range(len(text)):
            m = rx.match(text, p)
            if m and m.end() > m.start():
                out.append((p, tuple(labels_of(m))))
        return out
    p = 0
    while p < len(text):
        m = rx.match(text, p)
        if m and m.end() > m.start():
            out.append((p, tuple(labels_of(m))))
            p = m.end()
        else:
            p += 1
    return out


@pytest.mark.parametrize("case", rotating_subset(_ALT_SEEDS, tag="alt"))
def test_alternation_matches_regex_oracle(spark, case):
    rng = random.Random(case)
    pat, classes, skip = _random_pattern_alt(rng)
    text = "".join(rng.choice(_CLASSES) for _ in range(rng.randint(8, 14)))
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, i, t0 + dt.timedelta(seconds=i), ch)
            for i, ch in enumerate(text)]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, cls string")

    want = sorted(_oracle_alt(
        _regex_for_alt(pat.states, classes), pat.states, classes,
        text, skip))
    fold = pat.match_batch(ev, lowering=False)
    got = sorted((r.ids[0], tuple(r.labels)) for r in fold.collect())
    assert got == want, (
        f"fold vs regex: states="
        f"{[(s.min_count, s.max_count, s.greedy, subs) for s, subs in zip(pat.states, classes)]} "
        f"skip={skip} text={text!r}")
    # alternation states never lower — match_batch must route to the
    # fold and still agree
    assert sorted(
        (r.ids[0], tuple(r.labels)) for r in pat.match_batch(ev).collect()
    ) == want


# ---------------- negative-pattern band (round 8) ---------------------
#
# notNext / notFollowedBy kill semantics vs a lookahead-encoded regex
# oracle.  Shape: S0 (quantified, consecutive, class cA) --relaxed edge
# with neg guard g--> S1 (final, class cB, disjoint from cA).  The
# fold's contract, encoded in regex:
#
# - the S0 run is maximal-contiguous (greedy a-run; the char ending it
#   cannot extend, by cA/cB disjointness and the gap-start exclusion);
# - gap chars are skipped UNLESS they match the guard: notFollowedBy
#   excludes g from the whole gap, notNext only from the FIRST gap
#   slot (the fold's ``ng`` re-arm);
# - a char matching both g and cB is CONSUMED by S1 — never a
#   violation (gap ends at the first cB char).
#
# Deterministic and branching folds must both agree with the oracle
# (cA/cB disjoint → no forks, the two modes coincide).

_NEG_SEEDS = [970_000 + i for i in range(24)]


def _gen_neg(rng: random.Random):
    ca = set(rng.sample(_CLASSES, rng.randint(1, 2)))
    cb = set(_CLASSES) - ca if len(ca) == 2 else {
        rng.choice(sorted(set(_CLASSES) - ca))}
    cg = set(rng.sample(_CLASSES, rng.randint(1, 2)))
    mn, mx = rng.choice([(1, 1), (1, 2), (1, 3), (2, 2), (1, None)])
    strict_neg = rng.random() < 0.5
    cond = lambda cls: "(" + " OR ".join(
        f"cls = '{c}'" for c in sorted(cls)) + ")"
    base = PatternSeq(
        states=(State("S0", cond(ca), min_count=mn, max_count=mx,
                      strict_in=False, consecutive=True),),
        horizon_s=36500 * 86400,
        skip=rng.choice(["to_next", "past_last"]),
    )
    base = (base.not_next(cond(cg)) if strict_neg
            else base.not_followed_by(cond(cg)))
    base = base.followed_by("S1", cond(cb))
    return base, ca, cb, cg, strict_neg


def _neg_regex(ca, cb, cg, mn, mx, strict_neg) -> re.Pattern:
    """Lookahead/class-encoded oracle.  Gap rules: the FIRST gap slot
    always excludes the guard (both modes) and cB (ends the gap); it
    excludes cA only while the run could still extend (below max) —
    at max, cA chars are skippable like any other.  Later slots
    exclude cB and (notFollowedBy only) the guard.  Finite max needs
    two branches because 'first slot excludes cA' depends on the
    matched run length."""
    a = "[" + "".join(sorted(ca)) + "]"
    b = "[" + "".join(sorted(cb)) + "]"

    def neg_cls(excl):
        return "[^" + "".join(sorted(excl)) + "]"

    rest = neg_cls(cb) if strict_neg else neg_cls(cb | cg)

    def gap(first_excl):
        return f"(?:{neg_cls(first_excl)}(?:{rest})*)?"

    if mx is None:
        return re.compile(
            f"(?P<r1>{a}{{{mn},}})(?P<p1>{gap(ca | cb | cg)})(?P<g1>{b})")
    branches = [f"(?P<r1>{a}{{{mx}}})(?P<p1>{gap(cb | cg)})"]
    if mx > mn:
        branches.append(
            f"(?P<r2>{a}{{{mn},{mx - 1}}})(?P<p2>{gap(ca | cb | cg)})")
    return re.compile(f"(?:{'|'.join(branches)})(?P<g1>{b})")


def _neg_oracle(rx, text: str, skip: str):
    out = []

    def labels(m):
        a0, a1 = m.span("r1")
        if a0 < 0:  # the shorter-run branch matched
            a0, a1 = m.span("r2")
        return ["S0"] * (a1 - a0) + ["S1"], \
            list(range(a0, a1)) + [m.start("g1")]

    if skip == "to_next":
        for p in range(len(text)):
            m = rx.match(text, p)
            if m:
                labs, poss = labels(m)
                out.append((p, tuple(labs), tuple(poss)))
        return out
    p = 0
    while p < len(text):
        m = rx.match(text, p)
        if m:
            labs, poss = labels(m)
            out.append((p, tuple(labs), tuple(poss)))
            p = m.end()
        else:
            p += 1
    return out


@pytest.mark.parametrize("case", rotating_subset(_NEG_SEEDS, tag="neg"))
@pytest.mark.parametrize("backtrack", [False, True])
def test_negative_guard_matches_lookahead_oracle(spark, case, backtrack):
    rng = random.Random(case)
    pat, ca, cb, cg, strict_neg = _gen_neg(rng)
    if backtrack:
        pat = pat.with_backtracking()
    text = "".join(rng.choice(_CLASSES) for _ in range(rng.randint(8, 14)))
    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, i, t0 + dt.timedelta(seconds=i), ch)
         for i, ch in enumerate(text)],
        "user_id long, event_id long, ts timestamp, cls string")

    s0 = pat.states[0]
    rx = _neg_regex(ca, cb, cg, s0.min_count, s0.max_count, strict_neg)
    want = sorted(_neg_oracle(rx, text, pat.skip))
    got = sorted(
        (r.ids[0], tuple(r.labels), tuple(r.ids))
        for r in pat.match_batch(ev, lowering=False).collect())
    assert got == want, (
        f"case={case} bt={backtrack} text={text!r} ca={sorted(ca)} "
        f"cb={sorted(cb)} cg={sorted(cg)} strict_neg={strict_neg} "
        f"quant=({s0.min_count},{s0.max_count}) skip={pat.skip}")
