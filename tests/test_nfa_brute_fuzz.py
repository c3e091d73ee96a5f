"""Brute-force-oracle and chunked self-consistency fuzzers for the NFA
folds — pure-pandas (no Spark session), so hundreds of cases run in
seconds.

Part 1 — independent brute-force oracle (branching fold): a fresh
recursive regex-style engine with arbitrary per-event predicates,
written from the semantics contract (regex nested take/skip decision
order, one match per start).  It covers the axis the regex-oracle
fuzzer (test_nfa_backtrack_fuzz.py) cannot: CROSS-VARIABLE conditions
(Flink IterativeCondition, [cep]pattern/conditions/IterativeCondition
.java), plus greedy/reluctant mixes and leading optionals, under
no_skip/to_next (match groups independent there).

The seed band includes the cases that caught two round-7 bugs:
- ``!=`` against an UNBOUND variable / null event value returned True
  (Python ``x != None``) where SQL ternary logic, Flink's
  IterativeCondition contract, and the native lowering all say
  no-match (seeds 94/120/138/194/203/221 → ``_SqlNull``).
- start-fork deck priority used raw state order, handing a RELUCTANT
  leading optional the greedier deck; the regex decision order skips
  it preferentially (seed 187 → ``_target_prio`` on the start chain).

Part 2 — chunked-fold self-consistency across the FULL feature
matrix (both fold modes, relaxed/strict edges, consecutive, negative
guards, cross-variable conditions, all 5 skip modes, small horizons):
one-shot fold(finalize=True) must equal folding random chunks with
JSON-round-tripped partials between them plus a final finalize call —
exactly the batch-vs-streaming state contract.
"""
from __future__ import annotations

import json
import random
import re as _re

import pandas as pd
import pytest

from flink_1_11_1_spark.streaming.nfa import (
    PatternSeq,
    State,
    _fold_events,
    _spec,
)

from .fuzz_rotation import rotating_subset

pytestmark = pytest.mark.slow  # heavy battery: -m 'not slow' skips it

CLASSES = "abc"


# ---------------------------------------------------------------------
# Part 1: brute-force oracle vs the branching fold
# ---------------------------------------------------------------------
def brute_match(states, text, vals, start):
    """First match in regex decision order from ``start``.

    ``states``: dicts (classes, mn, mx, greedy, pred?).  Returns a list
    of (state_idx, pos) or None.  ``pred(pos, bound)`` implements SQL
    ternary logic independently (unbound ref → False).
    """
    n = len(text)

    def ok(si, pos, bound):
        s = states[si]
        if text[pos] not in s["classes"]:
            return False
        p = s.get("pred")
        return p is None or p(pos, bound)

    def rec(si, cnt, pos, bound):
        s = states[si]

        def take():
            if (s["mx"] is None or cnt < s["mx"]) and pos < n and ok(si, pos, bound):
                return rec(si, cnt + 1, pos + 1, bound + [(si, pos)])
            return None

        def exit_():
            if cnt < s["mn"]:
                return None
            if si == len(states) - 1:
                return bound if bound else None
            return rec(si + 1, 0, pos, bound)

        a, b = (take, exit_) if s["greedy"] else (exit_, take)
        r = a()
        return r if r is not None else b()

    res = rec(0, 0, start, [])
    if res and res[0][1] != start:
        return None  # first consumed row must sit at the start offset
    return res


def _make_pred(op, fn, ref, vals):
    """SQL-ternary EV.val <op> FIRST/LAST(S<ref>.val) — independent of
    the fold's _SqlNull machinery by construction."""

    def pred(pos, bound):
        rows = [p for (si, p) in bound if si == ref]
        if not rows:
            return False  # unbound variable → UNKNOWN → no match
        rv = vals[rows[0] if fn == "FIRST" else rows[-1]]
        ev = vals[pos]
        return {"<": ev < rv, ">": ev > rv, ">=": ev >= rv,
                "<=": ev <= rv, "==": ev == rv, "!=": ev != rv}[op]

    return pred


def _gen_strict(rng: random.Random):
    n = rng.randint(2, 3)
    sts, ost = [], []
    use_pred = rng.random() < 0.6
    pi = rng.randint(1, n - 1) if use_pred else -1
    op = fn = ref = None
    for i in range(n):
        last = i == n - 1
        subset = sorted(rng.sample(CLASSES, rng.randint(1, 2)))
        cond = "(" + " OR ".join(f"cls = '{c}'" for c in subset) + ")"
        if last:
            mn = mx = rng.randint(1, 2)
            greedy = True
        else:
            mn, mx = rng.choice(
                [(1, 1), (1, 2), (1, 3), (2, 2), (1, None), (0, 1), (0, None)])
            greedy = rng.random() < 0.6
            if mn == mx or (i == 0 and mn == 0):
                greedy = True
        py = None
        if i == pi:
            ref = rng.randint(0, i - 1)
            fn = rng.choice(["FIRST", "LAST"])
            op = rng.choice(["<", ">", ">=", "<=", "==", "!="])
            py = f'EV["val"] {op} {fn}("S{ref}","val")'
        sts.append(State(f"S{i}", cond, min_count=mn, max_count=mx,
                         strict_in=True, consecutive=True, greedy=greedy,
                         py_cond=py))
        ost.append({"classes": set(subset), "mn": mn, "mx": mx,
                    "greedy": greedy,
                    "pred_info": (op, fn, ref) if i == pi else None})
    p = PatternSeq(states=tuple(sts), horizon_s=36500 * 86400,
                   skip=rng.choice(["no_skip", "to_next"]),
                   value_cols=("val",) if use_pred else (),
                   backtrack=True, max_branches=4096)
    p._check()
    return p, ost


# the 7 bug-catching seeds lead; a fresh band follows
_BRUTE_SEEDS = [94, 120, 138, 187, 194, 203, 221] + list(range(300, 353))


@pytest.mark.parametrize("seed", rotating_subset(_BRUTE_SEEDS, tag="brute"))
def test_branching_fold_matches_brute_oracle(seed):
    rng = random.Random(seed)
    p, ost = _gen_strict(rng)
    n_ev = rng.randint(8, 12)
    text = "".join(rng.choice(CLASSES) for _ in range(n_ev))
    vals = [rng.randint(0, 5) for _ in range(n_ev)]
    states = []
    for o in ost:
        d = {"classes": o["classes"], "mn": o["mn"], "mx": o["mx"],
             "greedy": o["greedy"]}
        if o["pred_info"]:
            op, fn, ref = o["pred_info"]
            d["pred"] = _make_pred(op, fn, ref, vals)
        states.append(d)
    want = sorted(
        (s0, tuple(f"S{si}" for si, _ in m), tuple(pos for _, pos in m))
        for s0 in range(n_ev)
        if (m := brute_match(states, text, vals, s0)))

    data = {"user_id": [1] * n_ev, "event_id": list(range(n_ev)),
            "ts": pd.to_datetime(list(range(n_ev)), unit="s")}
    for i, o in enumerate(ost):
        data[f"f{i}"] = [c in o["classes"] for c in text]
    if p.value_cols:
        data["v_val"] = vals
    out, _ = _fold_events(1, pd.DataFrame(data), [], _spec(p), finalize=True)
    got = sorted((r[4][0], tuple(r[3]), tuple(r[4])) for r in out)
    assert got == want, (
        f"seed={seed} text={text!r} vals={vals} skip={p.skip} pattern="
        f"{[(s.min_count, s.max_count, s.greedy, s.py_cond) for s in p.states]}")


# ---------------------------------------------------------------------
# Part 2: chunked self-consistency over the full feature matrix
# ---------------------------------------------------------------------
def _gen_full(rng: random.Random):
    n = rng.randint(2, 4)
    bt = rng.random() < 0.5
    states = []
    for i in range(n):
        last = i == n - 1
        subset = sorted(rng.sample(CLASSES, rng.randint(1, 2)))
        cond = "(" + " OR ".join(f"cls = '{c}'" for c in subset) + ")"
        if last:
            mn = mx = rng.randint(1, 2)
            greedy = True
        else:
            mn, mx = rng.choice(
                [(1, 1), (1, 2), (1, 3), (2, 2), (1, None), (0, 1), (0, None)])
            greedy = True
            if bt and mn != mx and not (i == 0 and mn == 0):
                greedy = rng.random() < 0.7
        states.append(State(
            f"S{i}", cond, min_count=mn, max_count=mx,
            strict_in=(i > 0 and rng.random() < 0.4),
            consecutive=(mn != mx or mn > 1) and rng.random() < 0.5,
            greedy=greedy))
    if rng.random() < 0.35:
        gi = rng.randint(1, n - 1)
        neg = rng.choice(CLASSES)
        states[gi] = type(states[gi])(
            **{**states[gi].__dict__, "neg_cond": f"cls = '{neg}'",
               "neg_strict": rng.random() < 0.5})
    value_cols = ()
    if rng.random() < 0.35:
        ci = rng.randint(1, n - 1)
        ref = rng.randint(0, ci - 1)
        fn = rng.choice(["FIRST", "LAST"])
        op = rng.choice([">", ">=", "<", "!="])
        states[ci] = type(states[ci])(
            **{**states[ci].__dict__,
               "py_cond": f'EV["val"] {op} {fn}("S{ref}","val")'})
        value_cols = ("val",)
    skip = rng.choice(
        ["no_skip", "to_next", "past_last",
         f"to_first:S{rng.randint(0, n - 1)}",
         f"to_last:S{rng.randint(0, n - 1)}"])
    p = PatternSeq(states=tuple(states), skip=skip,
                   horizon_s=rng.choice([36500 * 86400, 4, 7]),
                   value_cols=value_cols, backtrack=bt,
                   max_branches=rng.choice([64, 64, 4]))
    try:
        p._check()
    except ValueError:
        return None
    return p


_CHUNK_SEEDS = list(range(5000, 5060))


@pytest.mark.parametrize("seed", rotating_subset(_CHUNK_SEEDS, tag="chunk"))
def test_chunked_fold_equals_one_shot(seed):
    rng = random.Random(seed)
    p = _gen_full(rng)
    if p is None:
        pytest.skip("seed drew an invalid pattern (reluctant final)")
    n_ev = rng.randint(8, 16)
    text = "".join(rng.choice(CLASSES) for _ in range(n_ev))
    vals = [rng.randint(0, 9) for _ in range(n_ev)]
    data = {"user_id": [1] * n_ev, "event_id": list(range(n_ev)),
            "ts": pd.to_datetime(list(range(n_ev)), unit="s")}
    for i, s in enumerate(p.states):
        subset = set(_re.findall(r"'(\w)'", s.cond))
        data[f"f{i}"] = [c in subset for c in text]
    for i, s in enumerate(p.states):
        if s.neg_cond:
            neg = set(_re.findall(r"'(\w)'", s.neg_cond))
            data[f"g{i}"] = [c in neg for c in text]
    if p.value_cols:
        data["v_val"] = vals
    pdf = pd.DataFrame(data)
    spec = _spec(p)

    out1, _ = _fold_events(1, pdf, [], spec, finalize=True)

    cuts = sorted(rng.sample(range(1, n_ev), rng.randint(0, min(4, n_ev - 1))))
    bounds = [0] + cuts + [n_ev]
    out2, partials = [], []
    for a, b in zip(bounds, bounds[1:]):
        o, partials = _fold_events(1, pdf.iloc[a:b], partials, spec)
        partials = json.loads(json.dumps(partials))  # streaming state trip
        out2.extend(o)
    o, _ = _fold_events(1, pdf.iloc[0:0], partials, spec, finalize=True)
    out2.extend(o)

    k1 = [(r[3], r[4]) for r in out1]
    k2 = [(r[3], r[4]) for r in out2]
    assert k1 == k2, f"seed={seed} cuts={cuts} skip={p.skip} bt={p.backtrack}"


# ---------------------------------------------------------------------
# Part 3: deterministic-fold AFTER MATCH SKIP bookkeeping vs an
# independent per-start walker + event-ordered emission replay
# (past_last kills every live partial and suppresses same-event starts;
# to_first/to_last raise a min-start reference killing earlier starts —
# the contract in PatternSeq.after_match_skip's docstring).
# ---------------------------------------------------------------------
def _det_walker(states, text, vals, start):
    """Deterministic single-path match: greedy extend, else advance to
    the first matching later state (skipping optionals), else dead."""
    n = len(text)

    def ok(si, pos, bound):
        s = states[si]
        if text[pos] not in s["classes"]:
            return False
        p = s.get("pred")
        return p is None or p(pos, bound)

    chain = [0]
    while chain[-1] < len(states) - 1 and states[chain[-1]]["mn"] == 0:
        chain.append(chain[-1] + 1)
    si = next((j for j in chain if ok(j, start, [])), None)
    if si is None:
        return None
    bound, cnt = [(si, start)], 1
    if si == len(states) - 1 and cnt == states[si]["mn"]:
        return bound
    pos = start + 1
    while pos < n:
        s = states[si]
        if (s["mx"] is None or cnt < s["mx"]) and ok(si, pos, bound):
            cnt += 1
            bound.append((si, pos))
            if si == len(states) - 1 and cnt == s["mn"]:
                return bound
            pos += 1
            continue
        if cnt >= s["mn"]:
            j = si + 1
            advanced = False
            while j < len(states):
                if ok(j, pos, bound):
                    si, cnt = j, 1
                    bound.append((j, pos))
                    if j == len(states) - 1 and states[j]["mn"] == 1:
                        return bound
                    advanced = True
                    break
                if states[j]["mn"] == 0:
                    j += 1
                    continue
                break
            if advanced:
                pos += 1
                continue
        return None
    return None


def _emit_replay(matches, skip, n):
    mode, _, var = skip.partition(":")
    ends = {p: b[-1][1] for p, b in matches.items()}
    emitted, dead, suppressed = [], set(), set()
    min_start = None
    for e in range(n):
        comp = sorted(p for p, pe in ends.items()
                      if pe == e and p not in dead and p not in suppressed)
        past = False
        for p in comp:
            if past:
                continue
            if min_start is not None and p < min_start:
                continue
            emitted.append(p)
            if mode == "past_last":
                for q in matches:
                    if q != p and q <= e and ends[q] > e:
                        dead.add(q)
                suppressed.add(e)
                past = True
            elif mode in ("to_first", "to_last"):
                vi = int(var[1:])
                idxs = [pos for (si, pos) in matches[p] if si == vi]
                if idxs:
                    ref = idxs[0] if mode == "to_first" else idxs[-1]
                    if min_start is None or ref > min_start:
                        min_start = ref
                        for q in matches:
                            if q < min_start and q not in dead \
                                    and q not in suppressed and ends[q] > e:
                                dead.add(q)
    return sorted(emitted)


def _gen_det_skip(rng: random.Random):
    n = rng.randint(2, 3)
    sts, ost = [], []
    use_pred = rng.random() < 0.4
    pi = rng.randint(1, n - 1) if use_pred else -1
    for i in range(n):
        last = i == n - 1
        subset = sorted(rng.sample(CLASSES, rng.randint(1, 2)))
        cond = "(" + " OR ".join(f"cls = '{c}'" for c in subset) + ")"
        if last:
            mn = mx = rng.randint(1, 2)
        else:
            mn, mx = rng.choice(
                [(1, 1), (1, 2), (1, 3), (2, 2), (1, None), (0, 1), (0, None)])
        py = info = None
        if i == pi:
            ref = rng.randint(0, i - 1)
            fn = rng.choice(["FIRST", "LAST"])
            op = rng.choice(["<", ">", ">=", "<=", "==", "!="])
            py = f'EV["val"] {op} {fn}("S{ref}","val")'
            info = (op, fn, ref)
        sts.append(State(f"S{i}", cond, min_count=mn, max_count=mx,
                         strict_in=True, consecutive=True, py_cond=py))
        ost.append({"classes": set(subset), "mn": mn, "mx": mx,
                    "pred_info": info})
    vtag = rng.randint(0, n - 1)
    skip = rng.choice(["past_last", f"to_first:S{vtag}", f"to_last:S{vtag}"])
    p = PatternSeq(states=tuple(sts), horizon_s=36500 * 86400, skip=skip,
                   value_cols=("val",) if use_pred else ())
    p._check()
    return p, ost


@pytest.mark.parametrize("seed", rotating_subset(range(7000, 7040), tag="r7"))
def test_det_fold_skip_matches_replay_oracle(seed):
    rng = random.Random(seed)
    p, ost = _gen_det_skip(rng)
    n_ev = rng.randint(8, 14)
    text = "".join(rng.choice(CLASSES) for _ in range(n_ev))
    vals = [rng.randint(0, 5) for _ in range(n_ev)]
    states = []
    for o in ost:
        d = {"classes": o["classes"], "mn": o["mn"], "mx": o["mx"]}
        if o["pred_info"]:
            op, fn, ref = o["pred_info"]
            d["pred"] = _make_pred(op, fn, ref, vals)
        states.append(d)
    matches = {}
    for s0 in range(n_ev):
        m = _det_walker(states, text, vals, s0)
        if m and m[0][1] == s0:
            matches[s0] = m
    want = _emit_replay(matches, p.skip, n_ev)

    data = {"user_id": [1] * n_ev, "event_id": list(range(n_ev)),
            "ts": pd.to_datetime(list(range(n_ev)), unit="s")}
    for i, o in enumerate(ost):
        data[f"f{i}"] = [c in o["classes"] for c in text]
    if p.value_cols:
        data["v_val"] = vals
    out, _ = _fold_events(1, pd.DataFrame(data), [], _spec(p), finalize=True)
    got = sorted(r[4][0] for r in out)
    assert got == want, f"seed={seed} text={text!r} skip={p.skip}"


# ---------------------------------------------------------------------
# Targeted regressions for the two round-7 bugs the oracle caught
# ---------------------------------------------------------------------
def _run(p: PatternSeq, text, vals=None):
    n = len(text)
    data = {"user_id": [1] * n, "event_id": list(range(n)),
            "ts": pd.to_datetime(list(range(n)), unit="s")}
    for i, s in enumerate(p.states):
        subset = set(_re.findall(r"'(\w)'", s.cond))
        data[f"f{i}"] = [c in subset for c in text]
    if p.value_cols:
        data["v_val"] = vals
    out, _ = _fold_events(1, pd.DataFrame(data), [], _spec(p), finalize=True)
    return [(r[4][0], tuple(r[3])) for r in out]


def test_neq_against_unbound_variable_is_no_match():
    """B.val <> FIRST(A.val) with A unbound (skipped optional) is
    UNKNOWN → no match — not Python's ``x != None`` → True."""
    p = PatternSeq(
        states=(
            State("A", "cls = 'a'", min_count=0, max_count=1,
                  strict_in=False, consecutive=False),
            State("B", "cls = 'b'", min_count=1, max_count=1,
                  strict_in=True, consecutive=True,
                  py_cond='EV["val"] != FIRST("A","val")'),
        ),
        horizon_s=3600, skip="to_next", value_cols=("val",),
        backtrack=True)
    # bare 'b': A unbound → != is UNKNOWN → only the a-then-b match fires
    assert _run(p, "bb", vals=[1, 2]) == []
    assert _run(p, "ab", vals=[1, 2]) == [(0, ("A", "B"))]
    # equal values with A bound: != genuinely False
    assert _run(p, "ab", vals=[2, 2]) == []


def test_start_fork_respects_reluctant_preference():
    """Start chain c* b?? [ab]{2}: a reluctant optional inside the
    leading chain is preferentially SKIPPED at the start fork (regex
    decision order), not entered."""
    p = PatternSeq(
        states=(
            State("S0", "cls = 'c'", min_count=0, max_count=None,
                  strict_in=False, consecutive=True),
            State("S1", "cls = 'b'", min_count=0, max_count=1,
                  strict_in=True, consecutive=True, greedy=False),
            State("S2", "(cls = 'a' OR cls = 'b')", min_count=2,
                  max_count=2, strict_in=True, consecutive=True),
        ),
        horizon_s=3600, skip="no_skip", backtrack=True)
    got = dict(_run(p, "bba"))
    # start 0: S1 skipped — S2 takes 'bb' (regex: c*b??[ab]{2} on 'bba')
    assert got[0] == ("S2", "S2")


# ---------------------------------------------------------------------
# Part 4 (round 8): chunked self-consistency for the new pattern
# algebra — alternation states, until() stops, group loop-backs and
# the emit-all any-edges.  Same contract as Part 2: one-shot
# fold(finalize=True) == random chunks with JSON-round-tripped
# partials (the streaming state trip — "gc" counters, alt labels and
# frozen flags must all survive serialization).
# ---------------------------------------------------------------------
def _gen_r8(rng: random.Random):
    feature = rng.choice(["alt", "until", "group", "any"])
    bt = feature == "any" or rng.random() < 0.5

    def cls():
        return sorted(rng.sample(CLASSES, rng.randint(1, 2)))

    def cond(c):
        return "(" + " OR ".join(f"cls = '{x}'" for x in c) + ")"

    groups = ()
    if feature == "group":
        pm = rng.choice([1, 2])
        states = [
            State("S0", cond(cls()), min_count=1, max_count=1,
                  strict_in=rng.random() < 0.5, consecutive=True),
            State("S1", cond(cls()), min_count=pm, max_count=pm,
                  strict_in=True, consecutive=True),
            State("S2", cond(cls()), min_count=1, max_count=1,
                  strict_in=rng.random() < 0.5),
        ]
        gm = rng.choice([1, 2])
        gx = rng.choice([gm, gm + 1])
        groups = ((0, 1, gm, gx, rng.random() < 0.7 or not bt),)
        if not groups[0][4] and not bt:
            bt = True
    elif feature == "alt":
        states = [
            State("S0", cond(cls()), min_count=1,
                  max_count=rng.choice([1, 2, None]),
                  consecutive=rng.random() < 0.5,
                  alts=((f"T0", cond(cls()), None),)),
            State("S1", cond(cls()), min_count=1, max_count=1,
                  strict_in=rng.random() < 0.4),
        ]
        if states[0].max_count is None:
            states[0] = State(**{**states[0].__dict__,
                                 "consecutive": True})
    elif feature == "until":
        states = [
            State("S0", cond(cls()), min_count=rng.choice([1, 2]),
                  max_count=None, consecutive=rng.random() < 0.5,
                  until_cond=cond(cls())),
            State("S1", cond(cls()), min_count=1, max_count=1),
        ]
    else:  # any-edge
        comb = rng.random() < 0.5
        states = [
            State("S0", cond(cls()), min_count=1,
                  max_count=None if comb else 1,
                  combinations=comb),
            State("S1", cond(cls()), min_count=1, max_count=1,
                  any_in=not comb or rng.random() < 0.5),
        ]
        if not states[0].combinations and not states[1].any_in:
            states[1] = State(**{**states[1].__dict__, "any_in": True})
    skip = "no_skip" if feature == "any" else rng.choice(
        ["no_skip", "to_next", "past_last"])
    p = PatternSeq(states=tuple(states), groups=groups, skip=skip,
                   horizon_s=rng.choice([36500 * 86400, 6]),
                   backtrack=bt, max_branches=128)
    try:
        p._check()
    except ValueError:
        return None
    return p


_R8_SEEDS = list(range(6000, 6048))


@pytest.mark.parametrize("seed", rotating_subset(_R8_SEEDS, tag="r8"))
def test_chunked_fold_equals_one_shot_r8_features(seed):
    rng = random.Random(seed)
    p = _gen_r8(rng)
    if p is None:
        pytest.skip("seed drew an invalid pattern")
    n_ev = rng.randint(8, 16)
    text = "".join(rng.choice(CLASSES) for _ in range(n_ev))
    data = {"user_id": [1] * n_ev, "event_id": list(range(n_ev)),
            "ts": pd.to_datetime(list(range(n_ev)), unit="s")}
    for i, s in enumerate(p.states):
        subset = set(_re.findall(r"'(\w)'", s.cond))
        data[f"f{i}"] = [c in subset for c in text]
        for k, (_nm, acond, _pc) in enumerate(s.alts):
            asub = set(_re.findall(r"'(\w)'", acond))
            data[f"f{i}x{k}"] = [c in asub for c in text]
        if s.until_cond:
            usub = set(_re.findall(r"'(\w)'", s.until_cond))
            data[f"u{i}"] = [c in usub for c in text]
    pdf = pd.DataFrame(data)
    spec = _spec(p)

    out1, _ = _fold_events(1, pdf, [], spec, finalize=True)

    cuts = sorted(rng.sample(range(1, n_ev), rng.randint(1, min(4, n_ev - 1))))
    bounds = [0] + cuts + [n_ev]
    out2, partials = [], []
    for a, b in zip(bounds, bounds[1:]):
        o, partials = _fold_events(1, pdf.iloc[a:b], partials, spec)
        partials = json.loads(json.dumps(partials))  # streaming state trip
        out2.extend(o)
    o, _ = _fold_events(1, pdf.iloc[0:0], partials, spec, finalize=True)
    out2.extend(o)

    k1 = sorted((tuple(r[3]), tuple(r[4])) for r in out1)
    k2 = sorted((tuple(r[3]), tuple(r[4])) for r in out2)
    assert k1 == k2, (
        f"seed={seed} cuts={cuts} skip={p.skip} bt={p.backtrack} "
        f"groups={p.groups}")


# ---------------------------------------------------------------------
# Round 11: greedy quantified FINAL states through both oracles
# ---------------------------------------------------------------------
def _gen_strict_qfinal(rng: random.Random):
    """_gen_strict variant whose LAST state is a greedy quantified run
    (B{1,2}/B{1,3}/B{2,3}/B+) — the brute oracle's greedy take-first
    recursion already encodes close-at-cap/break/end-of-text."""
    n = rng.randint(2, 3)
    sts, ost = [], []
    use_pred = rng.random() < 0.6
    pi = rng.randint(1, n - 1) if use_pred else -1
    for i in range(n):
        last = i == n - 1
        subset = sorted(rng.sample(CLASSES, rng.randint(1, 2)))
        cond = "(" + " OR ".join(f"cls = '{c}'" for c in subset) + ")"
        if last:
            mn, mx = rng.choice(
                [(1, 2), (1, 3), (2, 3), (1, None), (2, None)])
            greedy = True
        else:
            mn, mx = rng.choice(
                [(1, 1), (1, 2), (2, 2), (0, 1), (1, None)])
            greedy = rng.random() < 0.6
            if mn == mx or (i == 0 and mn == 0):
                greedy = True
        py = None
        if i == pi:
            ref = rng.randint(0, i - 1)
            fn = rng.choice(["FIRST", "LAST"])
            op = rng.choice(["<", ">", ">=", "<=", "==", "!="])
            py = f'EV["val"] {op} {fn}("S{ref}","val")'
        sts.append(State(f"S{i}", cond, min_count=mn, max_count=mx,
                         strict_in=True, consecutive=True, greedy=greedy,
                         py_cond=py))
        ost.append({"classes": set(subset), "mn": mn, "mx": mx,
                    "greedy": greedy,
                    "pred_info": (op, fn, ref) if i == pi else None})
    p = PatternSeq(states=tuple(sts), horizon_s=36500 * 86400,
                   skip=rng.choice(["no_skip", "to_next"]),
                   value_cols=("val",) if use_pred else (),
                   backtrack=True, max_branches=4096)
    p._check()
    return p, ost


@pytest.mark.parametrize("seed", rotating_subset(range(8100, 8160), tag="r11a"))
def test_branching_fold_matches_brute_oracle_qfinal(seed):
    rng = random.Random(seed)
    p, ost = _gen_strict_qfinal(rng)
    n_ev = rng.randint(8, 12)
    text = "".join(rng.choice(CLASSES) for _ in range(n_ev))
    vals = [rng.randint(0, 5) for _ in range(n_ev)]
    states = []
    for o in ost:
        d = {"classes": o["classes"], "mn": o["mn"], "mx": o["mx"],
             "greedy": o["greedy"]}
        if o["pred_info"]:
            op, fn, ref = o["pred_info"]
            d["pred"] = _make_pred(op, fn, ref, vals)
        states.append(d)
    want = sorted(
        (s0, tuple(f"S{si}" for si, _ in m), tuple(pos for _, pos in m))
        for s0 in range(n_ev)
        if (m := brute_match(states, text, vals, s0)))
    data = {"user_id": [1] * n_ev, "event_id": list(range(n_ev)),
            "ts": pd.to_datetime(list(range(n_ev)), unit="s")}
    for i, o in enumerate(ost):
        data[f"f{i}"] = [c in o["classes"] for c in text]
    if p.value_cols:
        data["v_val"] = vals
    out, _ = _fold_events(1, pd.DataFrame(data), [], _spec(p), finalize=True)
    got = sorted((r[4][0], tuple(r[3]), tuple(r[4])) for r in out)
    assert got == want, (
        f"seed={seed} text={text!r} vals={vals} skip={p.skip} pattern="
        f"{[(s.min_count, s.max_count, s.greedy, s.py_cond) for s in p.states]}")


def _det_walker_qf(states, text, vals, start):
    """_det_walker extended with quantified-final completion (cap /
    strict break / end-of-text) — the deterministic fold's contract."""
    n = len(text)
    last_i = len(states) - 1
    s_last = states[last_i]
    qf = s_last["mx"] is None or s_last["mx"] != s_last["mn"]

    def ok(si, pos, bound):
        s = states[si]
        if text[pos] not in s["classes"]:
            return False
        p = s.get("pred")
        return p is None or p(pos, bound)

    def done(si, cnt):
        if si != last_i:
            return False
        s = states[si]
        if qf:
            # greedy quantified final: count alone completes ONLY at a
            # bounded cap; unbounded runs close at break/end-of-input
            return s["mx"] is not None and cnt == s["mx"]
        return cnt == s["mn"]

    chain = [0]
    while chain[-1] < last_i and states[chain[-1]]["mn"] == 0:
        chain.append(chain[-1] + 1)
    si = next((j for j in chain if ok(j, start, [])), None)
    if si is None:
        return None
    bound, cnt = [(si, start)], 1
    if done(si, 1):
        return bound
    pos = start + 1
    while pos < n:
        s = states[si]
        if (s["mx"] is None or cnt < s["mx"]) and ok(si, pos, bound):
            cnt += 1
            bound.append((si, pos))
            if done(si, cnt):
                return bound
            pos += 1
            continue
        if si == last_i and qf and cnt >= s["mn"]:
            return bound  # strict break closes the greedy run
        if cnt >= s["mn"]:
            j = si + 1
            advanced = False
            while j < len(states):
                if ok(j, pos, bound):
                    si, cnt = j, 1
                    bound.append((j, pos))
                    if done(j, 1):
                        return bound
                    advanced = True
                    break
                if states[j]["mn"] == 0:
                    j += 1
                    continue
                break
            if advanced:
                pos += 1
                continue
        return None
    if si == last_i and qf and cnt >= states[si]["mn"]:
        return bound  # end of input closes the run (finalize)
    return None


def _gen_det_skip_qfinal(rng: random.Random):
    n = rng.randint(2, 3)
    sts, ost = [], []
    use_pred = rng.random() < 0.4
    pi = rng.randint(1, n - 1) if use_pred else -1
    for i in range(n):
        last = i == n - 1
        subset = sorted(rng.sample(CLASSES, rng.randint(1, 2)))
        cond = "(" + " OR ".join(f"cls = '{c}'" for c in subset) + ")"
        if last:
            mn, mx = rng.choice(
                [(1, 2), (1, 3), (2, 3), (1, None), (2, None)])
        else:
            mn, mx = rng.choice(
                [(1, 1), (1, 2), (2, 2), (0, 1), (1, None)])
        py = info = None
        if i == pi:
            ref = rng.randint(0, i - 1)
            fn = rng.choice(["FIRST", "LAST"])
            op = rng.choice(["<", ">", ">=", "<=", "==", "!="])
            py = f'EV["val"] {op} {fn}("S{ref}","val")'
            info = (op, fn, ref)
        sts.append(State(f"S{i}", cond, min_count=mn, max_count=mx,
                         strict_in=True, consecutive=True, py_cond=py))
        ost.append({"classes": set(subset), "mn": mn, "mx": mx,
                    "pred_info": info})
    vtag = rng.randint(0, n - 1)
    skip = rng.choice(["past_last", f"to_first:S{vtag}", f"to_last:S{vtag}",
                       "no_skip", "to_next"])
    p = PatternSeq(states=tuple(sts), horizon_s=36500 * 86400, skip=skip,
                   value_cols=("val",) if use_pred else ())
    p._check()
    return p, ost


@pytest.mark.parametrize("seed", rotating_subset(range(8200, 8260), tag="r11b"))
def test_det_fold_qfinal_skip_matches_replay_oracle(seed):
    """The round-11 past_last fix under fuzz: emission keyed on the
    match's END row — a break-completed match (resolved at a later
    event) must prune exactly like the end-ordered replay oracle."""
    rng = random.Random(seed)
    p, ost = _gen_det_skip_qfinal(rng)
    n_ev = rng.randint(8, 14)
    text = "".join(rng.choice(CLASSES) for _ in range(n_ev))
    vals = [rng.randint(0, 5) for _ in range(n_ev)]
    states = []
    for o in ost:
        d = {"classes": o["classes"], "mn": o["mn"], "mx": o["mx"]}
        if o["pred_info"]:
            op, fn, ref = o["pred_info"]
            d["pred"] = _make_pred(op, fn, ref, vals)
        states.append(d)
    matches = {}
    for s0 in range(n_ev):
        m = _det_walker_qf(states, text, vals, s0)
        if m and m[0][1] == s0:
            matches[s0] = m
    skip_mode = p.skip.partition(":")[0]
    if skip_mode in ("no_skip", "to_next"):
        want = sorted(matches)  # every start's match emits
    else:
        want = _emit_replay(matches, p.skip, n_ev)
    data = {"user_id": [1] * n_ev, "event_id": list(range(n_ev)),
            "ts": pd.to_datetime(list(range(n_ev)), unit="s")}
    for i, o in enumerate(ost):
        data[f"f{i}"] = [c in o["classes"] for c in text]
    if p.value_cols:
        data["v_val"] = vals
    out, _ = _fold_events(1, pd.DataFrame(data), [], _spec(p), finalize=True)
    got = sorted(r[4][0] for r in out)
    assert got == want, (
        f"seed={seed} text={text!r} vals={vals} skip={p.skip} pattern="
        f"{[(s.min_count, s.max_count) for s in p.states]}")
