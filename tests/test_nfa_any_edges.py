"""Non-deterministic relaxed contiguity — Flink ``followedByAny`` and
``allowCombinations()`` (pattern/Pattern.java, Quantifier.java
SKIP_TILL_ANY / combinations): a matching event may also be IGNORED,
and every found match emits (Flink CEP PatternStream under NO_SKIP).

Hand fixtures with exhaustively-known match sets, plus a brute-force
subset-enumeration band (small inputs, all combinations computable
independently)."""

from __future__ import annotations

import datetime as dt
import itertools
import random

import pytest

from flink_1_11_1_spark.streaming import nfa


def _events(spark, types):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(1, i + 1, base + dt.timedelta(seconds=i + 1), t)
         for i, t in enumerate(types)],
        "user_id long, event_id long, ts timestamp, event_type string",
    )


def _ids(df):
    return sorted(tuple(r.ids) for r in df.collect())


def test_followed_by_any_every_occurrence(spark):
    p = (nfa.PatternSeq.begin("A", "event_type = 'a'")
         .followed_by_any("B", "event_type = 'b'")
         .within("1 hour").with_backtracking())
    ev = _events(spark, ["a", "b", "x", "b", "b"])
    assert _ids(p.match_batch(ev)) == [(1, 2), (1, 4), (1, 5)]
    # plain followedBy: first occurrence only
    p1 = (nfa.PatternSeq.begin("A", "event_type = 'a'")
          .followed_by("B", "event_type = 'b'")
          .within("1 hour").with_backtracking())
    assert _ids(p1.match_batch(ev)) == [(1, 2)]


def test_followed_by_any_multiple_starts(spark):
    p = (nfa.PatternSeq.begin("A", "event_type = 'a'")
         .followed_by_any("B", "event_type = 'b'")
         .within("1 hour").with_backtracking())
    ev = _events(spark, ["a", "a", "b", "b"])
    assert _ids(p.match_batch(ev)) == [(1, 3), (1, 4), (2, 3), (2, 4)]


def test_allow_combinations_all_subsets(spark):
    """A+ with allowCombinations then B: every subset of the a-run
    containing the start event, crossed with the b."""
    p = (nfa.PatternSeq.begin("A", "event_type = 'a'")
         .one_or_more().allow_combinations()
         .followed_by("B", "event_type = 'b'")
         .within("1 hour").with_backtracking())
    ev = _events(spark, ["a", "a", "a", "b"])
    got = _ids(p.match_batch(ev))
    want = sorted(
        tuple(sorted(set(sub) | {s})) + (4,)
        for s in (1, 2, 3)
        for k in range(0, 3)
        for sub in itertools.combinations([x for x in (1, 2, 3) if x > s], k)
    )
    assert got == sorted(set(want))


def test_any_edge_chained_states(spark):
    """followedByAny composes across states: a->any b->any c."""
    p = (nfa.PatternSeq.begin("A", "event_type = 'a'")
         .followed_by_any("B", "event_type = 'b'")
         .followed_by_any("C", "event_type = 'c'")
         .within("1 hour").with_backtracking())
    ev = _events(spark, ["a", "b", "b", "c", "c"])
    assert _ids(p.match_batch(ev)) == [
        (1, 2, 4), (1, 2, 5), (1, 3, 4), (1, 3, 5)
    ]


def test_any_edge_validation():
    p = (nfa.PatternSeq.begin("A", "true")
         .followed_by_any("B", "true").within("1 hour"))
    with pytest.raises(ValueError, match="with_backtracking"):
        p._check()
    with pytest.raises(ValueError, match="NO_SKIP"):
        p.with_backtracking().after_match_skip("past_last")._check()
    with pytest.raises(ValueError, match="quantified"):
        nfa.PatternSeq.begin("A", "true").allow_combinations()


# ---------------- brute-force enumeration band ------------------------
#
# Independent oracle: enumerate every (start, occurrence-choice)
# combination for A(+comb?) ~any?~ B over random strings.  Small
# inputs keep the cross product tiny.

_SEEDS = [990_000 + i for i in range(16)]


def _brute(text, comb: bool, any_b: bool):
    """All matches of A[+comb] B with A='a', B='b'."""
    n = len(text)
    out = set()
    a_pos = [i for i, c in enumerate(text) if c == "a"]
    b_pos = [i for i, c in enumerate(text) if c == "b"]
    for s in a_pos:
        later_a = [i for i in a_pos if i > s]
        if comb:
            a_sets = [
                tuple([s] + sorted(sub))
                for k in range(len(later_a) + 1)
                for sub in itertools.combinations(later_a, k)
            ]
        else:
            # plain oneOrMore relaxed: the maximal run of a's from s
            # (matching events must be consumed), i.e. every a >= s
            a_sets = [tuple([s] + later_a)]
        for aset in a_sets:
            bs = [b for b in b_pos if b > aset[-1]]
            if not bs:
                continue
            picks = bs if any_b else bs[:1]
            # with a non-any B edge, intervening a's BETWEEN the run
            # end and the b would extend the run first (relaxed loop:
            # matching events must be consumed) — already handled by
            # the maximal-run construction above for the non-comb
            # case; for comb, any un-consumed 'a' before the b is
            # ignorable by the combinations loop, so every b works
            for b in picks:
                out.add(tuple(x + 1 for x in aset) + (b + 1,))
    return sorted(out)


@pytest.mark.parametrize("case", _SEEDS)
def test_any_combinations_match_brute(spark, case):
    rng = random.Random(case)
    comb = rng.random() < 0.5
    any_b = rng.random() < 0.5 if not comb else True
    text = "".join(rng.choice("abx") for _ in range(rng.randint(5, 8)))
    p = nfa.PatternSeq.begin("A", "event_type = 'a'").one_or_more()
    if comb:
        p = p.allow_combinations()
    p = (p.followed_by_any("B", "event_type = 'b'") if any_b
         else p.followed_by("B", "event_type = 'b'"))
    p = p.within("1 hour").with_backtracking(max_branches=2048)
    if not (comb or any_b):
        return  # plain shape — covered elsewhere
    got = _ids(p.match_batch(_events(spark, list(text))))
    want = _brute(text, comb, any_b)
    assert got == want, f"case={case} text={text!r} comb={comb} any={any_b}"


def test_any_pair_tier_e_equals_fold(spark):
    """A followedByAny B (both {1}, row-local, no_skip) lowers to a
    horizon-bounded range self-join (tier E) — same rows as the
    emit-all fold, no Python stage."""
    p = (nfa.PatternSeq.begin("A", "event_type = 'a'")
         .followed_by_any("B", "event_type = 'b'")
         .within("5 seconds").with_backtracking())
    ev = _events(spark, ["a", "b", "a", "x", "b", "b", "a"])
    low = p.match_batch(ev)
    plan = low._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    got_low = sorted(tuple(r.ids) for r in low.collect())
    got_fold = sorted(
        tuple(r.ids) for r in p.match_batch(ev, lowering=False).collect())
    assert got_low == got_fold
    # horizon bound: a1(t1) pairs with b2(t2),b5(t5),b6(t6) within 5s;
    # a3(t3) with b5,b6; a7 with nothing
    assert got_fold == [(1, 2), (1, 5), (1, 6), (3, 5), (3, 6)]
    # a 3-state any-chain stays on the fold (tier E is the pair shape)
    p3 = (nfa.PatternSeq.begin("A", "event_type = 'a'")
          .followed_by_any("B", "event_type = 'b'")
          .followed_by_any("C", "event_type = 'x'")
          .within("1 hour").with_backtracking())
    plan3 = p3.match_batch(ev)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan3


def test_until_stream_equals_unfinalized_fold(spark, tmp_path):
    """Round-9 parity: `Pattern.until()`'s freeze-not-consume stop flag
    survives the applyInPandasWithState JSON state round-trip —
    reference = the unfinalized shared fold over the full data."""
    from flink_1_11_1_spark import catalog
    from flink_1_11_1_spark.streaming import replay
    from flink_1_11_1_spark.streaming.nfa import (
        PatternSeq, _fold_events, _spec, _with_flags)

    from .conftest import SF_SMOKE

    d = str(tmp_path / "replay_until")
    replay.write_replay(spark, SF_SMOKE, d, parts=5)
    pat = (
        PatternSeq.begin("V", "event_type = 'view'").one_or_more()
        .until("event_type = 'error'")
        .followed_by("P", "event_type = 'purchase'")
        .within("24 hours")
    )
    sel = ["user_id", "event_id", "ts", "event_type"]
    stream = replay.events_stream(spark, d)
    got, _ = replay.run_stream(
        pat.match_stream(stream.select(*sel)), "append", "s_until_nfa")
    events = catalog.load_table(spark, SF_SMOKE, "events").select(*sel)
    flagged = _with_flags(events, pat.states, "user_id", ()).toPandas()
    spec = _spec(pat)
    want = set()
    for uid, pdf in flagged.groupby("user_id"):
        out, _ = _fold_events(
            uid, pdf.sort_values(["ts", "event_id"]), [], spec)
        want |= {(uid, tuple(t[3]), tuple(t[4])) for t in out}
    assert {(r.user_id, tuple(r.labels), tuple(r.ids)) for r in got} == want
    assert len(want) > 0


def test_emit_all_stream_equals_unfinalized_fold(spark, tmp_path):
    """Round-9 parity: followedByAny's emit-all forks (every completed
    branch emits) survive the streaming JSON state round-trip —
    reference = the unfinalized shared fold over the full data."""
    from flink_1_11_1_spark import catalog
    from flink_1_11_1_spark.streaming import replay
    from flink_1_11_1_spark.streaming.nfa import (
        PatternSeq, _fold_events, _spec, _with_flags)

    from .conftest import SF_SMOKE

    d = str(tmp_path / "replay_any")
    replay.write_replay(spark, SF_SMOKE, d, parts=5)
    pat = (
        PatternSeq.begin("a", "event_type = 'click'")
        .followed_by_any("b", "event_type = 'purchase'")
        .within("6 hours")
        .with_backtracking(max_branches=4096)
    )
    sel = ["user_id", "event_id", "ts", "event_type"]
    stream = replay.events_stream(spark, d)
    got, _ = replay.run_stream(
        pat.match_stream(stream.select(*sel)), "append", "s_any_nfa")
    events = catalog.load_table(spark, SF_SMOKE, "events").select(*sel)
    flagged = _with_flags(events, pat.states, "user_id", ()).toPandas()
    spec = _spec(pat)
    want = set()
    for uid, pdf in flagged.groupby("user_id"):
        out, _ = _fold_events(
            uid, pdf.sort_values(["ts", "event_id"]), [], spec)
        want |= {(uid, tuple(t[3]), tuple(t[4])) for t in out}
    assert {(r.user_id, tuple(r.labels), tuple(r.ids)) for r in got} == want
    assert len(want) > 0

    # Multi-emission through the stream, crafted: one click then TWO
    # purchases within the horizon, split across micro-batches so the
    # forked branches must JSON-trip through keyed state.
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    cols = "user_id long, event_id long, ts timestamp, event_type string"
    f1 = spark.createDataFrame(
        [(1, 1, base, "click")], cols)
    f2 = spark.createDataFrame(
        [(1, 2, base + dt.timedelta(minutes=5), "purchase"),
         (1, 3, base + dt.timedelta(minutes=10), "purchase")], cols)
    f3 = spark.createDataFrame(
        [(1, 99, base + dt.timedelta(days=30), "__flush__")], cols)
    d2 = str(tmp_path / "replay_any_crafted")
    replay.write_replay_frames([f1, f2, f3], d2)
    got2, _ = replay.run_stream(
        pat.match_stream(replay.events_stream(spark, d2)),
        "append", "s_any_crafted")
    pairs = sorted((tuple(r.ids)) for r in got2)
    assert pairs == [(1, 2), (1, 3)]  # BOTH pairs emitted for one click
