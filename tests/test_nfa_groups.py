"""Group patterns — Flink ``Pattern.begin(Pattern)`` /
``followedBy(Pattern)`` / ``next(Pattern)`` (pattern/GroupPattern.java):
a contiguous sub-sequence quantified as one unit, implemented as
loop-back edges from the group's last state to its first.

Hand fixtures for the API contract and label correctness, plus a
seeded regex-oracle differential band (strict contiguity → regex
semantics; spans compared, since labels inside a repeated
non-capturing group are not recoverable from ``re``)."""

from __future__ import annotations

import datetime as dt
import random
import re

import pytest

from flink_1_11_1_spark.streaming import nfa
from flink_1_11_1_spark.streaming.nfa import PatternSeq, State


def _events(spark, types):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(1, i + 1, base + dt.timedelta(seconds=i + 1), t)
         for i, t in enumerate(types)],
        "user_id long, event_id long, ts timestamp, event_type string",
    )


def _matches(df):
    return [
        (list(r.ids), list(r.labels))
        for r in df.orderBy("start_ts", "end_ts").collect()
    ]


def _sub():
    return (nfa.PatternSeq.begin("A", "event_type = 'a'")
            .next_("B", "event_type = 'b'"))


def test_group_times_exact(spark):
    p = (nfa.PatternSeq.begin_group(_sub()).times(2)
         .next_("C", "event_type = 'c'")
         .after_match_skip("past_last").within("1 hour"))
    ev = _events(spark, ["a", "b", "a", "b", "c"])
    assert _matches(p.match_batch(ev)) == [
        ([1, 2, 3, 4, 5], ["A", "B", "A", "B", "C"])
    ]
    # a single loop does not reach the count
    assert p.match_batch(_events(spark, ["a", "b", "c"])).count() == 0


def test_group_one_or_more_greedy(spark):
    p = (nfa.PatternSeq.begin_group(_sub()).one_or_more()
         .followed_by("C", "event_type = 'c'")
         .after_match_skip("past_last").within("1 hour"))
    ev = _events(spark, ["a", "b", "a", "b", "c"])
    assert _matches(p.match_batch(ev)) == [
        ([1, 2, 3, 4, 5], ["A", "B", "A", "B", "C"])
    ]


def test_group_final_and_skip_resume(spark):
    p = (nfa.PatternSeq.begin_group(_sub()).times(2)
         .after_match_skip("past_last").within("1 hour"))
    ev = _events(spark, ["a", "b", "a", "b", "a", "b", "a", "b"])
    assert _matches(p.match_batch(ev)) == [
        ([1, 2, 3, 4], ["A", "B", "A", "B"]),
        ([5, 6, 7, 8], ["A", "B", "A", "B"]),
    ]


def test_group_strict_loop_edge_kills(spark):
    """next_group: an intervening event between repetitions kills the
    partial (strict loop-back edge)."""
    p = (nfa.PatternSeq.begin("S", "event_type = 's'")
         .next_group(_sub()).times(2)
         .after_match_skip("past_last").within("1 hour"))
    assert p.match_batch(
        _events(spark, ["s", "a", "b", "x", "a", "b"])).count() == 0
    assert _matches(p.match_batch(
        _events(spark, ["s", "a", "b", "a", "b"]))) == [
        ([1, 2, 3, 4, 5], ["S", "A", "B", "A", "B"])
    ]


def test_group_relaxed_loop_edge_waits(spark):
    """begin_group / followed_by_group: events between repetitions are
    skipped (relaxed loop-back)."""
    p = (nfa.PatternSeq.begin_group(_sub()).times(2)
         .after_match_skip("past_last").within("1 hour"))
    ev = _events(spark, ["a", "b", "x", "a", "b"])
    assert _matches(p.match_batch(ev)) == [
        ([1, 2, 4, 5], ["A", "B", "A", "B"])
    ]


def test_group_inner_quantifier(spark):
    """Inner state quantifiers compose with the group quantifier:
    (A B{1,2}){2} C.  (A group-final pattern keeps the bounded
    final-state rule, so the variable inner quantifier needs a tail.)"""
    sub = (nfa.PatternSeq.begin("A", "event_type = 'a'")
           .next_("B", "event_type = 'b'").times(1, 2).consecutive())
    p = (nfa.PatternSeq.begin_group(sub).times(2)
         .next_("C", "event_type = 'c'")
         .after_match_skip("past_last").within("1 hour"))
    ev = _events(spark, ["a", "b", "b", "a", "b", "c"])
    assert _matches(p.match_batch(ev)) == [
        ([1, 2, 3, 4, 5, 6], ["A", "B", "B", "A", "B", "C"])
    ]


def test_group_api_validation():
    with pytest.raises(ValueError, match=">= 2 states"):
        nfa.PatternSeq.begin_group(nfa.PatternSeq.begin("A", "true"))
    with pytest.raises(ValueError, match="min_count >= 1"):
        nfa.PatternSeq.begin_group(
            nfa.PatternSeq.begin("A", "true").optional()
            .next_("B", "true"))
    with pytest.raises(ValueError, match="optional groups"):
        nfa.PatternSeq.begin_group(_sub()).optional()
    with pytest.raises(ValueError, match="bounded"):
        (nfa.PatternSeq.begin_group(_sub()).one_or_more())._check()
    with pytest.raises(ValueError, match="with_backtracking"):
        (nfa.PatternSeq.begin_group(_sub()).times(1, 2).reluctant()
         .next_("C", "true"))._check()


def test_group_never_lowers(spark):
    p = (nfa.PatternSeq.begin_group(_sub()).times(2)
         .after_match_skip("past_last").within("1 hour"))
    ev = _events(spark, ["a", "b", "a", "b"])
    plan = p.match_batch(ev)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan  # fold path, not a lowering


# ---------------- regex-oracle differential band ----------------------
#
# Strict-contiguous S? (A B{pm,pn}){gm,gn}[?] C? shapes with random
# (possibly overlapping) classes run under the branching fold; the
# oracle is Python re with a non-capturing group.  Spans (consumed
# event ids) are compared — labels inside a repeated group are not
# recoverable from re's last-iteration captures.

_CLS = "abc"
_GRP_SEEDS = [980_000 + i for i in range(24)]


def _gen_group(rng: random.Random):
    def cls():
        return sorted(rng.sample(_CLS, rng.randint(1, 2)))

    def cond(c):
        return "(" + " OR ".join(f"cls = '{x}'" for x in c) + ")"

    ca, cb = cls(), cls()
    tail = rng.random() < 0.7
    pm, pn = rng.choice([(1, 1), (1, 2), (2, 2)]) if tail \
        else rng.choice([(1, 1), (2, 2)])
    sub = PatternSeq(states=(
        State("A", cond(ca), min_count=1, max_count=1,
              strict_in=True, consecutive=True),
        State("B", cond(cb), min_count=pm, max_count=pn,
              strict_in=True, consecutive=True),
    ))
    gm, gn = rng.choice([(1, 2), (2, 2), (1, 3), (2, 3)])
    ggreedy = rng.random() < 0.7
    if not tail:
        gn = gm = rng.choice([gm, gn])  # final group must be bounded
        ggreedy = True
    pat = PatternSeq.begin_group(sub).times(gm, gn)
    # strict loop-back edge for regex parity
    pat = pat._mod_group(greedy=ggreedy)
    sts = list(pat.states)
    sts[0] = State("A", cond(ca), min_count=1, max_count=1,
                   strict_in=True, consecutive=True)
    pat = pat.__class__(states=tuple(sts), groups=pat.groups,
                        horizon_s=36500 * 86400,
                        skip=rng.choice(["to_next", "past_last"]))
    cc = None
    if tail:
        cc = cls()
        pat = pat.next_("C", cond(cc))
    pat = pat.with_backtracking(max_branches=512)
    rx = (f"(?:[{''.join(ca)}][{''.join(cb)}]{{{pm},{pn}}})"
          f"{{{gm},{gn}}}{'' if ggreedy else '?'}")
    if cc:
        rx += f"[{''.join(cc)}]"
    return pat, re.compile(rx)


def _spans(rx, text, skip):
    out = []
    if skip == "to_next":
        for p in range(len(text)):
            m = rx.match(text, p)
            if m:
                out.append((p, m.end()))
        return out
    p = 0
    while p < len(text):
        m = rx.match(text, p)
        if m:
            out.append((p, m.end()))
            p = m.end()
        else:
            p += 1
    return out


@pytest.mark.parametrize("case", _GRP_SEEDS)
def test_group_matches_regex_oracle(spark, case):
    rng = random.Random(case)
    pat, rx = _gen_group(rng)
    text = "".join(rng.choice(_CLS) for _ in range(rng.randint(8, 14)))
    ev = spark.createDataFrame(
        [(1, i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), ch)
         for i, ch in enumerate(text)],
        "user_id long, event_id long, ts timestamp, cls string")
    want = sorted(_spans(rx, text, pat.skip))
    got = sorted(
        (r.ids[0], r.ids[-1] + 1)
        for r in pat.match_batch(ev, lowering=False).collect())
    assert got == want, (
        f"case={case} text={text!r} rx={rx.pattern} skip={pat.skip}")
    if pat.skip == "to_next":
        # bounded groups may unroll into the native tier-A analogue
        # under to_next — whichever path match_batch picks must agree
        # (shapes with interleaved loop/inner decisions or too many
        # branches legitimately stay on the fold)
        from flink_1_11_1_spark.streaming.nfa_lowering import (
            _groups_lowerable,
        )

        low = pat.match_batch(ev)
        got_low = sorted((r.ids[0], r.ids[-1] + 1) for r in low.collect())
        assert got_low == want, (
            f"lowering: case={case} text={text!r} rx={rx.pattern}")
        if _groups_lowerable(pat.states, pat.groups, pat.skip):
            s0 = pat.states[0]
            nb = sum(
                (pat.states[1].max_count - pat.states[1].min_count + 1)
                ** reps
                for reps in range(pat.groups[0][2], pat.groups[0][3] + 1)
            )
            if nb <= 16:
                plan = low._jdf.queryExecution() \
                    .executedPlan().toString()
                assert "FlatMapGroupsInPandas" not in plan, (
                    f"case={case}: expected native unrolled plan")


def test_mr_sequence_group_grammar(spark):
    """PATTERN ((A B){1,2} C) through the MATCH_RECOGNIZE front door:
    greedy group quantification with strict contiguity (including the
    loop-back edge)."""
    from flink_1_11_1_spark.extensions.match_recognize import match_recognize

    def ev(types):
        base = dt.datetime(2024, 1, 1)
        return spark.createDataFrame(
            [(1, i + 1, base + dt.timedelta(seconds=i + 1), t, 0.0)
             for i, t in enumerate(types)],
            "user_id long, event_id long, ts timestamp, "
            "event_type string, value double")

    sql = """
    SELECT * FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id
      ORDER BY ts, event_id
      MEASURES FIRST(A.event_id) AS a1, COUNT(A.*) AS n_loops,
               LAST(C.event_id) AS c_id
      ONE ROW PER MATCH
      AFTER MATCH SKIP PAST LAST ROW
      PATTERN ((A B){1,2} C)
      DEFINE A AS A.event_type = 'click', B AS B.event_type = 'view',
             C AS C.event_type = 'purchase'
    )
    """
    got = match_recognize(
        spark, sql,
        events=ev(["click", "view", "click", "view", "purchase",
                   "click", "view", "purchase"])).collect()
    assert sorted((r.a1, r.n_loops, r.c_id) for r in got) == [
        (1, 2, 5), (6, 1, 8)
    ]
    # an intervening row between the loops breaks strict contiguity:
    # the greedy 2-loop match is impossible, the 1-loop one survives
    got2 = match_recognize(
        spark, sql,
        events=ev(["click", "view", "x", "click", "view", "purchase"])
    ).collect()
    assert sorted((r.a1, r.n_loops, r.c_id) for r in got2) == [(4, 1, 6)]


def test_group_stream_equals_unfinalized_fold(spark, tmp_path):
    """Group loop-back counters (``gc``) survive the REAL streaming
    backend's JSON state trip across micro-batches; reference = the
    unfinalized shared fold over the full data."""
    from flink_1_11_1_spark import catalog
    from flink_1_11_1_spark.streaming import replay
    from flink_1_11_1_spark.streaming.nfa import (
        _fold_events, _spec, _with_flags)

    from .conftest import SF_SMOKE

    d = str(tmp_path / "replay_grp")
    replay.write_replay(spark, SF_SMOKE, d, parts=5)
    sub = (nfa.PatternSeq.begin("A", "event_type = 'click'")
           .next_("B", "event_type = 'view'"))
    pat = (nfa.PatternSeq.begin_group(sub).times(1, 2)
           .next_("P", "event_type = 'purchase'")
           .within("24 hours").with_backtracking())
    sel = ["user_id", "event_id", "ts", "event_type"]
    stream = replay.events_stream(spark, d)
    got, _ = replay.run_stream(
        pat.match_stream(stream.select(*sel)), "append", "s_grp_nfa")
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
