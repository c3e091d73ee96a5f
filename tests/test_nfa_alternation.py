"""PATTERN alternation ``(A | B)`` and ``Pattern.until()`` (round 8).

Reference parity: the SQL:2016/Calcite MATCH_RECOGNIZE pattern grammar
(alternation inside PATTERN — Flink's parser accepts it via Calcite,
exercised by flink-table-planner MatchRecognizeITCase) and flink-cep
pattern/Pattern.java ``until()`` (stop condition on oneOrMore).

The regex-oracle differential band lives in test_nfa_backtrack_fuzz
(24 seeded alternation shapes vs Python ``re``); these are the
deterministic-path and API-contract cases.
"""

from __future__ import annotations

import datetime as dt

import pytest

from flink_1_11_1_spark.streaming import nfa
from flink_1_11_1_spark.streaming.nfa_lowering import eligible_tier


def _events(spark, rows):
    """rows: (event_id, seconds-offset, type[, value])."""
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (1, eid, base + dt.timedelta(seconds=s), t,
             float(r[3]) if len(r) > 3 else 0.0)
            for r in rows
            for eid, s, t in [r[:3]]
        ],
        "user_id long, event_id long, ts timestamp, event_type string, "
        "value double",
    )


def _matches(df):
    return [
        (list(r.ids), list(r.labels))
        for r in df.orderBy("start_ts", "end_ts").collect()
    ]


def test_alternation_labels_matched_alternative(spark):
    pat = (
        nfa.PatternSeq.begin("A", "event_type = 'click'")
        .next_("B", "event_type = 'view'")
        .alt("C", "event_type = 'cart'")
        .next_("D", "event_type = 'purchase'")
        .after_match_skip("past_last")
        .within("1 hour")
    )
    ev = _events(
        spark,
        [(1, 0, "click"), (2, 1, "view"), (3, 2, "purchase"),
         (4, 10, "click"), (5, 11, "cart"), (6, 12, "purchase"),
         (7, 20, "click"), (8, 21, "signup"), (9, 22, "purchase")],
    )
    assert _matches(pat.match_batch(ev)) == [
        ([1, 2, 3], ["A", "B", "D"]),
        ([4, 5, 6], ["A", "C", "D"]),
    ]


def test_alternation_quantified_group_mixes_labels(spark):
    """(B | C)+ collects a run of either alternative, labeled per
    event."""
    pat = (
        nfa.PatternSeq.begin("A", "event_type = 'click'")
        .next_("B", "event_type = 'view'")
        .alt("C", "event_type = 'cart'")
        .one_or_more()
        .consecutive()
        .next_("D", "event_type = 'purchase'")
        .after_match_skip("past_last")
        .within("1 hour")
    )
    ev = _events(
        spark,
        [(1, 0, "click"), (2, 1, "view"), (3, 2, "cart"), (4, 3, "view"),
         (5, 4, "purchase")],
    )
    assert _matches(pat.match_batch(ev)) == [
        ([1, 2, 3, 4, 5], ["A", "B", "C", "B", "D"]),
    ]


def test_alternation_leftmost_preference_on_overlap(spark):
    """An event matching BOTH alternatives labels as the first (regex
    ``|`` order) — under backtracking, the greediest deck wins."""
    pat = (
        nfa.PatternSeq.begin("A", "value >= 1")
        .alt("B", "value >= 0")
        .after_match_skip("to_next")
        .within("1 hour")
        .with_backtracking()
    )
    ev = _events(spark, [(1, 0, "x", 2), (2, 1, "x", 0)])
    assert _matches(pat.match_batch(ev)) == [
        ([1], ["A"]),  # value 2 matches both -> A preferred
        ([2], ["B"]),  # value 0 matches only B
    ]


def test_alternation_duplicate_variable_rejected():
    with pytest.raises(ValueError, match="duplicate"):
        (nfa.PatternSeq.begin("A", "true").alt("A", "true"))


def test_alternation_lowering_eligibility():
    """Row-local alternation lowers (tier A, OR span + CASE labels,
    round 8); cross-variable alternatives stay fold-only."""
    pat = (
        nfa.PatternSeq.begin("A", "event_type = 'click'")
        .next_("B", "event_type = 'view'")
        .alt("C", "event_type = 'cart'")
    )
    # past_last no-overlap proof checks every alternative's literals:
    # click contradicts view AND cart -> lowerable
    assert eligible_tier(pat.states, 3600, "past_last") == "A"
    assert eligible_tier(pat.states, 3600, "to_next") == "A"
    xpat = (
        nfa.PatternSeq.begin("A", "event_type = 'click'")
        .next_("B", "true")
        .alt("C", "true", 'EV["value"] > LAST("A","value")', "value")
    )
    assert eligible_tier(xpat.states, 3600, "to_next") is None
    # overlapping-alternative past_last: proof must FAIL when an
    # alternative can collide with the start state
    opat = (
        nfa.PatternSeq.begin("A", "event_type = 'click'")
        .next_("B", "event_type = 'view'")
        .alt("C", "value >= 0")  # no literal -> could be a click
    )
    assert eligible_tier(opat.states, 3600, "past_last") is None
    assert eligible_tier(opat.states, 3600, "to_next") == "A"


def test_until_freezes_loop_without_consuming(spark):
    """Without until, V+ swallows the stop event; with until the run
    freezes at it and the partial still advances on a later P."""
    base = (
        nfa.PatternSeq.begin("V", "event_type <> 'purchase'")
        .one_or_more()
        .followed_by("P", "event_type = 'purchase'")
        .after_match_skip("past_last")
        .within("1 hour")
    )
    ev = _events(
        spark,
        [(1, 0, "view"), (2, 1, "signup"), (3, 2, "view"),
         (4, 3, "purchase")],
    )
    # plain V+: the signup is consumed into the run
    assert _matches(base.match_batch(ev)) == [
        ([1, 2, 3, 4], ["V", "V", "V", "P"]),
    ]
    # until('signup'): the run freezes BEFORE consuming event 2; the
    # partial (cnt 1 >= min) survives and completes on the purchase
    stopped = (
        nfa.PatternSeq.begin("V", "event_type <> 'purchase'")
        .one_or_more()
        .until("event_type = 'signup'")
        .followed_by("P", "event_type = 'purchase'")
        .after_match_skip("past_last")
        .within("1 hour")
    )
    assert _matches(stopped.match_batch(ev)) == [
        ([1, 4], ["V", "P"]),
    ]


def test_until_below_min_kills_partial(spark):
    pat = (
        nfa.PatternSeq.begin("V", "event_type = 'view'")
        .times_or_more(3)
        .until("event_type = 'signup'")
        .followed_by("P", "event_type = 'purchase'")
        .after_match_skip("past_last")
        .within("1 hour")
    )
    ev = _events(
        spark,
        [(1, 0, "view"), (2, 1, "view"), (3, 2, "signup"),
         (4, 3, "view"), (5, 4, "purchase")],
    )
    # run frozen at cnt 2 < min 3 -> dead; no 3-view run exists after
    assert _matches(pat.match_batch(ev)) == []


def test_until_stop_event_can_advance_same_event(spark):
    """The until event is not consumed into the loop but may itself
    match the NEXT state (Flink: the stop event is still processed)."""
    pat = (
        nfa.PatternSeq.begin("V", "event_type <> 'x'")
        .one_or_more()
        .until("event_type = 'purchase'")
        .followed_by("P", "event_type = 'purchase'")
        .after_match_skip("past_last")
        .within("1 hour")
    )
    ev = _events(spark, [(1, 0, "view"), (2, 1, "view"), (3, 2, "purchase")])
    # without until, V+ (<> x) would swallow the purchase into the run
    # and never complete; the stop condition freezes the loop and the
    # same event advances to P
    assert _matches(pat.match_batch(ev)) == [
        ([1, 2, 3], ["V", "V", "P"]),
    ]


def test_until_requires_unbounded_quantifier():
    with pytest.raises(ValueError, match="unbounded"):
        nfa.PatternSeq.begin("A", "true").times(2).until("false")
    pat = nfa.PatternSeq.begin("A", "true").one_or_more().until("false")
    assert eligible_tier(pat.states, 3600, "no_skip") is None


def test_until_backtracking_mode(spark):
    """until composes with the branching fold: the frozen loop stops
    forking extends but pending alternatives still resolve."""
    pat = (
        nfa.PatternSeq.begin("V", "value >= 0")
        .one_or_more()
        .consecutive()
        .until("event_type = 'stop'")
        .next_("P", "value >= 10")
        .after_match_skip("past_last")
        .within("1 hour")
        .with_backtracking()
    )
    ev = _events(
        spark,
        [(1, 0, "a", 1), (2, 1, "a", 2), (3, 2, "stop", 11)],
    )
    # events 1,2 extend V (values ambiguous: 11 also matches V!);
    # event 3 freezes the loop, then advances as P
    assert _matches(pat.match_batch(ev)) == [
        ([1, 2, 3], ["V", "V", "P"]),
    ]


# ---------------- MR SQL front door ----------------------------------


def _mr(spark, sql, ev):
    from flink_1_11_1_spark.extensions.match_recognize import match_recognize

    return match_recognize(spark, sql, events=ev)


def test_mr_pattern_alternation_one_row(spark):
    ev = _events(
        spark,
        [(1, 0, "click"), (2, 1, "view"), (3, 2, "purchase"),
         (4, 10, "click"), (5, 11, "cart"), (6, 12, "purchase")],
    )
    sql = """
    SELECT * FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id
      ORDER BY ts, event_id
      MEASURES FIRST(A.event_id) AS a_id, LAST(D.event_id) AS d_id
      ONE ROW PER MATCH
      AFTER MATCH SKIP PAST LAST ROW
      PATTERN (A (B | C) D)
      DEFINE A AS A.event_type = 'click', B AS B.event_type = 'view',
             C AS C.event_type = 'cart', D AS D.event_type = 'purchase'
    )
    """
    rows = _mr(spark, sql, ev).orderBy("a_id").collect()
    assert [(r.a_id, r.d_id) for r in rows] == [(1, 3), (4, 6)]


def test_mr_pattern_alternation_classifier(spark):
    ev = _events(
        spark,
        [(1, 0, "click"), (2, 1, "cart"), (3, 2, "purchase")],
    )
    sql = """
    SELECT * FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id
      ORDER BY ts, event_id
      MEASURES FIRST(A.event_id) AS a_id
      ALL ROWS PER MATCH
      AFTER MATCH SKIP PAST LAST ROW
      PATTERN (A (B | C) D)
      DEFINE A AS A.event_type = 'click', B AS B.event_type = 'view',
             C AS C.event_type = 'cart', D AS D.event_type = 'purchase'
    )
    """
    rows = _mr(spark, sql, ev).orderBy("event_id").collect()
    assert [(r.event_id, r.classifier) for r in rows] == [
        (1, "A"), (2, "C"), (3, "D")
    ]


def test_mr_alternation_overlapping_defines_auto_backtracks(spark):
    """Non-disjoint alternatives force the branching fold; leftmost
    alternative wins on an ambiguous event."""
    ev = _events(spark, [(1, 0, "x", 5), (2, 1, "x", 1)])
    sql = """
    SELECT * FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id
      ORDER BY ts, event_id
      MEASURES LAST(HI.event_id) AS hi_id, LAST(LO.event_id) AS lo_id
      ONE ROW PER MATCH
      AFTER MATCH SKIP TO NEXT ROW
      PATTERN ((HI | LO))
      DEFINE HI AS HI.value >= 2, LO AS LO.value >= 0
    )
    """
    rows = _mr(spark, sql, ev).orderBy("user_id").collect()
    got = sorted(
        ((r.hi_id, r.lo_id) for r in rows),
        key=lambda t: (t[0] is None, t),
    )
    assert got == [(1, None), (None, 2)]


def test_mr_alternation_measures_on_alternative(spark):
    """Aggregates over one alternative count only its rows."""
    ev = _events(
        spark,
        [(1, 0, "click"), (2, 1, "view"), (3, 2, "cart"), (4, 3, "view"),
         (5, 4, "purchase")],
    )
    sql = """
    SELECT * FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id
      ORDER BY ts, event_id
      MEASURES COUNT(B.*) AS n_views, COUNT(C.*) AS n_carts,
               LAST(D.event_id) AS d_id
      ONE ROW PER MATCH
      AFTER MATCH SKIP PAST LAST ROW
      PATTERN (A (B | C)+ D)
      DEFINE A AS A.event_type = 'click', B AS B.event_type = 'view',
             C AS C.event_type = 'cart', D AS D.event_type = 'purchase'
    )
    """
    rows = _mr(spark, sql, ev).collect()
    assert [(r.n_views, r.n_carts, r.d_id) for r in rows] == [(2, 1, 5)]


def test_mr_group_single_alternative_rejected(spark):
    ev = _events(spark, [(1, 0, "click")])
    sql = """
    SELECT * FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id
      ORDER BY ts, event_id
      MEASURES LAST(A.event_id) AS a_id
      ONE ROW PER MATCH
      PATTERN ((A))
      DEFINE A AS A.event_type = 'click'
    )
    """
    with pytest.raises(ValueError, match=">= 2"):
        _mr(spark, sql, ev)


def test_where_or_subtype_compose(spark):
    """Pattern.where/or_/subtype compose row-local conditions on the
    last added state (flink-cep Pattern.java #where/#or/#subtype)."""
    p = (
        nfa.PatternSeq.begin("A", "event_type = 'click'")
        .where("value >= 2")
        .or_("value >= 100")
        .followed_by("B", "true")
        .subtype("event_type = 'purchase'")
        .after_match_skip("past_last")
        .within("1 hour")
    )
    ev = _events(
        spark,
        [(1, 0, "click", 1), (2, 1, "click", 3), (3, 2, "purchase", 0),
         (4, 10, "view", 200), (5, 11, "purchase", 0)],
    )
    # event 1 fails where (1 < 2, not >= 100); event 2 passes the AND
    # leg; event 4 passes the OR leg (value >= 100, any type); B only
    # takes purchases (subtype narrows 'true')
    assert _matches(p.match_batch(ev)) == [
        ([2, 3], ["A", "B"]),
        ([4, 5], ["A", "B"]),
    ]


def test_alternation_stream_equals_unfinalized_fold(spark, tmp_path):
    """Round-8 algebra through the REAL streaming backend
    (applyInPandasWithState): alternation labels survive the JSON
    state round-trip across micro-batches; reference = the
    unfinalized shared fold over the full data."""
    from flink_1_11_1_spark import catalog
    from flink_1_11_1_spark.streaming import replay
    from flink_1_11_1_spark.streaming.nfa import (
        _fold_events, _spec, _with_flags)
    from .conftest import SF_SMOKE

    d = str(tmp_path / "replay_alt")
    replay.write_replay(spark, SF_SMOKE, d, parts=5)
    pat = (
        nfa.PatternSeq.begin("A", "event_type = 'click'")
        .followed_by("M", "event_type = 'view'")
        .alt("E", "event_type = 'error'")
        .followed_by("P", "event_type = 'purchase'")
        .within("24 hours")
    )
    sel = ["user_id", "event_id", "ts", "event_type"]
    stream = replay.events_stream(spark, d)
    got, _ = replay.run_stream(
        pat.match_stream(stream.select(*sel)), "append", "s_alt_nfa")
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
    # both alternatives genuinely occur in the matched data
    mids = {labs[1] for _, labs, _ in want}
    assert mids == {"M", "E"}
