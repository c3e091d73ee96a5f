"""Property-based tests (hypothesis) for the hand-built operators.

The reference has no systematic property-based testing (SURVEY.md §6.1
— serializer matrices only); these go beyond it: randomized inputs vs
pure-python reference implementations.  ``derandomize=True`` keeps CI
deterministic; examples are kept small because each case is a Spark job.
"""

import bisect

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_1_11_1_spark.operators import cdc, joins, rank

SMALL = settings(derandomize=True, max_examples=12, deadline=None)

_keys = st.integers(min_value=0, max_value=3)
_times = st.integers(min_value=0, max_value=50)


@SMALL
@given(
    st.lists(
        st.tuples(_keys, st.sampled_from(["+I", "+U", "-D"]), st.integers(0, 99)),
        min_size=1,
        max_size=25,
    )
)
def test_materialize_equals_python_fold(spark, changelog_rows):
    rows = [
        (seq, k, kind, val) for seq, (k, kind, val) in enumerate(changelog_rows)
    ]
    df = spark.createDataFrame(rows, ["seq", "k", "row_kind", "val"])
    got = {
        (r.k): r.val
        for r in cdc.materialize(df, keys=["k"], seq_col="seq").collect()
    }
    ref: dict[int, int] = {}
    for _seq, k, kind, val in rows:
        ref[k] = (kind, val)
    want = {k: v for k, (kind, v) in ref.items() if kind in ("+I", "+U")}
    assert got == want


@SMALL
@given(
    st.lists(st.tuples(_keys, _times), min_size=1, max_size=15),
    st.lists(st.tuples(_keys, _times, st.integers(0, 9)), min_size=0, max_size=15),
)
def test_asof_join_equals_bisect_reference(spark, left_rows, right_rows):
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)], ["lid", "k", "t"]
    )
    right = spark.createDataFrame(
        [(k, t, v) for k, t, v in right_rows] or [(99, -1, 0)], ["k", "rt", "v"]
    )
    got = {
        r.lid: r.v
        for r in joins.asof_join(
            left, right, on=["k"], left_time="t", right_time="rt",
            right_cols=["v"], tie_break=["v"],
        ).collect()
    }
    # python reference: per key, sorted (rt, v); match = last with rt <= t
    by_key: dict[int, list] = {}
    rr = right_rows or [(99, -1, 0)]
    for k, t, v in sorted(rr, key=lambda r: (r[1], r[2])):
        by_key.setdefault(k, []).append((t, v))
    want = {}
    for i, (k, t) in enumerate(left_rows):
        cands = by_key.get(k, [])
        pos = bisect.bisect_right([c[0] for c in cands], t)
        want[i] = cands[pos - 1][1] if pos else None
    assert got == want


@SMALL
@given(
    st.lists(st.tuples(_keys, st.integers(0, 99), st.integers(0, 99)), min_size=1, max_size=30),
    st.integers(min_value=1, max_value=4),
)
def test_top_n_equals_python_sort(spark, rows, n):
    df = spark.createDataFrame(
        [(i, k, a, b) for i, (k, a, b) in enumerate(rows)], ["rid", "k", "a", "b"]
    )
    from pyspark.sql import functions as F

    got = {
        (r.k, r.rn): r.rid
        for r in rank.top_n(
            df, ["k"], [F.col("a").desc(), F.col("b"), F.col("rid")], n
        ).collect()
    }
    by_key: dict[int, list] = {}
    for i, (k, a, b) in enumerate(rows):
        by_key.setdefault(k, []).append((-a, b, i))
    want = {}
    for k, items in by_key.items():
        for rn, (_, _, rid) in enumerate(sorted(items)[:n], start=1):
            want[(k, rn)] = rid
    assert got == want


# ------------------- round-5-late curation operators vs pure python


@SMALL
@given(
    st.lists(
        st.tuples(
            st.integers(0, 4),          # user
            st.integers(0, 300),        # minutes offset
        ),
        min_size=1,
        max_size=30,
    )
)
def test_sessionize_equals_python_gaps(spark, rows):
    from flink_1_11_1_spark.extensions.curation import sessionize
    from pyspark.sql import functions as F

    base = 1_700_000_000_000
    data = [
        (i, u, base + m * 60_000) for i, (u, m) in enumerate(rows)
    ]
    ev = spark.createDataFrame(
        data, "event_id long, user_id long, tms long"
    ).select("event_id", "user_id", F.timestamp_millis("tms").alias("ts"))
    got = {
        (r.user_id, r.session_id): (r.n_events, r.start_ms, r.end_ms)
        for r in sessionize(ev).collect()
    }
    # python reference: sort per user by (ms, event_id), split on >30min
    per_user: dict = {}
    for i, u, ms in data:
        per_user.setdefault(u, []).append((ms, i))
    want = {}
    for u, evs in per_user.items():
        evs.sort()
        sid, cur = 0, []
        for ms, i in evs:
            if not cur or ms - cur[-1][0] > 30 * 60_000:
                if cur:
                    want[(u, sid)] = (len(cur), cur[0][0], cur[-1][0])
                sid += 1
                cur = []
            cur.append((ms, i))
        want[(u, sid)] = (len(cur), cur[0][0], cur[-1][0])
    assert got == want


@SMALL
@given(
    st.lists(st.integers(1, 40), min_size=1, max_size=20),
    st.integers(20, 120),
)
def test_token_quota_equals_python_prefix(spark, sizes, budget):
    from flink_1_11_1_spark.extensions.curation import token_quota

    rows = [
        (i, "xx", sz, " ".join(["w"] * sz)) for i, sz in enumerate(sizes)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long, text string"
    )
    out = token_quota(docs, budget=budget).collect()
    # python reference: (n_chars desc, doc_id), cumulative <= budget
    order = sorted(range(len(sizes)), key=lambda i: (-sizes[i], i))
    acc, kept = 0, []
    for i in order:
        acc += sizes[i]
        if acc <= budget:
            kept.append(i)
        else:
            break  # window cumsum: once over budget, all later rows are too
    if not kept:
        assert out == []
    else:
        assert out[0].n_docs == len(kept)
        assert out[0].n_tokens == sum(sizes[i] for i in kept)


@SMALL
@given(st.lists(st.text(alphabet="ab", min_size=1, max_size=5), min_size=1, max_size=12))
def test_bpe_merges_equal_python_counts(spark, words):
    from collections import Counter

    from flink_1_11_1_spark.extensions.text import bpe_merge_candidates

    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    got = {r.pair: r.cnt for r in bpe_merge_candidates(docs, k=100).collect()}
    want = Counter()
    for w in words:
        for i in range(len(w) - 1):
            want[w[i : i + 2]] += 1
    assert got == dict(want)


@SMALL
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=16,
        unique=True,
    ),
    st.integers(1, 3),
)
def test_pagerank_integer_mass_and_floor(spark, edge_list, iters):
    from flink_1_11_1_spark.operators.iterate import PR_SCALE, pagerank_integer

    edges = spark.createDataFrame(edge_list, "src long, dst long")
    out = {r.node: r.rank for r in pagerank_integer(edges, iterations=iters).collect()}
    n = len({v for e in edge_list for v in e})
    base = (15 * (PR_SCALE // n)) // 100
    # every node keeps at least the damping floor; total mass never
    # exceeds the scale (integer division only drops remainders)
    assert all(r >= base for r in out.values())
    assert sum(out.values()) <= PR_SCALE
    assert len(out) == n
