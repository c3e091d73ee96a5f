"""Semantic unit tests for the curation battery (extensions/curation.py).

The cross-engine oracle equality of every entry is covered by
test_extension_oracles.py; these tests check the *semantics* on planted
inputs — contamination actually fires on an eval-set near-copy, PII is
redacted the way python `re` would, quality rules cut the right docs,
k-means separates planted blobs, session gaps split where they should,
and the token quota is never exceeded.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from flink_1_11_1_spark.extensions.curation import (
    EMAIL_RE,
    IP_RE,
    PHONE_RE,
    decontaminate,
    kmeans_assign,
    pii_redact,
    quality_rules,
    sessionize,
    token_quota,
)
from flink_1_11_1_spark.extensions.pipeline import _SPARK_BUCKET


def _eval_ids(spark, ids, pct=5):
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = df.where(F.expr(_SPARK_BUCKET.format(salt="eval")) < pct).collect()
    return {r.doc_id for r in rows}


def test_decontaminate_flags_eval_near_copy(spark):
    ids = list(range(200))
    ev = _eval_ids(spark, ids)
    assert ev, "no id of 0..199 landed in the 5% eval bucket"
    eval_id = min(ev)
    train = sorted(set(ids) - ev)
    copy_id, clean_id = train[0], train[1]
    shared = " ".join(f"tok{i}" for i in range(12))
    rows = [(eval_id, shared)]
    rows.append((copy_id, shared))  # full 5-gram overlap with the eval doc
    rows.append((clean_id, " ".join(f"other{i}" for i in range(12))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in decontaminate(docs).collect()}
    assert eval_id not in out  # eval docs are not scored
    assert out[copy_id].contaminated == 1 and out[copy_id].n_hits == out[copy_id].n_grams
    assert out[clean_id].contaminated == 0 and out[clean_id].n_hits == 0


def test_pii_redact_matches_python_re(spark):
    text = (
        "write to alice.smith+x@corp.example.org or bob@ex.io, "
        "call 555-0199, host 192.168.1.4 end"
    )
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = pii_redact(docs).collect()[0]
    assert (row.n_emails, row.n_phones, row.n_ips) == (2, 1, 1)
    expected = re.sub(EMAIL_RE, "<EMAIL>", text)
    expected = re.sub(PHONE_RE, "<PHONE>", expected)
    expected = re.sub(IP_RE, "<IP>", expected)
    assert "<EMAIL>" in expected and "<IP>" in expected
    assert row.fp == hashlib.md5(expected.encode()).hexdigest()


def test_quality_rules_cut_the_right_docs(spark):
    good = " ".join(f"word{i}" for i in range(20))
    short = "tiny doc"
    spam = " ".join(["buy"] * 20)  # top-token fraction 1.0, dup bigrams
    thin = " ".join(["a"] * 9 + ["bb"] * 6)  # mean word length 1.4 < 3
    docs = spark.createDataFrame(
        [(1, good), (2, short), (3, spam), (4, thin)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in quality_rules(docs).collect()}
    assert out[1].keep == 1
    assert out[2].keep == 0  # n_tokens < 10
    assert out[3].keep == 0  # repetition rules
    assert out[4].keep == 0  # mean word length
    assert out[3].top_cnt == 20 and out[3].n_bigrams == 1
    assert out[1].n_tokens == 20 and out[1].n_bigrams == 19


def test_kmeans_separates_planted_blobs(spark):
    # two tight blobs far apart; k=2 must put each blob in one cluster
    rows = []
    for i in range(10):
        rows.append((i, [10.0 + 0.001 * i] * 64))
        rows.append((100 + i, [-10.0 - 0.001 * i] * 64))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_assign(emb, k=2, iters=2).collect()
    by_blob = {0: set(), 1: set()}
    for r in out:
        by_blob[0 if r.vec_id < 100 else 1].add(r.cluster)
    assert len(by_blob[0]) == 1 and len(by_blob[1]) == 1
    assert by_blob[0] != by_blob[1]


def test_sessionize_splits_on_gap(spark):
    base = 1_700_000_000_000
    rows = [
        (1, 10, base),
        (2, 10, base + 10 * 60 * 1000),   # +10 min: same session
        (3, 10, base + 55 * 60 * 1000),   # +45 min after prev: new session
        (4, 20, base),                     # other user: own session
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, tms long").select(
        "event_id", "user_id", F.timestamp_millis("tms").alias("ts")
    )
    out = {(r.user_id, r.session_id): r for r in sessionize(ev).collect()}
    assert out[(10, 1)].n_events == 2
    assert out[(10, 1)].dur_ms == 10 * 60 * 1000
    assert out[(10, 2)].n_events == 1 and out[(10, 2)].dur_ms == 0
    assert out[(20, 1)].n_events == 1


def test_token_quota_never_exceeds_budget(spark):
    rows = [(i, "en", 100 * (i + 1), " ".join(["w"] * (10 * (i + 1)))) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long, text string")
    out = token_quota(docs, budget=150).collect()
    assert len(out) == 1
    row = out[0]
    assert row.n_tokens <= 150
    # largest-first: doc 9 (100 tokens) then doc 8 (90 tokens) would bust
    # 150, so exactly one doc survives
    assert row.n_docs == 1 and row.n_tokens == 100


def test_semdedup_finds_planted_cluster_dup(spark):
    from flink_1_11_1_spark.extensions.dedup import semdedup_pairs

    # 20 spread vectors + one near-identical pair: the pair must appear
    rows = []
    for i in range(20):
        v = [0.0] * 64
        v[i % 64] = 5.0 + i
        rows.append((i, v))
    dup = [1.0] * 64
    rows.append((100, dup))
    rows.append((101, [x * 1.001 for x in dup]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semdedup_pairs(emb, threshold=0.95).collect()
    assert any(r.da == 100 and r.db == 101 for r in out)
    # and every reported pair is genuinely above threshold
    assert all(r.c >= 0.95 for r in out)


def test_substring_dedup_counts_copied_spans(spark):
    from flink_1_11_1_spark.extensions.dedup import substring_dedup_stats

    base = " ".join(f"tok{i}" for i in range(12))  # 8 5-gram spans
    docs = spark.createDataFrame(
        [
            (1, base),                                    # owner of all spans
            (2, base),                                    # full copy: all owned elsewhere
            (3, " ".join(f"zz{i}" for i in range(12))),   # unique
            (4, "a b c d"),                               # too short: no spans
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in substring_dedup_stats(docs).collect()}
    assert out[1].n_dup == 0 and out[1].clean == 1
    assert out[2].n_dup == out[2].n_grams == 8 and out[2].clean == 0
    assert out[3].n_dup == 0 and out[3].clean == 1
    assert 4 not in out  # below n tokens: no occurrences to account


def test_bpe_merge_candidates_count_char_pairs(spark):
    from flink_1_11_1_spark.extensions.text import bpe_merge_candidates

    docs = spark.createDataFrame(
        [(1, "abab cd"), (2, "ab x")], "doc_id long, text string"
    )
    out = {r.pair: r.cnt for r in bpe_merge_candidates(docs, k=10).collect()}
    # 'abab' -> ab, ba, ab ; 'cd' -> cd ; 'ab' -> ab ; 'x' too short
    assert out == {"ab": 3, "ba": 1, "cd": 1}


def test_rrf_fusion_ranks_and_math(spark):
    from flink_1_11_1_spark.extensions.retrieval import rrf_fusion

    # doc 1 contains both query terms (lex rank 1); embedding 1 equals
    # the query vector (sem rank 1, tie-broken after the query itself)
    docs = spark.createDataFrame(
        [(1, "join vector join"), (2, "join other"), (3, "nothing here")],
        "doc_id long, text string",
    )
    base = [0.5] * 64
    tilted = [0.5] * 64
    tilted[0] = 0.6  # same-ish direction, strictly below cosine 1.0
    emb = spark.createDataFrame(
        [
            (1, base),
            (2, tilted),
            (7, base),  # the designated query vector
            (3, [(-1.0) ** i * 0.5 for i in range(64)]),  # orthogonal-ish
        ],
        "vec_id long, embedding array<float>",
    )
    rows = rrf_fusion(docs, emb).collect()
    top = rows[0]
    # cosine 1.0 ties (ids 1 and 7) break by vec_id: sem ranks 1, 2;
    # id 1 also holds lex rank 1 -> highest fusion score
    by_id = {r.id: r for r in rows}
    assert by_id[1].lex_rank == 1 and by_id[1].sem_rank == 1
    assert by_id[7].sem_rank == 2 and by_id[7].lex_rank is None
    assert by_id[2].sem_rank == 3  # tilted: below the exact matches
    expected = round(1.0 / 61 + 1.0 / 61, 6)
    assert abs(by_id[1].rrf - expected) < 1e-9
    assert top.id == 1


def test_incremental_dedup_skips_index_index_pairs(spark):
    from pyspark.sql import functions as F

    from flink_1_11_1_spark.extensions.dedup import incremental_dedup_pairs
    from flink_1_11_1_spark.extensions.pipeline import _SPARK_BUCKET

    ids = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    flags = {
        r.doc_id: r.new
        for r in ids.select(
            "doc_id", (F.expr(_SPARK_BUCKET.format(salt="ingest")) < 20).alias("new")
        ).collect()
    }
    new_ids = sorted(i for i, f in flags.items() if f)
    old_ids = sorted(i for i, f in flags.items() if not f)
    assert len(new_ids) >= 2 and len(old_ids) >= 3
    text_a = " ".join(f"tok{i}" for i in range(12))
    text_b = " ".join(f"alt{i}" for i in range(12))
    rows = [
        (old_ids[0], text_a),   # indexed original
        (new_ids[0], text_a),   # new copy of indexed -> new-index pair
        (old_ids[1], text_b),   # two indexed dups: must NOT be reported
        (old_ids[2], text_b),
        (new_ids[1], " ".join(f"zz{i}" for i in range(12))),  # unique new
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = incremental_dedup_pairs(docs).collect()
    got = {(r.da, r.db): r.kind for r in out}
    pair = (min(old_ids[0], new_ids[0]), max(old_ids[0], new_ids[0]))
    assert got.get(pair) == "new-index"
    assert (old_ids[1], old_ids[2]) not in got  # index-vs-index suppressed
    assert len(got) == 1


def test_triangle_enumeration_planted(spark):
    from flink_1_11_1_spark.operators.iterate import triangle_enumeration

    # triangles (1,2,3) and (1,2,4) — the (2,4) chord closes the second;
    # (4,5) leaves only an open wedge
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 4), (4, 5), (2, 4)], "src long, dst long"
    )
    tri = {(r.a, r.b, r.c) for r in triangle_enumeration(edges).collect()}
    assert tri == {(1, 2, 3), (1, 2, 4)}


def test_sessionize_dynamic_gap(spark):
    from flink_1_11_1_spark.extensions.curation import sessionize

    base = 1_700_000_000_000
    rows = [
        (1, 10, base),                      # opens a 60-min window
        (2, 10, base + 45 * 60 * 1000),     # 45min later: inside event 1's gap
        (3, 10, base + 60 * 60 * 1000),     # 15min after event 2 (10-min gap): split
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, tms long").select(
        "event_id", "user_id", F.timestamp_millis("tms").alias("ts")
    )
    out = {
        (r.user_id, r.session_id): r.n_events
        for r in sessionize(
            ev,
            gap_expr="CASE WHEN event_id = 1 THEN 3600000 ELSE 600000 END",
        ).collect()
    }
    assert out == {(10, 1): 2, (10, 2): 1}
    # static path unchanged: 45-min gap splits under the 30-min default
    static = {
        (r.user_id, r.session_id): r.n_events for r in sessionize(ev).collect()
    }
    assert static == {(10, 1): 1, (10, 2): 2}


def test_pagerank_integer_star_graph(spark):
    from flink_1_11_1_spark.operators.iterate import PR_SCALE, pagerank_integer

    # star: 1,2,3 all point at 0 -> 0 accumulates the mass
    edges = spark.createDataFrame([(1, 0), (2, 0), (3, 0)], "src long, dst long")
    out = {r.node: r.rank for r in pagerank_integer(edges, iterations=1).collect()}
    init = PR_SCALE // 4
    base = (15 * init) // 100
    assert out[0] == base + (85 * 3 * init) // 100
    assert out[1] == out[2] == out[3] == base
    # mass never exceeds the scale (leaks only through dangling node 0)
    assert sum(out.values()) <= PR_SCALE
