"""Data-selection ops: DSIR-style importance resampling and unigram
LM surprisal scoring.

Two standard training-data selection primitives (beyond-reference tier,
SURVEY §8.4):

- ``dsir_sample`` — Data Selection via Importance Resampling (Xie et
  al., NeurIPS 2023): reweight corpus documents toward a target domain
  by the ratio of feature likelihoods, then hash-threshold accept.
  Here the target domain is a source allowlist and the feature is the
  document-length bucket; production swaps in hashed n-gram features,
  the plumbing (ratio weights, deterministic acceptance) is identical.
- ``lm_surprisal`` — unigram language-model scoring (the CCNet /
  perplexity-filter shape): per-document mean surprisal under the
  corpus unigram distribution.  True -log2(p) needs ln(), which is not
  cross-engine bit-exact, so the declared rendering uses the *integer*
  bit-length surprisal ``bitlen(total) - bitlen(cnt)`` — a non-negative
  whole-bit approximation within 1 bit of -log2(p) either way, exact on
  both engines via length(bin(x)).
  Integer sums are order-free; the only float op is the final mean
  division.

Cross-engine exactness per CLAUDE.md: integer arithmetic + single IEEE
divisions; acceptance thresholds compare identically-derived doubles,
so the selected sets agree exactly.

Both ops are map-heavy with one bounded aggregation (feature / vocab
histogram) broadcast back — no shuffle proportional to corpus size on
the accept/score path, the 100 TB requirement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import catalog
from . import registry

_TWO_52 = float(1 << 52)

# md5 52-bit uniform fold (same convention as sketch.py / pipeline.py).
_SPARK_U = (
    "cast(conv(substring(md5(cast(doc_id as string)), 1, 13), 16, 10) as double)"
    f" / {_TWO_52!r}"
)
_DUCK_U = (
    "list_reduce(list_prepend(0::BIGINT, list_transform(range(1, 14), "
    "i -> (strpos('0123456789abcdef', "
    "substring(md5(doc_id::VARCHAR), i, 1)) - 1)::BIGINT)), "
    f"(a, x) -> a * 16 + x) / {_TWO_52!r}"
)

_TARGET_SOURCES = "('src0','src1','src2','src3','src4')"
_DSIR_RATE = 0.5  # base acceptance rate (scaled by the importance weight)
_FEAT = "cast(floor(n_chars / 100.0) as bigint)"


def _dsir_sql(u_expr: str) -> str:
    return f"""
WITH feat AS (
  SELECT doc_id, source, {_FEAT} AS f, {u_expr} AS u FROM documents
),
tgt AS (
  SELECT f, count(*) AS c FROM feat WHERE source IN {_TARGET_SOURCES} GROUP BY f
),
corp AS (
  SELECT f, count(*) AS c FROM feat GROUP BY f
),
tot AS (
  SELECT
    (SELECT count(*) FROM feat WHERE source IN {_TARGET_SOURCES}) AS tt,
    (SELECT count(*) FROM feat) AS ct
),
w AS (
  SELECT fe.doc_id, fe.f, fe.u,
         CASE WHEN t.c IS NULL THEN cast(0.0 as double)
              ELSE (t.c * tot.ct) / cast(c.c * tot.tt as double) END AS w
  FROM feat fe
  JOIN corp c ON c.f = fe.f
  LEFT JOIN tgt t ON t.f = fe.f
  CROSS JOIN tot
)
SELECT doc_id, f, round(w, 6) AS weight
FROM w
WHERE u < {_DSIR_RATE!r} * w
ORDER BY doc_id
"""


def dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-resample documents toward the target-source length
    profile: accept doc iff hash_u < rate * p_target(feat)/p_corpus(feat).

    Plan: two bounded histograms (feature buckets — cardinality is the
    value range, not the corpus) broadcast back onto a map-only
    accept predicate.  Rerun-stable and engine-stable like hash_sample:
    the weight is one IEEE division of exactly-computed integers, the
    acceptance compare is on identically-derived doubles.
    """
    catalog.register(spark, sf_dir)
    return spark.sql(_dsir_sql(_SPARK_U))


registry.register("x_dsir_sample", dsir_sample, _dsir_sql(_DUCK_U))


# ------------------------------------------------------- LM surprisal

_SPARK_TOK = "explode(split(trim(text), ' '))"
_DUCK_TOK = "unnest(string_split(trim(text), ' '))"


def _surprisal_sql(tok_expr: str) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, w FROM (SELECT doc_id, {tok_expr} AS w FROM documents) s
),
vocab AS (
  SELECT w, count(*) AS cnt FROM tok GROUP BY w
),
tot AS (SELECT sum(cnt) AS n FROM vocab),
scored AS (
  SELECT t.doc_id,
         length(bin(tot.n)) - length(bin(v.cnt)) AS bits
  FROM tok t JOIN vocab v ON v.w = t.w CROSS JOIN tot
)
SELECT doc_id,
       cast(count(*) as bigint) AS n_tokens,
       cast(sum(bits) as bigint) AS surprisal_bits,
       round(sum(bits) / cast(count(*) as double), 6) AS avg_bits
FROM scored GROUP BY doc_id
ORDER BY doc_id
"""


def lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram surprisal in whole bits.

    bitlen(total) - bitlen(cnt) is non-negative, within 1 bit of
    -log2(cnt/total) on either side (floor-of-log2 difference — a
    token whose count shares the total's bit length scores 0), weakly
    monotone in the true surprisal for fixed total, and integer-exact
    on both engines (length(bin(x))).  Rare-token
    documents score high — the perplexity-filter ordering — without any
    cross-engine float-log hazard.

    Plan: token explode → one vocab aggregation (map-side combined,
    output = vocabulary not corpus) broadcast back → per-doc integer
    sum.  No shuffle carries more than vocabulary + per-doc rows.
    """
    catalog.register(spark, sf_dir)
    return spark.sql(_surprisal_sql(_SPARK_TOK))


registry.register("x_lm_surprisal", lm_surprisal, _surprisal_sql(_DUCK_TOK))


# ------------------------------------------- temperature source mixing

_MIX_RATE = 0.5  # base acceptance for the largest source


def _temperature_sql(u_expr: str) -> str:
    # alpha = 0.5 temperature flattening: rate_s = base * sqrt(n_max/n_s),
    # clamped at 1.  sqrt and the two divisions are IEEE correctly-rounded
    # on both engines, so the per-source rates (and thus the md5-threshold
    # accept sets) agree exactly.
    return f"""
WITH s AS (
  SELECT source, count(*) AS n FROM documents GROUP BY source
),
mx AS (SELECT max(n) AS n_max FROM s),
rate AS (
  SELECT s.source,
         s.n,
         least(cast(1.0 as double),
               {_MIX_RATE!r} * sqrt(cast(mx.n_max as double) / s.n)) AS r
  FROM s CROSS JOIN mx
),
d AS (
  SELECT doc_id, source, {u_expr} AS u FROM documents
)
SELECT d.doc_id, d.source, round(rate.r, 6) AS rate
FROM d JOIN rate ON rate.source = d.source
WHERE d.u < rate.r
ORDER BY d.doc_id
"""


def temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened source mixture (the pretraining
    "mixture-balancing" resample: small sources are up-weighted relative
    to their corpus share, alpha = 0.5).

    Per-source acceptance rate = base * sqrt(n_max/n_s) clamped at 1 —
    the sampled mixture's source shares move from p_s toward
    p_s^alpha / Z.  Deterministic md5 acceptance (rerun/engine/
    partition-stable); one bounded source histogram broadcast onto a
    map-only predicate, same 100 TB shape as hash_sample.
    """
    catalog.register(spark, sf_dir)
    return spark.sql(_temperature_sql(_SPARK_U))


registry.register("x_temperature_mix", temperature_mix, _temperature_sql(_DUCK_U))
