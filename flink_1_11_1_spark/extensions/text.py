"""Text analysis battery over ``documents`` (SURVEY.md §8.4).

Training-data-pipeline ops a 100 TB corpus needs: token counting,
quality scoring, language-ID heuristic, document fingerprinting.  All
are embarrassingly parallel per-row expressions — they stay inside
WholeStageCodegen (no Python in the hot path) except the fingerprint,
which demonstrates the Arrow-batched pandas-UDF path.

Portability strategy: the stats/lang-id expressions are written once as
SQL text in the engine-portable subset (length/replace/||/CASE, SURVEY.md
§0) and evaluated by Spark via ``F.expr`` — the DuckDB oracle runs the
same text, so both engines compute identical integer/double arithmetic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .. import catalog
from . import registry

# --- shared expression fragments (engine-portable SQL subset) ----------

# whitespace token count: single-space-separated corpus contract
N_TOKENS = "(length(text) - length(replace(text, ' ', '')) + 1)"
# characters excluding spaces
N_ALPHA = "length(replace(text, ' ', ''))"


def _count_word(word: str) -> str:
    """Occurrences of a space-delimited word via length-difference."""
    pat = f" {word} "
    return (
        f"((length(' ' || text || ' ') - "
        f"length(replace(' ' || text || ' ', '{pat}', ' '))) "
        f"/ {len(pat) - 1})"
    )


# language-marker words -> language, checked in deterministic order.
_LANG_MARKERS = [
    ("en", ["the", "a"]),
    ("de", ["der", "und"]),
    ("es", ["el", "los"]),
    ("fr", ["le", "la"]),
    ("zh", ["de", "shi"]),
]


def _lang_scores() -> list[tuple[str, str]]:
    return [
        (lang, "(" + " + ".join(_count_word(w) for w in words) + ")")
        for lang, words in _LANG_MARKERS
    ]


def lang_id_expr() -> str:
    """CASE expression: argmax of marker-word scores, first-wins ties."""
    scores = _lang_scores()
    branches = []
    for i, (lang, s) in enumerate(scores):
        others = [o for j, (_, o) in enumerate(scores) if j != i]
        ge = " AND ".join(f"{s} >= {o}" for o in others)
        branches.append(f"WHEN {s} > 0 AND {ge} THEN '{lang}'")
    return "CASE " + " ".join(branches) + " ELSE 'und' END"


# NOTE: use cast(... as double), never `* 1.0` — a `1.0` literal is
# DECIMAL in Spark, and a DECIMAL(p,4) output renders '4.6250' where
# DuckDB's DOUBLE renders '4.625' (cross-engine hash mismatch).
STATS_SQL = f"""
SELECT doc_id, lang, n_chars,
       {N_TOKENS} AS n_tokens,
       round(cast({N_ALPHA} as double) / {N_TOKENS}, 4) AS avg_token_len,
       round(cast({_count_word('the')} as double) / {N_TOKENS}, 4) AS stop_ratio,
       CASE WHEN {N_TOKENS} >= 20 AND cast({N_ALPHA} as double) / {N_TOKENS} >= 3.0
            THEN 'keep' ELSE 'drop' END AS quality_band
FROM documents
ORDER BY doc_id
"""

LANGID_SQL = f"""
SELECT doc_id, lang AS label_lang, {lang_id_expr()} AS pred_lang
FROM documents
ORDER BY doc_id
"""


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts + quality score per document (JVM-side expressions)."""
    catalog.register(spark, sf_dir)
    return spark.sql(STATS_SQL)


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/marker-word language-ID heuristic per document."""
    catalog.register(spark, sf_dir)
    return spark.sql(LANGID_SQL)


# --- fingerprint: Arrow-batched pandas UDF (the vectorized-UDF path) ---

_MOD = (1 << 61) - 1
_BASE = 257


_B4 = _BASE**4
_W4 = np.array([_BASE**3, _BASE**2, _BASE, 1], dtype=np.uint64)


def _fingerprint_fast(t: str) -> int:
    """Block-Horner evaluation: identical value to ``fingerprint_py``
    (polynomial evaluation is associative), ~8 bytes per python-level
    step instead of 1.  4-byte sub-blocks are numpy uint64 dots (max
    255·Σ257^i(i<4) ≪ 2^64 — no wraparound); blocks combine with
    arbitrary-precision ints mod 2^61-1.
    """
    data = " ".join(t.lower().split()).encode("utf-8")
    n = len(data)
    k = n // 8
    acc = 0
    if k:
        blocks = np.frombuffer(data[: k * 8], dtype=np.uint8).reshape(k, 2, 4)
        vals = blocks.astype(np.uint64) @ _W4  # (k, 2): hi4/lo4 dots
        b8 = pow(_BASE, 8, _MOD)
        for hi, lo in vals.tolist():
            acc = (acc * b8 + hi * _B4 + lo) % _MOD
    for ch in data[k * 8 :]:
        acc = (acc * _BASE + ch) % _MOD
    return acc


@F.pandas_udf(LongType())
def _fingerprint_udf(texts: pd.Series) -> pd.Series:
    """Polynomial rolling hash of the normalized text, mod 2^61-1.

    Arrow-batched transfer; block-Horner body (see ``_fingerprint_fast``)
    computing exactly ``fingerprint_py``'s value — asserted in tests.
    Deterministic across partitionings (pure per-row function).
    """
    return texts.map(_fingerprint_fast)


def fingerprint_py(t: str) -> int:
    """Pure-python reference for unit tests."""
    acc = 0
    for ch in " ".join(t.lower().split()).encode("utf-8"):
        acc = (acc * _BASE + ch) % _MOD
    return acc


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    catalog.register(spark, sf_dir)
    docs = catalog.load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", _fingerprint_udf(F.col("text")).alias("fp"))
        .orderBy("doc_id")
    )


# DuckDB closed-form oracle: the same polynomial fold, expressed as a
# list_reduce over per-character code points in HUGEINT (acc*257+c stays
# < 2^69 < 2^127, then mod 2^61-1 back down).  The corpus contract is
# ASCII lowercase single-spaced text (asserted for every sf in tests),
# where code points == UTF-8 bytes, so this equals the byte-wise UDF.
FINGERPRINT_ORACLE = f"""
SELECT doc_id,
  CAST(list_reduce(
    list_prepend(0::HUGEINT,
      list_transform(range(1, length(t) + 1),
        i -> ord(substring(t, i, 1))::HUGEINT)),
    (acc, x) -> (acc * {_BASE} + x) % {_MOD}) AS BIGINT) AS fp
FROM (SELECT doc_id, regexp_replace(trim(lower(text)), ' +', ' ', 'g') AS t
      FROM documents)
ORDER BY doc_id
"""

# --- token counting: whitespace + BPE-ish regex + chars/4 estimate ----

# BPE-style pretokenizer (ASCII-lowercase corpus contract): letter runs
# are one token, digits split per character, punctuation runs split per
# character — the shape of GPT-2's pretokenizer minus case/unicode
# classes.  Plain alternation + char classes only, so Java regex
# (Spark) and RE2 (DuckDB) agree byte-for-byte.
_BPE_RE = "[a-z]+|[0-9]|[^a-z0-9 ]"


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three token-count estimators per document, all JVM expressions:
    whitespace tokens, BPE-ish regex tokens, and the chars/4 budget
    heuristic.  At 100 TB this is a map-only scan — no shuffle, no
    Python."""
    catalog.register(spark, sf_dir)
    return spark.sql(f"""
        SELECT doc_id,
               cast({N_TOKENS} as bigint) AS n_ws_tokens,
               cast(regexp_count(text, '{_BPE_RE}') as bigint) AS n_re_tokens,
               cast(ceil(cast({N_ALPHA} as double) / 4.0) as bigint) AS n_bpe_est
        FROM documents ORDER BY doc_id
    """)


TOKENS_ORACLE = f"""
SELECT doc_id,
       cast({N_TOKENS} as bigint) AS n_ws_tokens,
       cast(len(regexp_extract_all(text, '{_BPE_RE}')) as bigint) AS n_re_tokens,
       cast(ceil(cast({N_ALPHA} as double) / 4.0) as bigint) AS n_bpe_est
FROM documents ORDER BY doc_id
"""

# ------------------------------------------ BPE merge-candidate table

BPE_TOP_K = 20


def bpe_merge_candidates(docs: DataFrame, k: int = BPE_TOP_K) -> DataFrame:
    """First-iteration BPE vocabulary induction: corpus-wide adjacent
    CHARACTER-pair frequencies within words — exactly the statistic the
    first merge rule of byte-pair encoding (Sennrich et al., ACL 2016)
    is chosen from.  Top-k by (count DESC, pair) — integer-exact, so
    the ranking is engine-exact.

    One generator (word explode fused with pair explode) into a partial
    agg + a k-row TakeOrdered — at 100 TB the pair-count shuffle is
    bounded by the pair vocabulary (<= alphabet^2 per iteration), not
    the corpus.  Later BPE iterations re-run the same plan over
    re-segmented symbols; the induction step is this operator.
    """
    return (
        docs.select(F.explode(F.split(F.trim("text"), " ")).alias("w"))
        .where(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1),"
                    " i -> substring(w, i, 2))"
                )
            ).alias("pair")
        )
        .groupBy("pair")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(k)
    )


def _bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_merge_candidates(catalog.load_table(spark, sf_dir, "documents"))


BPE_ORACLE = f"""
WITH words AS (
  SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents
), pairs AS (
  SELECT substring(w, i, 2) AS pair
  FROM words, unnest(generate_series(1, length(w) - 1)) t(i)
  WHERE length(w) >= 2
)
SELECT pair, count(*) AS cnt FROM pairs
GROUP BY pair ORDER BY cnt DESC, pair LIMIT {BPE_TOP_K}
"""


registry.register("x_bpe_merges", _bpe, BPE_ORACLE)
registry.register("x_text_stats", text_stats, STATS_SQL)
registry.register("x_text_tokens", token_counts, TOKENS_ORACLE)
registry.register("x_text_langid", lang_id, LANGID_SQL)
registry.register("x_text_fingerprint", fingerprints, FINGERPRINT_ORACLE)


# --- repetition filters (Gopher §A1.1-style duplicate n-gram gates) ---

# Pure array expressions — no explode, no shuffle: the whole measure
# fuses into the scan projection (map-only at any corpus size).  All
# outputs are integer counts; the keep-gate compares integer
# cross-products, so the DuckDB oracle is value-exact.
REPETITION_SQL = """
WITH w AS (
  SELECT doc_id, split(text, ' ') AS words FROM documents
),
g AS (
  SELECT doc_id, words, size(words) AS n_words,
         CASE WHEN size(words) < 2 THEN array()
              ELSE transform(sequence(0, size(words) - 2),
                             i -> concat(get(words, i), ' ', get(words, i + 1)))
         END AS grams,
         array_sort(words) AS s
  FROM w
),
-- top word count = longest equal-run in the sorted word array: run
-- starts are positions whose element differs from the previous one,
-- and run lengths are gaps between consecutive starts.  O(n log n)
-- sort + O(n) lambda evaluations, replacing the round-7 form's
-- O(distinct x n) filter-per-distinct-word scan (~1.6x on the entry
-- at sf0.1, value-identical -- round 14, guide section 1.2 step 2).
r AS (
  SELECT doc_id, n_words, grams,
         filter(sequence(0, n_words - 1),
                i -> i = 0 OR get(s, i) != get(s, i - 1)) AS starts
  FROM g
),
t AS (
  SELECT doc_id, n_words, grams,
         array_max(zip_with(starts,
                            concat(slice(starts, 2, size(starts) - 1),
                                   array(n_words)),
                            (a, b) -> b - a)) AS top_word_n
  FROM r
)
SELECT doc_id,
       cast(n_words as bigint) AS n_words,
       cast(size(grams) as bigint) AS n_grams2,
       cast(size(grams) - size(array_distinct(grams)) as bigint) AS dup_grams2,
       cast(top_word_n as bigint) AS top_word_n,
       (size(grams) - size(array_distinct(grams))) * 5 < size(grams)
         AND top_word_n * 5 < n_words
         AS keep
FROM t ORDER BY doc_id
"""

REPETITION_ORACLE = """
WITH w AS (
  SELECT doc_id, str_split(text, ' ') AS words FROM documents
),
g AS (
  SELECT doc_id, words, len(words) AS n_words,
         CASE WHEN len(words) < 2 THEN []
              ELSE list_transform(range(1, len(words)),
                                  i -> words[i] || ' ' || words[i + 1])
         END AS grams
  FROM w
)
SELECT doc_id,
       cast(n_words as bigint) AS n_words,
       cast(len(grams) as bigint) AS n_grams2,
       cast(len(grams) - len(list_distinct(grams)) as bigint) AS dup_grams2,
       cast(list_max(list_transform(list_distinct(words),
                     x -> len(list_filter(words, y -> y = x)))) as bigint)
         AS top_word_n,
       (len(grams) - len(list_distinct(grams))) * 5 < len(grams)
         AND list_max(list_transform(list_distinct(words),
                      x -> len(list_filter(words, y -> y = x)))) * 5 < n_words
         AS keep
FROM g ORDER BY doc_id
"""


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition measures (Gopher repetition filters):
    duplicate word-2-gram count and most-frequent-word count, plus the
    integer-exact keep gate (dup-2-gram fraction < 20% AND top-word
    fraction < 20%)."""
    catalog.register(spark, sf_dir)
    return spark.sql(REPETITION_SQL)


registry.register("x_repetition", repetition_stats, REPETITION_ORACLE)
