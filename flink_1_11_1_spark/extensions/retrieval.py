"""BM25 lexical retrieval over ``documents`` (SURVEY.md §8.4 family —
the sparse counterpart of the embedding ANN tier in similarity.py).

Okapi BM25 (Robertson & Walker, SIGIR 1994; k1=1.2, b=0.75), fully
declarative:

- tokenize once (split + drop empties), explode, keep ONLY query terms
  before any shuffle (the filter rides the scan — at 100 TB candidate
  volume is |docs containing a query term|, not corpus size);
- per-(doc, term) tf via one aggregation; per-term df and the corpus
  stats (N, total token count) are tiny aggregates broadcast back;
- score = Σ idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len/avgdl)) with
  idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

Cross-engine contract: avgdl is computed as an EXACT integer token-sum
divided once (no float accumulation-order drift); the only
engine-sensitive ops are ln() and the final arithmetic (≤ a few ulp),
absorbed by two-stage rounding (round(·,7) then round(·,4) — same
treatment as the TPC-H Q10 revenue measure).  Scores are returned per
doc (ordered by doc_id), not rank-truncated, so no float-ranking
ambiguity enters the oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from . import registry

K1 = 1.2
B = 0.75

QUERY_TERMS = ("join", "vector", "window")

_TOKENIZE = "filter(split(lower(text), '\\\\s+'), x -> x != '')"


def bm25_scores(docs: DataFrame, terms: tuple[str, ...] = QUERY_TERMS) -> DataFrame:
    """(doc_id, bm25) for every doc containing at least one query term."""
    toks = docs.select(
        "doc_id", F.expr(_TOKENIZE).alias("_toks")
    ).select("doc_id", F.expr("size(_toks)").alias("_len"), "_toks")
    stats = toks.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_len").alias("_sumlen")
    )
    term_list = ", ".join(f"'{t}'" for t in terms)
    hits = toks.select(
        "doc_id",
        "_len",
        F.explode(F.expr(f"filter(_toks, x -> x IN ({term_list}))")).alias("term"),
    )
    tf = hits.groupBy("doc_id", "_len", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(F.broadcast(stats), how="cross")
        .select(
            "doc_id",
            (
                F.expr("ln(1.0 + (cast(_n as double) - df + 0.5) / (df + 0.5))")
                * F.expr(
                    f"tf * ({K1} + 1.0) / (tf + {K1} * (1.0 - {B} + {B} * "
                    f"_len / (cast(_sumlen as double) / _n)))"
                )
            ).alias("_s"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.expr("round(round(sum(_s), 7), 4)").alias("bm25")
    )


def _bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.load_table(spark, sf_dir, "documents")
    return bm25_scores(docs).orderBy("doc_id")


BM25_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') toks
  FROM documents),
d AS (SELECT doc_id, len(toks) dl, toks FROM t),
stats AS (SELECT count(*) n, sum(dl) sumlen FROM d),
hits AS (
  SELECT doc_id, dl, u.term
  FROM d, unnest(list_filter(toks, x -> x IN ('join', 'vector', 'window'))) u(term)),
tf AS (SELECT doc_id, dl, term, count(*) tf FROM hits GROUP BY 1, 2, 3),
dfr AS (SELECT term, count(*) df FROM tf GROUP BY 1)
SELECT doc_id,
       round(round(sum(
         ln(1.0 + (n::DOUBLE - df + 0.5) / (df + 0.5))
         * tf * ({K1} + 1.0)
         / (tf + {K1} * (1.0 - {B} + {B} * dl / (sumlen::DOUBLE / n)))
       ), 7), 4) bm25
FROM tf JOIN dfr USING (term), stats
GROUP BY doc_id ORDER BY doc_id
"""

registry.register("x_bm25", _bm25, BM25_ORACLE)
