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


# shared BM25 CTE chain (t → dfr): ONE copy feeds both oracles — a
# tokenizer/idf/rounding fix cannot silently fork the two contracts
# (round-13 review; CLAUDE.md "don't inline a second copy of a
# nontrivial SQL shape")
_BM25_CTES = """t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') toks
  FROM documents),
d AS (SELECT doc_id, len(toks) dl, toks FROM t),
stats AS (SELECT count(*) n, sum(dl) sumlen FROM d),
hits AS (
  SELECT doc_id, dl, u.term
  FROM d, unnest(list_filter(toks, x -> x IN ('join', 'vector', 'window'))) u(term)),
tf AS (SELECT doc_id, dl, term, count(*) tf FROM hits GROUP BY 1, 2, 3),
dfr AS (SELECT term, count(*) df FROM tf GROUP BY 1)"""

_BM25_MEASURE = f"""round(round(sum(
         ln(1.0 + (n::DOUBLE - df + 0.5) / (df + 0.5))
         * tf * ({K1} + 1.0)
         / (tf + {K1} * (1.0 - {B} + {B} * dl / (sumlen::DOUBLE / n)))
       ), 7), 4)"""

BM25_ORACLE = f"""
WITH {_BM25_CTES}
SELECT doc_id,
       {_BM25_MEASURE} bm25
FROM tf JOIN dfr USING (term), stats
GROUP BY doc_id ORDER BY doc_id
"""

registry.register("x_bm25", _bm25, BM25_ORACLE)


# ----------------------------------------- hybrid retrieval (RRF fusion)

RRF_K = 60
RRF_DEPTH = 50
RRF_TOP = 10
RRF_QUERY_VEC = 7  # the corpus vector standing in for an encoded query

_FOLD_DOT_SPARK = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
)
_FOLD_DOT_DUCK = (
    "list_reduce(list_prepend(0.0, list_transform(range(1, 65),"
    " j -> {a}[j] * {b}[j])), (acc, x) -> acc + x)"
)


def rrf_fusion(
    docs: DataFrame,
    emb: DataFrame,
    query_vec_id: int = RRF_QUERY_VEC,
    depth: int = RRF_DEPTH,
    top: int = RRF_TOP,
) -> DataFrame:
    """Hybrid lexical+semantic retrieval fused by Reciprocal Rank Fusion
    (Cormack, Clarke & Büttcher, SIGIR 2009): rrf(d) = Σ 1/(k + rank_i(d))
    over the rankers that retrieved d, k=60.

    The two rankers are this module's BM25 (fixed query terms) and
    brute cosine against one corpus embedding standing in for the
    encoded query.  Both ranks are integers derived from engine-exact
    scores (BM25 is two-stage rounded per its own oracle contract; the
    cosine is an ordered fold, bit-identical cross-engine), so the
    fused ordering carries no float ambiguity.  Scale shape: each
    ranker is depth-truncated with TakeOrdered (per-partition heaps),
    the fusion is a depth×depth-bounded outer join — cost is O(depth),
    not corpus size, beyond the rankers themselves.
    """
    from pyspark.sql.window import Window

    lex = bm25_scores(docs)
    # depth-truncate with TakeOrdered FIRST (orderBy+limit → per-
    # partition heaps), then rank the <=depth survivors — the previous
    # unpartitioned row_number sorted the whole corpus through one
    # partition before the depth filter (round-13 review; the docstring
    # always promised this shape)
    lex_rank = (
        lex.orderBy(F.col("bm25").desc(), "doc_id")
        .limit(depth)
        .withColumn(
            "lex_rank",
            F.row_number().over(Window.orderBy(F.col("bm25").desc(), "doc_id")),
        )
        .select(F.col("doc_id").alias("id"), "lex_rank")
    )
    v = emb.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    ).withColumn("n", F.expr(f"sqrt({_FOLD_DOT_SPARK.format(a='v', b='v')})"))
    q = v.where(F.col("vec_id") == query_vec_id).select(
        F.col("v").alias("qv"), F.col("n").alias("qn")
    )
    sem_rank = (
        v.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            (
                F.expr(_FOLD_DOT_SPARK.format(a="v", b="qv"))
                / (F.col("n") * F.col("qn"))
            ).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(depth)
        .withColumn(
            "sem_rank",
            F.row_number().over(Window.orderBy(F.col("sim").desc(), "vec_id")),
        )
        .select(F.col("vec_id").alias("id"), "sem_rank")
    )
    return (
        lex_rank.join(sem_rank, "id", "full_outer")
        .withColumn(
            "rrf",
            F.round(
                F.coalesce(1.0 / (RRF_K + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_K + F.col("sem_rank")), F.lit(0.0)),
                6,
            ),
        )
        .orderBy(F.col("rrf").desc(), "id")
        .limit(top)
    )


def _rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rrf_fusion(
        catalog.load_table(spark, sf_dir, "documents"),
        catalog.load_table(spark, sf_dir, "embeddings"),
    )


RRF_ORACLE = f"""
WITH {_BM25_CTES},
bm AS (
  SELECT doc_id,
         {_BM25_MEASURE} bm25
  FROM tf JOIN dfr USING (term), stats GROUP BY doc_id),
lexr AS (
  SELECT doc_id AS id, lex_rank FROM (
    SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) lex_rank FROM bm)
  WHERE lex_rank <= {RRF_DEPTH}),
e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) v FROM embeddings),
en AS (
  SELECT vec_id, v, sqrt({_FOLD_DOT_DUCK.format(a="v", b="v")}) n FROM e),
qv AS (SELECT v AS qv2, n AS qn FROM en WHERE vec_id = {RRF_QUERY_VEC}),
sem AS (
  SELECT vec_id, {_FOLD_DOT_DUCK.format(a="en.v", b="qv2")} / (en.n * qn) sim
  FROM en CROSS JOIN qv),
semr AS (
  SELECT vec_id AS id, sem_rank FROM (
    SELECT vec_id, row_number() OVER (ORDER BY sim DESC, vec_id) sem_rank FROM sem)
  WHERE sem_rank <= {RRF_DEPTH})
SELECT id, lex_rank, sem_rank,
       round(coalesce(1.0 / ({RRF_K} + lex_rank), 0.0)
             + coalesce(1.0 / ({RRF_K} + sem_rank), 0.0), 6) rrf
FROM lexr FULL OUTER JOIN semr USING (id)
ORDER BY rrf DESC, id LIMIT {RRF_TOP}
"""

registry.register("x_rrf_fusion", _rrf, RRF_ORACLE)
