"""Corpus-curation battery (SURVEY.md §8.4, round-5 extension family).

Six further operators a 100 TB training-data pipeline runs between raw
scrape and tokenizer — each declared under the oracle contract, each
designed so the cross-engine comparison is *integer-exact or
bit-deterministic* (the round-5 lesson: float sums tie at rounding
boundaries, so contracts are built on integer arithmetic, single IEEE
divisions, and identical left-fold orders instead):

- decontaminate:   n-gram-overlap benchmark decontamination (train docs
                   sharing >= 50% of their 5-grams with any eval-set
                   doc) — the GPT-3/PaLM eval-leak check.  Flag is
                   integer-exact (2*hits >= grams).
- pii_redact:      regex PII detection + redaction (email/phone/IPv4)
                   with per-class counts and an md5 fingerprint of the
                   redacted text.  Patterns stay in the RE2 ∩ java.regex
                   dialect so both engines see identical matches.
- quality_rules:   Gopher/C4-style repetition & shape filters as ONE
                   map-only projection (no shuffle, WholeStageCodegen):
                   token count, summed word length, max token
                   multiplicity (sorted-run fold), distinct-bigram
                   count, and an integer-exact keep flag.
- kmeans_assign:   Lloyd's k-means over int-quantized embeddings
                   (round(x*1000) grid).  Quantization makes every
                   distance a sum over exact integer differences and
                   every centroid a single IEEE division of exact
                   integer sums — the full 2-iteration pipeline is
                   bit-identical across engines (and mirrors what a
                   100 TB pipeline does anyway: cluster on int8/int16
                   codes, not fp32).
- sessionize:      gaps-and-islands session assignment over events
                   (30-min inactivity gap) + per-session stats, all in
                   epoch-ms integers.
- token_quota:     per-language token-budget curation: rank docs within
                   each language (largest first), keep while the
                   running token sum fits the budget — the mixture-
                   assembly step after stratified sampling.

Scale notes (100 TB): decontaminate broadcasts only the *eval-set*
n-grams (bounded by benchmark size, not corpus size); pii_redact and
quality_rules are pure per-row projections that ride the scan;
kmeans_assign broadcasts k centroids as literals so assignment is
map-only, and the update step is one groupBy(cluster, dim) — k*dim
rows; sessionize/token_quota are single keyed window passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import catalog
from . import registry
from .dedup import shingles
from .pipeline import _DUCK_BUCKET, _SPARK_BUCKET

# ------------------------------------------------------ decontamination

DECON_NGRAM = 5
DECON_EVAL_PCT = 5  # md5-bucket share of docs held out as the "benchmark"


def decontaminate(docs: DataFrame, n: int = DECON_NGRAM, eval_pct: int = DECON_EVAL_PCT) -> DataFrame:
    """Benchmark decontamination: for every training doc, count its
    distinct word-``n``-grams that also occur anywhere in the eval set
    (a deterministic md5-bucket holdout, standing in for a benchmark
    suite), and flag docs whose overlap reaches 50%.

    The eval n-gram set is broadcast — it scales with the *benchmark*,
    not the corpus — so the hit count is a map-side join on the shingle
    stream; the only shuffles are the per-doc counts, keyed by doc_id.
    The flag is integer arithmetic (2*hits >= grams): no float boundary.
    """
    bucket = F.expr(_SPARK_BUCKET.format(salt="eval"))
    eval_ids = docs.where(bucket < eval_pct).select("doc_id")
    train_ids = docs.where(~(bucket < eval_pct)).select("doc_id")
    # read 3x (eval grams, per-doc totals, hit counts): lazy-checkpoint
    # so the shingle explode runs once (round 14, guide §5)
    sh = shingles(docs, n).localCheckpoint(eager=False)
    eval_grams = sh.join(F.broadcast(eval_ids), "doc_id").select("g").distinct()
    train_sh = sh.join(F.broadcast(eval_ids), "doc_id", "left_anti")
    totals = train_sh.groupBy("doc_id").agg(F.count("*").alias("_t"))
    hits = (
        train_sh.join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("_h"))
    )
    return (
        train_ids.join(totals, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("_t", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("_h", F.lit(0)).cast("long").alias("n_hits"),
        )
        .withColumn(
            "contaminated",
            ((F.col("n_grams") > 0) & (2 * F.col("n_hits") >= F.col("n_grams"))).cast("int"),
        )
        .orderBy("doc_id")
    )


def _decon(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decontaminate(catalog.load_table(spark, sf_dir, "documents"))


DECON_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') w FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS g
  FROM toks, unnest(generate_series(1, greatest(len(w)-4, 0))) t(i)
), ev AS (
  SELECT doc_id FROM (SELECT doc_id, {_DUCK_BUCKET.format(salt="eval")} AS b FROM documents)
  WHERE b < {DECON_EVAL_PCT}
), eg AS (
  SELECT DISTINCT g FROM sh JOIN ev USING (doc_id)
), tr AS (
  SELECT doc_id, g FROM sh WHERE doc_id NOT IN (SELECT doc_id FROM ev)
), tot AS (
  SELECT doc_id, count(*) c FROM tr GROUP BY doc_id
), hit AS (
  SELECT doc_id, count(*) c FROM tr JOIN eg USING (g) GROUP BY doc_id
)
SELECT d.doc_id,
       cast(coalesce(tot.c, 0) as bigint) AS n_grams,
       cast(coalesce(hit.c, 0) as bigint) AS n_hits,
       cast(CASE WHEN coalesce(tot.c, 0) > 0
                  AND 2 * coalesce(hit.c, 0) >= tot.c
                 THEN 1 ELSE 0 END as int) AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM ev)) d
LEFT JOIN tot USING (doc_id) LEFT JOIN hit USING (doc_id)
ORDER BY doc_id
"""


# -------------------------------------------------------- PII redaction

# RE2 ∩ java.util.regex dialect only: no lookaround, no backrefs.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{4}\b"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# The fixture corpus is letters-only, so PII is injected
# deterministically from doc_id INSIDE the query (identically in both
# engines): every doc gets an email; docs with doc_id % 3 != 0 also get
# a phone; even doc_ids also get an IPv4 — giving variety in the counts.
_PII_AUG_SPARK = (
    "concat(text,"
    " ' contact user', cast(doc_id as string), '@mail.example.com',"
    " CASE WHEN doc_id % 3 != 0 THEN"
    "   concat(' or call 555-', lpad(cast(doc_id % 10000 as string), 4, '0'))"
    " ELSE '' END,"
    " CASE WHEN doc_id % 2 = 0 THEN"
    "   concat(' from 10.0.', cast(doc_id % 256 as string), '.25')"
    " ELSE '' END)"
)
_PII_AUG_DUCK = (
    "text"
    " || ' contact user' || doc_id::VARCHAR || '@mail.example.com'"
    " || (CASE WHEN doc_id % 3 != 0 THEN"
    "       ' or call 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')"
    "     ELSE '' END)"
    " || (CASE WHEN doc_id % 2 = 0 THEN"
    "       ' from 10.0.' || (doc_id % 256)::VARCHAR || '.25'"
    "     ELSE '' END)"
)


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Detect and redact emails, NANP-style phone fragments and IPv4
    addresses: per-class counts plus the redacted text.  Pure per-row
    regex projection — rides the scan, no shuffle, no Python.

    Redaction order is email -> phone -> IP (the classes are disjoint on
    any input: phone needs a hyphen, IP needs three dots, email needs
    '@', and the placeholders contain no digits, so order only matters
    for overlapping spans within a class — Flink/Spark/RE2 all take the
    leftmost-longest-free greedy match identically).
    """
    t = F.col(text_col)
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
        IP_RE,
        "<IP>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count(t, F.lit(IP_RE)).cast("long").alias("n_ips"),
        F.md5(red).alias("fp"),
    )


def _pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.load_table(spark, sf_dir, "documents")
    aug = docs.select("doc_id", F.expr(_PII_AUG_SPARK).alias("text"))
    return pii_redact(aug).orderBy("doc_id")


PII_ORACLE = f"""
WITH aug AS (
  SELECT doc_id, {_PII_AUG_DUCK} AS text FROM documents
)
SELECT doc_id,
       cast(len(regexp_extract_all(text, '{EMAIL_RE}')) as bigint) AS n_emails,
       cast(len(regexp_extract_all(text, '{PHONE_RE}')) as bigint) AS n_phones,
       cast(len(regexp_extract_all(text, '{IP_RE}')) as bigint) AS n_ips,
       md5(regexp_replace(regexp_replace(regexp_replace(
             text, '{EMAIL_RE}', '<EMAIL>', 'g'),
             '{PHONE_RE}', '<PHONE>', 'g'),
             '{IP_RE}', '<IP>', 'g')) AS fp
FROM aug ORDER BY doc_id
"""


# ------------------------------------------------- quality rule filters

# Gopher/C4-style shape-and-repetition rules, all integer-exact:
#   10 <= n_tokens <= 1000
#   3 <= mean word length <= 12        (sum_wlen vs 3n / 12n)
#   top-token fraction <= 0.2           (5 * top_cnt <= n)
#   duplicate-bigram fraction <= 0.4    (5 * (n-1-d) <= 2 * (n-1))
_Q_TOP_RUN = (
    "aggregate(array_sort(w),"
    " named_struct('prev', '', 'run', 0L, 'best', 0L),"
    " (acc, x) -> named_struct("
    "   'prev', x,"
    "   'run', IF(x = acc.prev, acc.run + 1L, 1L),"
    "   'best', greatest(acc.best, IF(x = acc.prev, acc.run + 1L, 1L))),"
    " acc -> acc.best)"
)
_Q_BIGRAMS = (
    "CASE WHEN size(w) >= 2 THEN cast(size(array_distinct(transform("
    "sequence(1, size(w) - 1), i -> concat(get(w, i - 1), ' ', get(w, i)))))"
    " as bigint) ELSE 0L END"
)


def quality_rules(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition/shape quality gate as ONE map-only projection.

    Token multiplicity (the Gopher "top-word fraction" signal) comes
    from a sorted-run fold over the token array — max run length of
    array_sort(w) == max multiplicity — so the whole operator stays
    inside WholeStageCodegen with zero shuffles; at 100 TB it is a
    filter pushed into the scan, like any projection.
    """
    return (
        docs.select("doc_id", F.split(F.trim(text_col), " ").alias("w"))
        .select(
            "doc_id",
            F.expr("cast(size(w) as bigint)").alias("n_tokens"),
            F.expr(
                "aggregate(w, 0L, (a, x) -> a + cast(length(x) as bigint))"
            ).alias("sum_wlen"),
            F.expr(_Q_TOP_RUN).alias("top_cnt"),
            F.expr(_Q_BIGRAMS).alias("n_bigrams"),
        )
        .withColumn(
            "keep",
            (
                F.col("n_tokens").between(10, 1000)
                & (F.col("sum_wlen") >= 3 * F.col("n_tokens"))
                & (F.col("sum_wlen") <= 12 * F.col("n_tokens"))
                & (5 * F.col("top_cnt") <= F.col("n_tokens"))
                & (
                    (F.col("n_tokens") < 2)
                    | (
                        5 * (F.col("n_tokens") - 1 - F.col("n_bigrams"))
                        <= 2 * (F.col("n_tokens") - 1)
                    )
                )
            ).cast("int"),
        )
        .orderBy("doc_id")
    )


def _quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_rules(catalog.load_table(spark, sf_dir, "documents"))


QUALITY_ORACLE = """
WITH ta AS (
  SELECT doc_id, string_split(trim(text), ' ') w FROM documents
), toks AS (
  SELECT doc_id, unnest(w) AS t FROM ta
), base AS (
  SELECT doc_id, count(*) n, sum(length(t)) s FROM toks GROUP BY doc_id
), top AS (
  SELECT doc_id, max(c) top_cnt
  FROM (SELECT doc_id, t, count(*) c FROM toks GROUP BY doc_id, t)
  GROUP BY doc_id
), bg AS (
  SELECT doc_id, count(DISTINCT g) d FROM (
    SELECT doc_id, w[i] || ' ' || w[i+1] AS g
    FROM ta, unnest(generate_series(1, greatest(len(w)-1, 0))) u(i))
  GROUP BY doc_id
)
SELECT base.doc_id,
       cast(n as bigint) AS n_tokens,
       cast(s as bigint) AS sum_wlen,
       cast(top_cnt as bigint) AS top_cnt,
       cast(coalesce(bg.d, 0) as bigint) AS n_bigrams,
       cast(CASE WHEN n BETWEEN 10 AND 1000
                  AND s >= 3 * n AND s <= 12 * n
                  AND 5 * top_cnt <= n
                  AND (n < 2 OR 5 * (n - 1 - coalesce(bg.d, 0)) <= 2 * (n - 1))
                 THEN 1 ELSE 0 END as int) AS keep
FROM base JOIN top USING (doc_id) LEFT JOIN bg USING (doc_id)
ORDER BY doc_id
"""


# ------------------------------------------------ k-means on embeddings

KM_K = 8
KM_ITERS = 2
KM_DIM = 64
KM_SCALE = 1000  # fp32 -> int grid: round(x * 1000)

_KM_QUANT_SPARK = (
    f"transform(embedding, x -> cast(round(cast(x as double) * {KM_SCALE}, 0) as bigint))"
)


def _km_dist_expr(center: list[float]) -> str:
    """Squared L2 from the int-quantized vector to a literal centroid.

    Left fold in array order — the DuckDB oracle folds identically, so
    the double is bit-identical (exact integer coordinates, one IEEE
    division per centroid coordinate, same summation order)."""
    lits = ", ".join(f"{x!r}D" for x in center)
    return (
        f"aggregate(zip_with(q, array({lits}),"
        " (x, y) -> (cast(x as double) - y) * (cast(x as double) - y)),"
        " 0D, (a, x) -> a + x)"
    )


def _km_assign(v: DataFrame, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """Map-only assignment: centroids ride along as literals (the
    broadcast-k design — at 100 TB the corpus never shuffles)."""
    dists = F.array(*[F.expr(_km_dist_expr(c)) for _cid, c in cents])
    cids = F.array(*[F.lit(cid) for cid, _c in cents])
    pos = F.expr("array_position(_ds, array_min(_ds))").cast("int")
    return (
        v.withColumn("_ds", dists)
        .withColumn("cluster", F.get(cids, pos - 1).cast("long"))
        .drop("_ds")
    )


def kmeans_assign(emb: DataFrame, k: int = KM_K, iters: int = KM_ITERS) -> DataFrame:
    """Lloyd's k-means over int-quantized embeddings; returns the final
    (vec_id, cluster) assignment after ``iters`` assignment rounds.

    Deterministic end to end: init = the k vectors first in
    (md5(vec_id), vec_id) order; every distance is an ordered fold over
    exact integer differences; centroid updates are exact integer sums
    divided once (collected to the driver — k rows, the canonical
    broadcast-centroid pattern).  Ties break toward the lowest centroid
    id in both engines.
    """
    v = emb.select("vec_id", F.expr(_KM_QUANT_SPARK).alias("q"))
    init = (
        v.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id").limit(k).collect()
    )
    cents: list[tuple[int, list[float]]] = [
        (i, [float(x) for x in r["q"]]) for i, r in enumerate(init)
    ]
    for _ in range(iters - 1):
        assigned = _km_assign(v, cents)
        sums = (
            assigned.select("vec_id", "cluster", F.posexplode("q").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        by_cid: dict[int, list[float]] = {}
        for r in sums:
            by_cid.setdefault(int(r["cluster"]), [0.0] * KM_DIM)[int(r["pos"])] = (
                float(r["s"]) / int(r["n"])
            )
        cents = sorted(by_cid.items())
    return _km_assign(v, cents).select("vec_id", "cluster").orderBy("vec_id")


def _kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmeans_assign(catalog.load_table(spark, sf_dir, "embeddings"))


_KM_QUANT_DUCK = (
    f"list_transform(embedding, x -> round(x::DOUBLE * {KM_SCALE}, 0)::BIGINT)"
)
_KM_FOLD = (
    "list_reduce(list_prepend(0.0, list_transform(range(1, 65),"
    " j -> (q[j]::DOUBLE - {c}[j]) * (q[j]::DOUBLE - {c}[j]))),"
    " (a, x) -> a + x)"
)

KMEANS_ORACLE = f"""
WITH e AS (
  SELECT vec_id, {_KM_QUANT_DUCK} AS q FROM embeddings
), init AS (
  SELECT cast(row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1 as bigint) cid,
         list_transform(q, x -> x::DOUBLE) cv
  FROM (SELECT * FROM e ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT {KM_K})
), d1 AS (
  SELECT e.vec_id, i.cid, {_KM_FOLD.format(c="i.cv")} AS dist
  FROM e CROSS JOIN init i
), a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) rn
    FROM d1) WHERE rn = 1
), c2 AS (
  SELECT cid, list(cm ORDER BY j) cv FROM (
    SELECT a1.cid, j, sum(e.q[j])::DOUBLE / count(*) AS cm
    FROM a1 JOIN e USING (vec_id), unnest(generate_series(1, {KM_DIM})) t(j)
    GROUP BY a1.cid, j)
  GROUP BY cid
), d2 AS (
  SELECT e.vec_id, c.cid, {_KM_FOLD.format(c="c.cv")} AS dist
  FROM e CROSS JOIN c2 c
)
SELECT vec_id, cid AS cluster FROM (
  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) rn
  FROM d2) WHERE rn = 1
ORDER BY vec_id
"""


# -------------------------------------------------------- sessionization

SESSION_GAP_MS = 30 * 60 * 1000


def sessionize(
    events: DataFrame,
    gap_ms: int = SESSION_GAP_MS,
    gap_expr: str | None = None,
) -> DataFrame:
    """Gaps-and-islands sessionization: per user, a new session starts
    when the inactivity gap exceeds the allowed gap; emits per-session
    stats.  One keyed window pass + one keyed agg, all epoch-ms ints.

    ``gap_expr`` (a SQL expression over the event row, evaluated in ms)
    gives per-event dynamic gaps — Flink's
    ``EventTimeSessionWindows.withDynamicGap`` contract: the gap that
    applies between an event and its PREDECESSOR is the predecessor's
    extractor value (the window the previous event opened).

    This is the *assignment* rendering of session windows (the windows
    module's ``session_agg`` is the aggregate rendering) — the shape a
    behavioural pipeline feeds to downstream funnel/retention joins.
    """
    w = Window.partitionBy("user_id").orderBy("tms", "event_id")
    gap_col = F.expr(gap_expr) if gap_expr else F.lit(gap_ms)
    t = events.select(
        "user_id", "event_id", F.unix_millis("ts").alias("tms"),
        gap_col.cast("long").alias("_gap"),
    )
    g = t.withColumn("_prev", F.lag("tms").over(w)).withColumn(
        "_prev_gap", F.lag("_gap").over(w)
    ).withColumn(
        "_ns",
        F.when(
            F.col("_prev").isNull()
            | ((F.col("tms") - F.col("_prev")) > F.col("_prev_gap")),
            1,
        ).otherwise(0),
    )
    s = g.withColumn(
        "session_id",
        F.sum("_ns").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("tms").alias("start_ms"),
            F.max("tms").alias("end_ms"),
        )
        .withColumn("dur_ms", F.col("end_ms") - F.col("start_ms"))
        .orderBy("user_id", "session_id")
    )


def _sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(catalog.load_table(spark, sf_dir, "events"))


SESSION_ORACLE = f"""
WITH events_ms AS (
  SELECT * REPLACE (cast(date_trunc('milliseconds', ts) as timestamp) AS ts) FROM events
), t AS (
  SELECT user_id, event_id, epoch_ms(ts) tms FROM events_ms
), g AS (
  SELECT *, CASE WHEN lag(tms) OVER w IS NULL
                   OR tms - lag(tms) OVER w > {SESSION_GAP_MS}
                 THEN 1 ELSE 0 END ns
  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)
), s AS (
  SELECT *, cast(sum(ns) OVER (PARTITION BY user_id ORDER BY tms, event_id
                               ROWS UNBOUNDED PRECEDING) as bigint) session_id
  FROM g
)
SELECT user_id, session_id, count(*) n_events,
       min(tms) start_ms, max(tms) end_ms,
       max(tms) - min(tms) dur_ms
FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id
"""


# ----------------------------------------------- per-language token quota

TOKEN_QUOTA = 3000

# shared with extensions.text (single-space corpus contract)
_N_TOKENS = "(length(text) - length(replace(text, ' ', '')) + 1)"


def token_quota(docs: DataFrame, budget: int = TOKEN_QUOTA) -> DataFrame:
    """Mixture assembly under a per-language token budget: rank each
    language's docs largest-first (n_chars DESC, doc_id), keep the
    prefix whose running token sum fits the budget.  One keyed window
    pass; all-integer, so the cut is engine-exact.
    """
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("n_chars").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = docs.select(
        "doc_id", "lang", "n_chars", F.expr(_N_TOKENS).cast("long").alias("tok")
    )
    return (
        d.withColumn("_cum", F.sum("tok").over(w))
        .where(F.col("_cum") <= budget)
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("tok").alias("n_tokens"))
        .orderBy("lang")
    )


def _quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_quota(catalog.load_table(spark, sf_dir, "documents"))


QUOTA_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lang, n_chars, cast({_N_TOKENS} as bigint) tok FROM documents
), c AS (
  SELECT *, sum(tok) OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id
                           ROWS UNBOUNDED PRECEDING) cum
  FROM d
)
SELECT lang, count(*) n_docs, cast(sum(tok) as bigint) n_tokens
FROM c WHERE cum <= {TOKEN_QUOTA} GROUP BY lang ORDER BY lang
"""


# ------------------------------------------------------------- registry

def _register_semdedup() -> None:
    # late import: dedup imports curation's kmeans inside functions, and
    # curation imports dedup.shingles at top — registering here runs
    # after both modules are fully initialized.
    from .dedup import _semdedup, _semdedup_oracle_sql

    registry.register("x_semdedup", _semdedup, _semdedup_oracle_sql())


registry.register("x_decontaminate", _decon, DECON_ORACLE)
registry.register("x_pii_redact", _pii, PII_ORACLE)
registry.register("x_quality_rules", _quality, QUALITY_ORACLE)
registry.register("x_kmeans", _kmeans, KMEANS_ORACLE)
registry.register("x_sessionize", _sessionize, SESSION_ORACLE)
registry.register("x_token_quota", _quota, QUOTA_ORACLE)
_register_semdedup()
