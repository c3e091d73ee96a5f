"""End-to-end corpus-cleaning pipeline (the 100 TB training-data story
all extension ops exist for): exact-dedup → quality filter → lang-ID
annotate — one declarative DataFrame chain, each stage an operator from
this package, with a portable oracle for the whole composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from . import registry
from .dedup import drop_exact_duplicates
from .text import N_ALPHA, N_TOKENS, lang_id_expr


def clean_corpus(docs: DataFrame, min_tokens: int = 20, min_avg_len: float = 3.0) -> DataFrame:
    """Dedup (deterministic survivor) → quality gate → lang annotate."""
    deduped = drop_exact_duplicates(docs)
    quality = deduped.where(
        F.expr(f"{N_TOKENS} >= {min_tokens}")
        & F.expr(f"cast({N_ALPHA} as double) / {N_TOKENS} >= {min_avg_len}")
    )
    return quality.withColumn("pred_lang", F.expr(lang_id_expr()))


def pipeline_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surviving-docs summary per predicted language."""
    docs = catalog.load_table(spark, sf_dir, "documents")
    out = clean_corpus(docs)
    return (
        out.groupBy("pred_lang")
        .agg(F.count("*").alias("n_docs"), F.sum(F.expr(N_TOKENS)).alias("n_tokens"))
        .orderBy("pred_lang")
    )


# Oracle: same composition relationally.  Exact dedup keeps the min
# doc_id per text — for counting purposes equivalent to DISTINCT ON
# text; quality + lang expressions are the shared portable fragments.
PIPELINE_ORACLE = f"""
WITH dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) rn
    FROM documents) t WHERE rn = 1
),
quality AS (
  SELECT *, {lang_id_expr()} AS pred_lang FROM dedup
  WHERE {N_TOKENS} >= 20 AND cast({N_ALPHA} as double) / {N_TOKENS} >= 3.0
)
SELECT pred_lang, count(*) n_docs, cast(sum({N_TOKENS}) as bigint) n_tokens
FROM quality GROUP BY pred_lang ORDER BY pred_lang
"""


registry.register("x_pipeline_clean", pipeline_summary, PIPELINE_ORACLE)
