"""End-to-end LLM training-data pipeline on the engine's extension
operators — the composition a data-curation team actually runs, wired
from the same building blocks the correctness contract verifies
one-by-one:

  raw docs → exact dedup → MinHash-LSH near-dup removal → quality
  gate → decontamination vs an eval holdout → PII audit → per-language
  token-quota mixture → fixed-budget batch packing.

Every stage is DataFrame-to-DataFrame and lazy, so each count() below
is ONE jointly-optimized Catalyst plan — filters ride the parquet scan
and the only shuffles are the dedup/grouping keys.  Run:

    python examples/llm_data_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_1_11_1_spark import catalog
from flink_1_11_1_spark.extensions import curation, dedup, pipeline
from flink_1_11_1_spark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("llm-data-pipeline-example")
spark.sparkContext.setLogLevel("ERROR")
catalog.register(spark, sf_dir)

docs = spark.table("documents")
n0 = docs.count()

# 1. exact dedup (md5 grain, keep-first)
docs = dedup.drop_exact_duplicates(docs)
n1 = docs.count()

# 2. near-dup removal: banded MinHash-LSH candidates, verified Jaccard;
#    drop the higher doc_id of each pair (canonical keep-lowest policy)
pairs = dedup.minhash_lsh_pairs(docs, threshold=0.7)
losers = pairs.select(F.greatest("da", "db").alias("doc_id")).distinct()
docs = docs.join(losers, "doc_id", "left_anti")
n2 = docs.count()

# 3. Gopher-style quality gate (map-only projection -> id filter)
good = curation.quality_rules(docs).where("keep = 1").select("doc_id")
docs = docs.join(good, "doc_id")
n3 = docs.count()

# 4. decontamination against the md5-bucket eval holdout (broadcast
#    eval n-grams; flagged docs dropped)
clean = curation.decontaminate(docs).where("contaminated = 0").select("doc_id")
docs = docs.join(clean, "doc_id")
n4 = docs.count()

# 5. PII audit over the surviving corpus (per-row regex, no shuffle)
pii = curation.pii_redact(docs).agg(
    (F.sum("n_emails") + F.sum("n_phones") + F.sum("n_ips")).alias("hits")
).first().hits

# 6. per-language token-quota mixture summary
quota = {r.lang: r.n_tokens for r in
         curation.token_quota(docs, budget=20_000).collect()}

# 7. greedy fixed-budget batch packing (stateful per-shard scan)
packed = pipeline.pack_batches(docs, budget=2_000, shards=4)
n_batches = packed.select("shard", "batch_id").distinct().count()

print(f"raw={n0} exact-deduped={n1} near-deduped={n2} quality={n3} "
      f"decontaminated={n4} pii_hits={pii} langs={len(quota)} "
      f"batches={n_batches}")
assert n0 >= n1 >= n2 >= n3 >= n4 > 0 and n_batches > 0 and quota
print("OK")
