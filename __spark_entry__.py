"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: ``flink_1_11_1_spark`` (see SURVEY.md; the declared queries are
§3.13, each tagged to the Blink physical operator(s) it exercises).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # driver-cwd safety

from pyspark.sql import DataFrame, SparkSession

from flink_1_11_1_spark import catalog, declared
from flink_1_11_1_spark.extensions import registry as ext_registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q3 shape: 3-way join + agg + top-k) on sf0.001."""
    catalog.register(spark, "/root/testdata/sf0.001")
    return spark.sql(declared.QUERIES["q05"])


def _declared_runner(sql: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        catalog.register(spark, sf_dir)
        return spark.sql(sql)

    return run


# Entries already driver-verified green in CORRECTNESS_r01/r02.  The
# correctness driver checks the FIRST 50 entries of queries() in dict
# order (r01/r02 each recorded exactly the first 50), so entries that
# have never had a driver row are ordered FIRST and long-proven greens
# last — rotating the 50-entry window across rounds until every entry
# has a recorded green row.  COVERAGE.md documents the rotation.
_DRIVER_GREEN_HISTORY = {
    *(f"q{i:02d}" for i in range(1, 43) if i not in (15, 36)),
    "x_dedup_exact", "x_dedup_jaccard", "x_dedup_minhash",
    "x_text_stats", "x_text_langid",
    # round-3 greens (CORRECTNESS_r03.json) — the only 13 rows that
    # survived the testdata ts-encoding change; now rotated to the back.
    "x_ann_ivf", "x_ann_quantized", "x_ann_top1", "x_cdc_debezium",
    "x_connected_components", "x_count_window_df", "x_dedup_cosine",
    "x_dedup_simhash", "x_knn_label", "x_lookup_join",
    "x_pipeline_clean", "x_salted_agg", "x_topn_df",
    # round-4 greens (CORRECTNESS_r04.json: 47 hash-green rows) — the
    # only r04 non-greens were x_tpch_q10 (half-cent, fixed round 5),
    # x_tpch_q13/q14 (deferred past the window) and the two rows-only
    # entries; those stay FIRST in the round-5 window.
    "q15", "q36",
    "x_dedup_clusters", "x_text_tokens", "x_text_fingerprint",
    "x_sample_hash", "x_sample_weighted", "x_pack_batches",
    "x_sketch_kmv", "x_explode_correlate", "x_array_ops",
    "x_listagg_ordered", "x_temporal_arith", "x_text_tfidf",
    *(f"x_tpch_q{i}" for i in range(1, 23) if i not in (10, 13, 14)),
    "x_asof_join_df", "x_interval_join_df", "x_dedup_first_df",
    "x_tumble_df", "x_hop_df", "x_session_df",
    "x_cep_times_df", "x_cep_optional_df",
    "x_mr_next", "x_mr_plus", "x_mr_optional", "x_mr_xvar",
    "x_mr_allrows", "x_mr_prev",
    # round-5 greens (CORRECTNESS_r05.json: 50/50 hash-green rows) —
    # the first fully green window; every contract entry now has a
    # recorded driver green across r01–r05.
    "x_retention", "x_stickiness", "x_substring_dedup", "x_bpe_merges",
    "x_sample_stratified", "x_doc_chunks", "x_dedup_incremental",
    "x_dedup_containment", "x_decontaminate", "x_pii_redact",
    "x_quality_rules", "x_kmeans", "x_sessionize", "x_token_quota",
    "x_semdedup", "x_bm25", "x_rrf_fusion", "x_dsir_sample",
    "x_lm_surprisal", "x_temperature_mix", "x_ann_lsh_top1", "x_ann_pq",
    "x_sketch_theta", "x_ddl_roundtrip", "x_ddl_options_hint",
    "x_sketch_hll", "x_heavy_hitters", "x_quantiles", "x_bloom_prune",
    "x_hll_union", "x_mad_outliers", "x_quantiles_grouped",
    "x_tpch_q10", "x_tpch_q13", "x_tpch_q14", "x_cdc_canal",
    "x_multimodal_decode", "x_graph_triangles", "x_graph_pagerank",
    "x_graph_sssp", "x_cep_funnel3", "x_mr_skip_to_last", "x_mr_agg",
    "x_mr_allrows_running", "x_mr_offsets",
    "q01", "q02", "q03", "q04", "q05",
    # round-6 greens (CORRECTNESS_r06.json: 50/50 hash-green rows —
    # the 3 new round-6 entries + 47 re-verified proven ones).  With
    # these appended every r01–r06 entry has a recorded driver green;
    # the round-7 window leads with whatever round 7 adds.
    "x_repetition", "x_session_dynamic", "x_cep_overlap_opt",
    # round-7 greens (CORRECTNESS_r07.json: 50/50 hash-green rows —
    # the 28 new round-7 entries + q01–q22 re-verifies).  All 181
    # entries now have a recorded green across r01–r07; the round-8
    # window leads with round-8 additions plus re-verification of
    # whatever code round 8 touches (MR/CEP entries, per the NFA
    # fold/resolve fixes).
    "x_dedup_cosine_lsh", "x_mr_backtrack",
    "x_tapi_agg", "x_tapi_window", "x_tapi_over", "x_tapi_join_setops",
    "x_ds_maxby", "x_ds_reduce",
    "x_tpcds_channels", "x_tpcds_rollup", "x_tpcds_share",
    "x_tpcds_exists_chain", "x_tpcds_yoy", "x_tpcds_moving_avg",
    "x_tpcds_cumulative", "x_tpcds_frequent", "x_tpcds_multicount",
    "x_tpcds_basket", "x_tpcds_channel_delta", "x_tpcds_cross_nation",
    "x_tpcds_dual_rank", "x_tpcds_intersect", "x_tpcds_period_vs_avg",
    "x_tpcds_pivot", "x_tpcds_rebuy", "x_tpcds_returns_net",
    "x_tpcds_rollup_rank", "x_tpcds_year_pair",
    # round-8 greens (CORRECTNESS_r08.json: 50/50 hash-green rows —
    # the 5 new round-8 entries + the MR/CEP/DDL/Table-API/DataStream
    # re-verifies per _REVERIFY_FIRST).  All 186 entries now have a
    # recorded driver green across r01–r08; the round-9 window leads
    # with round-9 additions plus re-verification of touched modules.
    "x_hive_dialect", "x_catalog_qualified", "x_cep_any",
    "x_mr_alternation", "x_mr_group_funnel",
    # round-9 greens (CORRECTNESS_r09.json: 50/50 hash-green rows —
    # the 22 new round-9 entries + the 28 _REVERIFY_FIRST re-verifies
    # covering every module round 9 touched).  All 209 entries now
    # have a recorded driver green across r01–r09; the round-10
    # window leads with round-10 additions plus re-verification of
    # touched modules.
    "x_mr_composed", "x_mr_subset", "x_mr_multikey",
    "x_hive_multi_insert", "x_ddl_like", "x_fuzzy_link",
    "x_tpcds_rollup_share", "x_tpcds_except_chain",
    "x_tpcds_union_distinct", "x_tpcds_case_ladder",
    "x_tpcds_above_avg", "x_tpcds_ratio_slices", "x_tpcds_multi_hop",
    "x_tpcds_or_bands", "x_tpcds_best_worst", "x_tpcds_attr_filter",
    "x_tpcds_in_or_exists", "x_tpcds_window_band",
    "x_tpcds_no_returns", "x_tpcds_excess_discount",
    "x_tpcds_supplier_exclusion", "x_tpcds_triple_union",
    "x_tpcds_promo_share",
    # round-10 greens (CORRECTNESS_r10.json: 50/50 hash-green rows —
    # the 35 new round-10 entries + the 15 leading _REVERIFY_FIRST
    # re-verifies).  All 244 entries now have a recorded driver green
    # across r01–r10; the round-11 window leads with round-11
    # additions plus re-verification of touched modules.
    "x_sql_tumble", "x_sql_hop", "x_sql_session", "x_sql_lateral",
    "x_sql_system_time",
    "x_tpcds_week_seq", "x_tpcds_returns_ratio",
    "x_tpcds_distinct_buckets", "x_tpcds_multiyear_frequent",
    "x_tpcds_growth_gap", "x_tpcds_pricey_parts", "x_tpcds_top_nations",
    "x_tpcds_all_channels", "x_tpcds_half_avg_parts",
    "x_tpcds_brand_month", "x_tpcds_big_baskets", "x_tpcds_before_after",
    "x_tpcds_month_vs_year", "x_tpcds_week_over_week",
    "x_tpcds_prefix_union", "x_tpcds_minus_returns",
    "x_tpcds_ship_latency", "x_tpcds_grouping_sets",
    "x_tpcds_hour_slices", "x_tpcds_variance_band",
    "x_tpcds_channel_overlap", "x_tpcds_band_stats",
    "x_tpcds_class_share", "x_tpcds_prefix_intersect",
    "x_tpcds_quarter_trend", "x_tpcds_weekday_pivot",
    "x_tpcds_channel_exclusives", "x_tpcds_pivot_multi",
    "x_tpcds_chain_report", "x_tpcds_null_channel",
    # round-11 greens (CORRECTNESS_r11.json: 50/50 hash-green rows —
    # the 16 new round-11 entries + 25 _REVERIFY_FIRST re-verifies +
    # q01–q09).  All 260 entries now have a recorded driver green
    # across r01–r11; the round-12 window leads with round-12
    # additions plus re-verification of touched modules.
    "x_tpcds_lag_lead", "x_tpcds_year_ratio", "x_tpcds_net_decline",
    "x_tpcds_return_outliers", "x_tpcds_null_retention",
    "x_tpcds_case_choose", "x_tpcds_rank_rollup", "x_tpcds_chain_stats",
    "x_tpcds_cross_year_pair", "x_tpcds_two_supplier",
    "x_tpcds_returns_share3", "x_tpcds_demand_variance",
    "x_tpcds_or_subquery", "x_tpcds_balanced_channels",
    "x_tpcds_triple_growth", "x_mr_quantified_tail",
}


# Unproven entries exceeding the 50-row driver window are deferred in
# this order: shared-text TPC-H shapes first (one SQL string runs on
# both engines, so a driver row adds the least new information).
# Round 7: every r01–r06 entry has a recorded green, so the window
# leads with the new round-7 entries (TPC-DS-shaped battery + LSH
# regime) and re-verifies proven ones — nothing needs deferring.
_DEFER_FIRST: tuple[str, ...] = ()

# With all entries proven (r01–r11), re-verification slots go first to
# entries whose implementation the CURRENT round touched — round 12
# changes streaming/sql_over.py + streaming/over.py (ADVICE fixes,
# append-only Top-N, proctime OVER: pytest-covered, no declared
# entries), operators/skew.py + session-window salting (so the session
# and salted-agg entries re-verify), then rotates the OLDEST driver
# greens (r03: ANN/CDC/graph/lookup entries last re-verified eight
# rounds ago) back through the window.
_REVERIFY_FIRST: tuple[str, ...] = (
    "x_salted_agg", "x_sessionize", "x_session_dynamic",
    "x_sql_session", "x_session_df", "x_multimodal_decode",
    "x_ann_ivf", "x_ann_quantized", "x_ann_top1", "x_ann_lsh_top1",
    "x_ann_pq", "x_knn_label", "x_lookup_join", "x_cdc_debezium",
    "x_cdc_canal", "x_connected_components", "x_count_window_df",
    "x_dedup_cosine", "x_dedup_simhash", "x_pipeline_clean",
    "x_topn_df", "x_graph_triangles", "x_graph_pagerank",
    "x_graph_sssp", "x_dedup_exact", "x_dedup_minhash",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        qid: _declared_runner(declared.spark_text(qid)) for qid in declared.QUERIES
    }
    out.update(ext_registry.queries())
    fresh = {k: v for k, v in out.items() if k not in _DRIVER_GREEN_HISTORY}
    deferred = {k: fresh.pop(k) for k in _DEFER_FIRST if k in fresh}
    proven = {k: v for k, v in out.items() if k in _DRIVER_GREEN_HISTORY}
    reverify = {k: proven.pop(k) for k in _REVERIFY_FIRST if k in proven}
    return {**fresh, **deferred, **reverify, **proven}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted → rows-only check)."""
    out = {qid: declared.oracle_text(sql) for qid, sql in declared.QUERIES.items()}
    out.update(ext_registry.oracle_sql())
    return out
