"""Query registry — the driver-facing correctness surface.

Every implemented operator from SURVEY §2 registers here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) an equivalent DuckDB oracle SQL string over the fixture
views. ``__spark_entry__.py`` re-exports this registry to the driver.

Cross-engine determinism rules used throughout the suites:

- column names are aliased identically on both sides (the driver's compare
  sorts columns by name before hashing).
- per-row arithmetic (IEEE doubles) is bit-identical across engines when
  both evaluate the same expression tree — no rounding needed.
- multi-row float aggregates (SUM/AVG over doubles) can differ in the last
  ulp due to accumulation order → both sides round the *final* aggregate
  (round(x, N)); integral-valued double sums are exact and not rounded.
- LIMIT queries sort on a key-unique prefix so the selected set is
  deterministic.
- casts from fractional doubles to integers are avoided (Spark truncates,
  DuckDB rounds); ``floor()`` first when integer semantics are wanted.
- "now" is frozen per domain (orders: 2002-01-01, events: 2024-02-01).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, None = rows-only check
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, bench: bool = False):
    """Register a query. ``oracle=None`` → driver runs a weaker rows-only
    check (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, bench=bench)
        return fn

    return deco


# Names with a green driver CORRECTNESS row (r1 ∪ r2 ∪ r3) whose semantics
# are unchanged since that row was recorded. The driver verifies the first
# 50 registered queries per round, so ``get_registry`` front-loads
# everything NOT in this set — new queries and queries whose semantics
# changed since their last green row.
_DRIVER_VERIFIED: frozenset[str] = frozenset(
    {
        "a10_resource_utilization", "a11_derived_indicators",
        "a12_batch_accounting", "a13_efficiency_score",
        "a14_baseline_comparison", "a16_percentiles",
        "a17_count_scalar", "a1_count_by_status", "a2_type_hour_counts",
        "a3_metric_rollup_by_group", "a4_rollup_idlist",
        "a6_rollup_time_range", "a7_avg_positive", "a8_avg_error_rate",
        "a9_benchmarks_minmax", "agg_rollup_hierarchy",
        "approx_distinct_bound", "approx_quantile_bound",
        "clean_corpus_stats", "clean_decontaminate", "clean_pii_scrub",
        "clean_repetition_metrics", "dedup_clusters",
        "dedup_embedding_cosine", "dedup_exact", "dedup_minhash_lsh",
        "dedup_ngram_jaccard", "dedup_simhash",
        "dedup_simhash_near_dup", "dq_constraint_violations",
        "f14_validation_predicates", "f15_f16_timestamp_roundtrip",
        "f18_window_ids",
        "f20_roles_roundtrip", "f21_json_extract", "f22_json_construct",
        "f_string_functions", "j1_events_users",
        "j2_fact_dim_broadcast", "j3_left_join_rollup", "j4_anti_join",
        "j5_semi_join", "j_asof_clicks_purchases",
        "j_range_promo_windows", "mm_binary_metadata",
        "mm_decoded_features", "mm_frame_sample", "mm_resize_meta",
        "monitor_jobs_pipeline", "o2_topn", "o3_pagination",
        "p11_log_query_pipeline", "p12_substring_search",
        "p13_regex_search", "p16_required_field_split", "p3_key_lookup",
        "p4_filter_status", "p5_filter_type", "p6_filter_inlist",
        "p7_range_filter", "p8_valid_sessions",
        "p9_subscription_routing", "pipeline_dedup_apply",
        "pipeline_mixture_sample", "pipeline_token_budget",
        "s2_scan_ordered", "sample_hash", "sample_stratified",
        "setop_except", "setop_intersect", "setop_union_distinct",
        "sim_bruteforce_topk", "sim_ivf_assignments", "sim_ivf_topk",
        "sim_lsh_bucket_stats", "sim_lsh_bucketed_topk",
        "st11_state_transitions", "st3_priority_batches",
        "st5_rate_limit_dual_windows", "st5_rate_limit_windows",
        "st6_threshold_alerts", "st7_progress_throttle",
        "st9_stream_filter", "text_fingerprint", "text_lang_id",
        "text_ngram_vocab", "text_quality_features", "text_token_stats",
        "tpch_q10_returned_items", "tpch_q11_important_parts",
        "tpch_q12_priority_lines", "tpch_q13_customer_distribution",
        "tpch_q14_promo_effect", "tpch_q15_top_supplier",
        "tpch_q16_part_supplier_counts", "tpch_q17_small_qty_revenue",
        "tpch_q18_large_orders", "tpch_q19_disjunctive",
        "tpch_q1_pricing_summary", "tpch_q20_excess_shipments",
        "tpch_q21_waiting_suppliers", "tpch_q22_dormant_customers",
        "tpch_q2_min_bal_supplier", "tpch_q3_shipping_priority",
        "tpch_q4_order_priority", "tpch_q5_region_revenue",
        "tpch_q6_forecast_revenue", "tpch_q7_volume_shipping",
        "tpch_q8_market_share", "tpch_q9_product_profit",
        "train_cross_source_leakage", "train_emb_norm_stats",
        "train_length_histogram", "train_pack_sequences",
        "train_unigram_lm_score", "train_vocab_coverage",
        "transformer_rules", "w1_running_peak", "w2_first_error_time",
        "w3_recent_ring_buffer", "w4_retention_caps", "w5_ewma",
        "w_moving_avg", }
)


def get_registry() -> dict[str, QuerySpec]:
    """Import all suites (idempotent) and return the full registry,
    ordered so driver-unverified queries come first (the driver checks
    the first 50 registered queries each round, in order)."""
    from rclabsapi_spark.suites import (  # noqa: F401
        core,
        events,
        llm,
        metrics_ext,
        tpch_ext,
        transform,
    )
    # Registered last, cleaning before approx (NOT alphabetical): of the
    # >50 driver-unverified queries, the ones that overflow the driver's
    # 50-query window should be the newest additions.
    from rclabsapi_spark.suites import cleaning  # noqa: F401
    from rclabsapi_spark.suites import approx  # noqa: F401
    from rclabsapi_spark.suites import pipeline  # noqa: F401
    from rclabsapi_spark.suites import timeseries  # noqa: F401
    from rclabsapi_spark.suites import tpch_full  # noqa: F401
    from rclabsapi_spark.suites import training  # noqa: F401

    ordered = sorted(
        _REGISTRY.values(), key=lambda s: s.name in _DRIVER_VERIFIED
    )
    return {s.name: s for s in ordered}
