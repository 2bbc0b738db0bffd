"""Query registry: the driver-facing inventory of engine operators.

Every implemented operator from SURVEY.md §2 registers here twice:

- a PySpark implementation ``(spark, sf_dir) -> DataFrame``;
- (when SQL-expressible) an ANSI-SQL oracle string that DuckDB runs
  on the same Parquet tables for differential correctness checking.

Registration is decorator-based so each operator module keeps its
query and oracle side by side. ``collect()`` imports all operator
modules and returns the merged registries — ``__spark_entry__.py`` is
a thin shim over it.

Alias discipline (the correctness gate hashes values under sorted
column names): every computed/aggregate column is aliased identically
in the Spark code and the SQL, and floating-point aggregates are
rounded identically on both sides so accumulation-order differences
between engines cannot flip the hash.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_OPERATOR_MODULES = [
    "etl_geonames_spark.operators.relational",
    "etl_geonames_spark.operators.sql_queries",
    "etl_geonames_spark.operators.functions",
    "etl_geonames_spark.operators.timeseries",
    "etl_geonames_spark.operators.udfs",
    "etl_geonames_spark.operators.llm",
    "etl_geonames_spark.operators.multimodal",
    "etl_geonames_spark.operators.pit",
    "etl_geonames_spark.operators.geo",
    "etl_geonames_spark.operators.pipeline_ops",
    "etl_geonames_spark.operators.curation",
    "etl_geonames_spark.operators.graph",
    "etl_geonames_spark.operators.reshape",
    "etl_geonames_spark.operators.search",
]

# The differential driver records correctness rows for the FIRST 50
# queries in ``queries()`` dict order each round. Round 1's window
# covered the 42 relational queries + 8 sql_queries entries (all green
# except sql_tpch_q12, whose oracle cast is now fixed). This list puts
# the not-yet-driver-verified queries — plus q12 for re-verification —
# at the front so round 2's window covers them; everything already
# proven green rides in the back (still guarded by the local
# tests/test_oracle_parity.py suite, which checks ALL queries).
#
# ROUND-3 ROTATION PLAN (do this first thing next round): once
# CORRECTNESS_r02 confirms the first 50 green, move them to the back
# and promote, in order: (a) the round-3 front-runners below
# (positions 51+ — udfs, multimodal, session-2 additions), then
# (b) the never-driver-checked round-1 modules: geo, pipeline_ops,
# curation, graph, reshape + the ten session-1 TPC-H shapes
# (q1/q2/q7-q11/q15/q20/q21). That fills round 3's 50-row window
# entirely with first-time verifications again.
_DRIVER_PRIORITY = [
    "sql_tpch_q12",  # r1 hash-fail (DuckDB HUGEINT vs BIGINT) — re-verify
    # functions (15)
    "fn_cast_double", "fn_concat_ws", "fn_concat", "fn_replace",
    "fn_prefix_match", "fn_array_compact", "fn_map_lookup", "fn_math",
    "fn_date_trunc", "fn_string_ops", "fn_regexp", "fn_null_ops",
    "fn_date_extract", "fn_variant_get", "fn_json_extract",
    # llm (20)
    "llm_dedup_exact", "llm_dedup_minhash", "llm_dedup_simhash",
    "llm_dedup_ngram", "llm_sim_topk", "llm_ann_lsh", "llm_dedup_embedding",
    "llm_dedup_verified", "llm_dedup_cluster", "llm_dedup_canonical",
    "llm_sample_stratified", "llm_pack_sequences", "llm_tfidf_top_terms",
    "llm_wordcount", "llm_text_stats", "llm_lang_dist", "llm_lang_id",
    "llm_quality_score", "llm_token_count", "llm_fingerprint",
    # pit (3)
    "project_pit", "rel_liesin", "pit_pipeline",
    # timeseries (6)
    "stream_tumbling", "stream_sliding", "ts_funnel",
    "ts_cohort_retention", "ts_gap_fill", "stream_session",
    # sql_queries not in r1's window (5) — completes the 50-row window
    "sql_tpch_q19", "sql_tpch_q13", "sql_tpch_q17", "sql_tpch_q22",
    "sql_grouping_sets",
    # round-3 front-runners
    "udf_scalar", "udf_grouped_map", "udf_agg", "udtf_python",
    "udtf_explode", "mm_decode_stub", "mm_frame_sample",
    "fn_higher_order", "llm_ann_ivf",
    "llm_bm25_topk", "llm_inverted_index", "llm_token_entropy",
    "ts_rollup_hierarchy", "ts_ewma", "llm_dedup_paragraphs",
    "ts_winsorize", "join_asof_nearest", "profile_skew",
    "sql_recursive_cte", "sql_lateral_topk", "join_null_safe",
    "udf_map_in_arrow", "llm_unigram_logprob", "fn_collation",
    "llm_quantize_embeddings", "llm_curate_pipeline", "fn_explode_outer",
    "fn_xml_roundtrip", "llm_dedup_report", "llm_bigram_f1",
    "geo_polyline_length", "llm_dataset_card", "sql_pivot",
    "fn_aes_roundtrip", "graph_degree_distribution", "win_distinct_rolling",
    "agg_regression", "ts_seasonal_profile", "dq_contract_check",
    "win_nth_value", "fn_date_arith", "llm_hard_negatives",
    "llm_class_balance", "ts_max_gap", "fn_crypto_hash",
    "sql_window_clause", "llm_mask_tokens", "llm_vocab_coverage",
    "llm_dedup_incremental", "ts_weekly_active", "ts_funnel_windowed",
    "udf_scalar_iter", "scd2_asof_lookup", "agg_string_concat",
    "graph_reciprocity", "fn_surrogate_key", "ts_sli_availability",
    "llm_apply_mix_weights", "fn_printf", "sql_filter_clause",
    "fn_base64_roundtrip", "agg_higher_moments", "llm_bigram_logprob",
    "geo_extent_by_group",
]


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query implementation and (optionally) its SQL oracle.

    ``oracle=None`` marks a genuinely non-SQL-expressible operator
    (approximate/stateful/UDF-defined) — the driver then records a
    weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(
                f"duplicate query name {name!r} — a dict overwrite would "
                "silently drop one implementation from the driver contract"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    missing = [n for n in _DRIVER_PRIORITY if n not in QUERIES]
    if missing:
        raise ValueError(
            f"_DRIVER_PRIORITY names unregistered queries: {missing} — "
            "a typo here would silently shrink driver coverage"
        )
    prioritized = set(_DRIVER_PRIORITY)
    order = _DRIVER_PRIORITY + [n for n in QUERIES if n not in prioritized]
    queries = {n: QUERIES[n] for n in order}
    oracles = {n: ORACLES[n] for n in order if n in ORACLES}
    return queries, oracles
