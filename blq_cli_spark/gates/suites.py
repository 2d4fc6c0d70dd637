"""Merged gate suites: several member gates unioned into one driver row.

The driver's CORRECTNESS harness checks only the first 50 registered
gates, so families with many small shapes (sorts, windows, filters, set
ops, stat aggs) are merged here into union-suites: each member's output
is stringified into a fixed-width (part, c1..cN) schema and unioned, on
both the Spark side and the DuckDB oracle side. One suite row in the
driver window therefore hash-checks every member's full result set.

Formatting rules (must agree across engines):
- ints/strings cast directly to VARCHAR;
- doubles cast through DECIMAL(28,6) first — both engines then render a
  fixed six-decimal form, sidestepping shortest-repr differences;
- member gates that emit timestamps already format them to strings.

The member gates stay registered individually (after the driver's
50-gate window) so tests/test_gate_parity.py still verifies each one
separately.
"""

from __future__ import annotations

from contextlib import nullcontext as _nullcontext

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from blq_cli_spark.gates import (
    aggs,
    analytics_ext,
    context_ops,
    events_ts,
    llmdata,
    multimodal_gates,
    relational,
    scalar_fns,
    tpch,
    windows,
)
from blq_cli_spark.gates.registry import gate, oracle_of

# part -> (query_fn, [(column, kind)]) where kind 'd' = double (decimal
# formatting) and 's' = directly VARCHAR-castable
_SPECS = {
    "o_sort_suite": [
        ("o2", windows.o2_global_topk,
         [("o_orderkey", "s"), ("o_custkey", "s"), ("totalprice", "d")]),
        ("o3", windows.o3_limit_offset,
         [("o_orderkey", "s"), ("orderdate", "s")]),
        ("o4", windows.o4_order_by_expression,
         [("n_nationkey", "s"), ("n_name", "s"), ("dist", "s")]),
    ],
    "w_serial_latest_suite": [
        ("w1", windows.w1_global_serial, [("event_id", "s"), ("serial", "s")]),
        ("w2", windows.w2_latest_per_group,
         [("user_id", "s"), ("event_id", "s"), ("event_type", "s"), ("ts_str", "s")]),
    ],
    "w_analytics_suite": [
        ("lag_gap", windows.w_lag_gap_stats,
         [("user_id", "s"), ("n_gaps", "s"), ("avg_gap_s", "d"), ("max_gap_us", "s")]),
        ("topn", windows.w_topn_per_group,
         [("c_mktsegment", "s"), ("o_orderkey", "s"), ("totalprice", "d"), ("rn", "s")]),
        ("cumsum", windows.w_cumulative_user_value,
         [("user_id", "s"), ("event_id", "s"), ("running_total", "d")]),
        ("rankdist", windows.w_rank_distributions,
         [("o_orderkey", "s"), ("quartile", "s"), ("pct_rank", "d"),
          ("cume", "d")]),
    ],
    "p_filter_suite": [
        ("in_eq", relational.p_in_and_eq_filter,
         [("o_orderstatus", "s"), ("o_orderpriority", "s"), ("n", "s"), ("total", "d")]),
        ("ilike", relational.p_ilike_pattern,
         [("p_partkey", "s"), ("p_name", "s"), ("p_brand", "s"), ("p_retailprice", "d")]),
        ("exclude", relational.p_exclude_invert,
         [("c_nationkey", "s"), ("n_customers", "s")]),
        ("ci_eq", relational.p_case_insensitive_eq, [("n", "s")]),
    ],
    "u_setops_suite": [
        ("union_all", relational.u1_union_all,
         [("bucket", "s"), ("o_orderkey", "s"), ("totalprice", "d")]),
        ("except", relational.u2_except_distinct, [("o_custkey", "s")]),
        ("intersect", relational.u3_intersect, [("o_custkey", "s")]),
    ],
    "a_stats_suite": [
        ("filtered_counts", aggs.a2_filtered_counts,
         [("user_id", "s"), ("total", "s"), ("errors", "s"), ("purchases", "s"),
          ("purchase_value", "d")]),
        ("filtered_distinct", aggs.a3_filtered_distinct_count,
         [("event_type", "s"), ("n_users", "s"), ("n_users_highvalue", "s")]),
        ("minmax", aggs.a4_minmax_stats,
         [("o_orderstatus", "s"), ("min_price", "d"), ("max_price", "d"),
          ("avg_price", "d"), ("first_order", "s"), ("last_order", "s")]),
    ],
    "a_counts_suite": [
        ("value_counts", aggs.a6_value_counts, [("event_type", "s"), ("n", "s")]),
        ("having", aggs.a7_having,
         [("p_brand", "s"), ("n", "s"), ("avg_price", "d")]),
    ],
    "a_json_scalars_suite": [
        ("collect_json", aggs.a10_collect_json,
         [("c_mktsegment", "s"), ("nations_json", "s"), ("n", "s")]),
        ("global_scalars", aggs.a11_global_scalars,
         [("n_orders", "s"), ("n_customers", "s"), ("total_value", "d"),
          ("missing_total", "d"), ("max_orderkey", "s")]),
        # round 5: folded in to free a driver-window slot for x_lm_suite
        ("count_page", context_ops.o6_count_before_limit,
         [("total_count", "s"), ("page_json", "s")]),
    ],
    # round 4: three merges freeing driver-window slots for the new
    # flagship gates (quality suite, dedup clusters, source mix,
    # quantization, and the q7/q12/q14/q19 TPC-H shapes)
    "f_scalar_suite": [
        ("case_coalesce", scalar_fns.f_case_coalesce,
         [("o_orderkey", "s"), ("status_label", "s"), ("size_bucket", "s"),
          ("priority", "s")]),
        ("regexp", scalar_fns.f_regexp_grep,
         [("doc_id", "s"), ("has_kw", "s"), ("n_data", "s"),
          ("word_before_join", "s")]),
        ("json_extract", scalar_fns.f_json_extract,
         [("k_mod", "s"), ("n", "s"), ("total_value", "d")]),
        ("struct_json", scalar_fns.f_struct_json,
         [("n_name", "s"), ("info_json", "s")]),
    ],
    "ts_suite": [
        ("tumbling", events_ts.ts_tumbling_window,
         [("wstart", "s"), ("event_type", "s"), ("n", "s"), ("total_value", "d")]),
        ("sessionize", events_ts.ts_sessionize,
         [("user_id", "s"), ("n_sessions", "s"), ("n_events", "s")]),
        ("error_rate", events_ts.ts_error_rate_by_day,
         [("day", "s"), ("n_total", "s"), ("n_errors", "s"), ("error_rate", "d")]),
        ("topk_users", events_ts.ts_topk_active_users,
         [("user_id", "s"), ("n_events", "s"), ("n_types", "s"), ("last_seen", "s")]),
    ],
    "j_small_suite": [
        ("anti", relational.j5_anti_join,
         [("c_custkey", "s"), ("c_mktsegment", "s")]),
        ("semi", relational.j_semi_join,
         [("s_suppkey", "s"), ("s_name", "s")]),
        ("range_buckets", relational.j7_range_join_buckets,
         [("label", "s"), ("n", "s"), ("total", "d")]),
    ],
    # round 5: driver-window rotation (VERDICT r4 ask #3) — the round-4
    # additions (grouping sets, pivot, winnowing, unigram LM, source KL)
    # get driver-hash rows via two union-suites; rollup/percentiles/
    # group-by-all fold into the OLAP suite to free the slots
    "a_olap_suite": [
        ("grouping_sets", analytics_ext.a_grouping_sets,
         [("priority", "s"), ("status", "s"), ("n_orders", "s"),
          ("total_price", "d")]),
        ("pivot", analytics_ext.a_pivot_status_by_priority,
         [("priority", "s"), ("n_open", "s"), ("n_filled", "s"),
          ("n_partial", "s")]),
        ("rollup", aggs.a_rollup_hierarchy,
         [("event_type", "s"), ("user_bucket", "s"), ("n", "s"),
          ("total", "d"), ("gid", "s")]),
        ("percentiles", aggs.a_percentiles,
         [("event_type", "s"), ("p50", "d"), ("p95", "d"), ("p99", "d")]),
        ("group_by_all", context_ops.a8_group_by_all,
         [("event_type", "s"), ("day", "s"), ("n", "s"), ("total", "d")]),
    ],
    # round 6: rotate the 9 previously-local-only deep TPC-H shapes
    # (VERDICT r5 ask #2) into the driver window as one union gate;
    # q15 folds in too, freeing its individual slot for the suite row.
    # These are the most complex relational plans in the repo (deepest
    # join tree, correlated scalar subqueries, NOT EXISTS + EXISTS pair,
    # two-level aggregation, min-cost correlated join).
    "q_deep_suite": [
        ("q2", tpch.q2_min_cost_supplier,
         [("s_acctbal", "d"), ("s_name", "s"), ("n_name", "s"),
          ("p_partkey", "s"), ("p_name", "s"), ("supplycost", "d")]),
        ("q8", tpch.q8_market_share, [("o_year", "s"), ("mkt_share", "d")]),
        ("q9", tpch.q9_product_type_profit,
         [("nation", "s"), ("o_year", "s"), ("sum_profit", "d")]),
        ("q11", tpch.q11_important_stock, [("partkey", "s"), ("val", "d")]),
        ("q13", tpch.q13_customer_distribution,
         [("c_count", "s"), ("custdist", "s")]),
        ("q16", tpch.q16_supplier_relationship,
         [("p_brand", "s"), ("p_type", "s"), ("p_size", "s"),
          ("supplier_cnt", "s")]),
        ("q17", tpch.q17_small_quantity_revenue, [("avg_yearly", "d")]),
        ("q20", tpch.q20_promotion_suppliers,
         [("s_name", "s"), ("s_acctbal", "d")]),
        ("q21", tpch.q21_waiting_suppliers,
         [("s_name", "s"), ("numwait", "s")]),
        ("q15", tpch.q15_top_supplier,
         [("s_suppkey", "s"), ("s_name", "s"), ("total_revenue", "d")]),
        # round 6 (second rotation): q22 folds in to free a window slot
        # for x_parse_suite
        ("q22", tpch.q22_dormant_customers,
         [("c_nationkey", "s"), ("numcust", "s"), ("totacctbal", "d")]),
    ],
    "x_lm_suite": [
        ("winnow", llmdata.x_winnow_tokens,
         [("doc_id", "s"), ("n_subword_tokens", "s"), ("n_fingerprints", "s")]),
        ("unigram", llmdata.x_unigram_logprob,
         [("doc_id", "s"), ("n_tokens", "s"), ("avg_logprob", "d")]),
        ("source_kl", llmdata.x_source_kl,
         [("source", "s"), ("kl_vs_corpus", "d")]),
        ("bigram", llmdata.x_bigram_logprob,
         [("doc_id", "s"), ("n_bigrams", "s"), ("avg_logprob", "d")]),
        ("pack", llmdata.x_sequence_packing,
         [("id", "s"), ("n_tokens", "s"), ("tok_offset", "s"), ("bin", "s")]),
        # round 5 late additions: DSIR selection weights + chunking ride
        # the same driver row
        ("dsir", llmdata.x_dsir_weights,
         [("doc_id", "s"), ("n_tokens", "s"), ("log_weight", "d")]),
        ("chunk", llmdata.x_chunk_documents,
         [("doc_id", "s"), ("chunk_idx", "s"), ("n_chunk_tokens", "s"),
          ("chunk_text", "s")]),
        ("shuffle", llmdata.x_training_shuffle,
         [("id", "s"), ("shuffle_key", "s"), ("shuffle_rank", "s")]),
        ("sample", llmdata.x_source_budget_sample,
         [("doc_id", "s"), ("source", "s"), ("sample_rank", "s")]),
        ("token_sample", llmdata.x_token_budget_sample,
         [("doc_id", "s"), ("source", "s"), ("n_tokens", "s"),
          ("tokens_before", "s")]),
        ("upsample", llmdata.x_upsample_sources,
         [("doc_id", "s"), ("source", "s"), ("epoch", "s")]),
        ("fertility", llmdata.x_tokenizer_fertility,
         [("lang", "s"), ("n_docs", "s"), ("n_words", "s"),
          ("n_subwords", "s"), ("fertility", "d")]),
        ("bpe_wordfreq", llmdata.x_bpe_word_frequencies,
         [("word", "s"), ("n", "s")]),
        ("ccnet", llmdata.x_ccnet_buckets,
         [("doc_id", "s"), ("lang", "s"), ("n_tokens", "s"),
          ("avg_logprob", "d"), ("ppl_bucket", "s")]),
        ("pmi", llmdata.x_pmi_pairs,
         [("w1", "s"), ("w2", "s"), ("n_pair", "s"), ("pmi", "d")]),
        ("zipf", llmdata.x_zipf_fit,
         [("n_types", "s"), ("slope", "d"), ("intercept", "d"), ("r2", "d")]),
        # round 6: trained char-bigram language-ID (model + scoring pass)
        ("langid_model", llmdata.x_langid_model,
         [("lang", "s"), ("gram", "s"), ("logp", "d")]),
        ("langid_scores", llmdata.x_langid_scores,
         [("id", "s"), ("lang", "s"), ("score", "d"), ("n_grams", "s"),
          ("n_matched", "s")]),
    ],
    "x_quality_suite": [
        ("repetition", llmdata.x_repetition_profile,
         [("doc_id", "s"), ("n_tokens", "s"), ("top_token_ratio", "d"),
          ("dup_2gram_ratio", "d"), ("dup_3gram_ratio", "d")]),
        ("pii", llmdata.x_pii_redaction,
         [("doc_id", "s"), ("n_emails", "s"), ("n_ipv4", "s"),
          ("n_phones", "s"), ("redacted", "s")]),
        ("langid", llmdata.x_langid_eval,
         [("lang", "s"), ("lang_pred", "s"), ("n", "s")]),
        ("decontaminate", llmdata.x_decontaminate,
         [("id", "s"), ("n_gram_hits", "s"), ("n_bench_docs", "s")]),
        # round 5 late additions ride the same driver row
        ("gopher", llmdata.x_gopher_rules,
         [("doc_id", "s"), ("n_tokens", "s"), ("token_count_ok", "s"),
          ("mean_word_len_ok", "s"), ("symbol_ratio_ok", "s"),
          ("alpha_word_ratio_ok", "s"), ("stopwords_ok", "s"), ("passes", "s")]),
        ("boilerplate", llmdata.x_boilerplate_removal,
         [("doc_id", "s"), ("n_spans", "s"), ("n_kept", "s"), ("clean_md5", "s")]),
        ("passages", llmdata.x_duplicate_passages,
         [("doc_id", "s"), ("start_tok", "s"), ("end_tok", "s"), ("n_windows", "s")]),
        ("semdedup", llmdata.x_semantic_dedup,
         [("id", "s"), ("cluster_id", "s"), ("kept", "s")]),
        # round 7: the bucketed (100 TB) form with a planted-cluster
        # closed-form oracle rides the same driver row
        ("semdedup_bkt", llmdata.x_semantic_dedup_bucketed,
         [("id", "s"), ("cluster_id", "s"), ("kept", "s")]),
        ("semdecon", llmdata.x_semantic_decontaminate,
         [("id", "s"), ("max_bench_cos", "d"), ("contaminated", "s")]),
        ("leakage_split", llmdata.x_leakage_safe_split,
         [("doc_id", "s"), ("split", "s")]),
        ("sweep", llmdata.x_threshold_sweep,
         [("threshold", "d"), ("n_kept", "s"), ("keep_rate", "d"),
          ("precision", "d"), ("recall", "d")]),
        ("html", llmdata.x_html_extract,
         [("doc_id", "s"), ("clean_text", "s")]),
        ("normalize", llmdata.x_normalize_text,
         [("doc_id", "s"), ("norm_text", "s")]),
        ("para_dedup", llmdata.x_dedup_paragraphs,
         [("doc_id", "s"), ("n_paragraphs", "s"), ("n_kept", "s"),
          ("clean_text", "s")]),
        ("c4_lines", llmdata.x_c4_line_rules,
         [("doc_id", "s"), ("n_lines", "s"), ("n_kept", "s"),
          ("clean_text", "s")]),
        ("l2norm", llmdata.x_l2_normalize,
         [("vec_id", "s"), ("c0", "d"), ("unit_norm", "d")]),
        ("decon_multi", llmdata.x_decontaminate_multi,
         [("id", "s"), ("benchmark", "s"), ("n_gram_hits", "s"),
          ("n_bench_docs", "s")]),
        ("gopher_lines", llmdata.x_gopher_line_rules,
         [("doc_id", "s"), ("n_lines", "s"), ("bullet_ratio", "d"),
          ("ellipsis_ratio", "d"), ("bullet_ok", "s"),
          ("ellipsis_ok", "s"), ("passes", "s")]),
        # round 6: perceptual image dedup (real PNG decode -> dHash ->
        # banded hamming join) rides the same driver row
        ("img_phash", multimodal_gates.x_image_phash,
         [("id", "s"), ("phash", "s")]),
        ("img_pairs", multimodal_gates.x_image_dedup_pairs,
         [("id_a", "s"), ("id_b", "s"), ("hamming", "s")]),
        # round 7: the audio (FFT) path's planted closed-form pair set
        ("aud_pairs", multimodal_gates.x_audio_dedup_pairs,
         [("id_a", "s"), ("id_b", "s"), ("hamming", "s")]),
        # round 7: dHash through the pure-Python baseline JPEG codec
        ("jpeg_phash", multimodal_gates.x_jpeg_phash,
         [("id", "s"), ("phash", "s")]),
    ],
}

# member names as registered (for oracle lookup)
_MEMBER_GATE = {
    "o2": "o2_global_topk",
    "o3": "o3_limit_offset",
    "o4": "o4_order_by_expression",
    "w1": "w1_global_serial",
    "w2": "w2_latest_per_group",
    "lag_gap": "w_lag_gap_stats",
    "topn": "w_topn_per_group",
    "cumsum": "w_cumulative_user_value",
    "rankdist": "w_rank_distributions",
    "in_eq": "p_in_and_eq_filter",
    "ilike": "p_ilike_pattern",
    "exclude": "p_exclude_invert",
    "ci_eq": "p_case_insensitive_eq",
    "union_all": "u1_union_all",
    "except": "u2_except_distinct",
    "intersect": "u3_intersect",
    "filtered_counts": "a2_filtered_counts",
    "filtered_distinct": "a3_filtered_distinct_count",
    "minmax": "a4_minmax_stats",
    "value_counts": "a6_value_counts",
    "having": "a7_having",
    "collect_json": "a10_collect_json",
    "global_scalars": "a11_global_scalars",
    "case_coalesce": "f_case_coalesce",
    "regexp": "f_regexp_grep",
    "json_extract": "f_json_extract",
    "struct_json": "f_struct_json",
    "tumbling": "ts_tumbling_window",
    "sessionize": "ts_sessionize",
    "error_rate": "ts_error_rate_by_day",
    "topk_users": "ts_topk_active_users",
    "anti": "j5_anti_join",
    "semi": "j_semi_join",
    "range_buckets": "j7_range_join_buckets",
    "count_page": "o6_count_before_limit",
    "grouping_sets": "a_grouping_sets",
    "pivot": "a_pivot_status_by_priority",
    "rollup": "a_rollup_hierarchy",
    "percentiles": "a_percentiles",
    "group_by_all": "a8_group_by_all",
    "winnow": "x_winnow_tokens",
    "unigram": "x_unigram_logprob",
    "source_kl": "x_source_kl",
    "bigram": "x_bigram_logprob",
    "pack": "x_sequence_packing",
    "dsir": "x_dsir_weights",
    "chunk": "x_chunk_documents",
    "shuffle": "x_training_shuffle",
    "sample": "x_source_budget_sample",
    "token_sample": "x_token_budget_sample",
    "upsample": "x_upsample_sources",
    "fertility": "x_tokenizer_fertility",
    "bpe_wordfreq": "x_bpe_word_frequencies",
    "ccnet": "x_ccnet_buckets",
    "repetition": "x_repetition_profile",
    "pii": "x_pii_redaction",
    "langid": "x_langid_eval",
    "decontaminate": "x_decontaminate",
    "gopher": "x_gopher_rules",
    "boilerplate": "x_boilerplate_removal",
    "passages": "x_duplicate_passages",
    "semdedup": "x_semantic_dedup",
    "semdedup_bkt": "x_semantic_dedup_bucketed",
    "semdecon": "x_semantic_decontaminate",
    "leakage_split": "x_leakage_safe_split",
    "sweep": "x_threshold_sweep",
    "html": "x_html_extract",
    "normalize": "x_normalize_text",
    "para_dedup": "x_dedup_paragraphs",
    "c4_lines": "x_c4_line_rules",
    "l2norm": "x_l2_normalize",
    "gopher_lines": "x_gopher_line_rules",
    "decon_multi": "x_decontaminate_multi",
    "pmi": "x_pmi_pairs",
    "zipf": "x_zipf_fit",
    "q2": "q2_min_cost_supplier",
    "q8": "q8_market_share",
    "q9": "q9_product_type_profit",
    "q11": "q11_important_stock",
    "q13": "q13_customer_distribution",
    "q16": "q16_supplier_relationship",
    "q17": "q17_small_quantity_revenue",
    "q20": "q20_promotion_suppliers",
    "q21": "q21_waiting_suppliers",
    "q15": "q15_top_supplier",
    "q22": "q22_dormant_customers",
    "img_phash": "x_image_phash",
    "img_pairs": "x_image_dedup_pairs",
    "aud_pairs": "x_audio_dedup_pairs",
    "jpeg_phash": "x_jpeg_phash",
    "langid_model": "x_langid_model",
    "langid_scores": "x_langid_scores",
}


def _spark_part(df: DataFrame, part: str, cols, width: int) -> DataFrame:
    out = [F.lit(part).alias("part")]
    for i, (name, kind) in enumerate(cols):
        c = F.col(name)
        if kind == "d":
            c = c.cast("decimal(28,6)")
        out.append(c.cast("string").alias(f"c{i + 1}"))
    for i in range(len(cols), width):
        out.append(F.lit(None).cast("string").alias(f"c{i + 1}"))
    return df.select(out)


def _oracle_part(part: str, cols, width: int) -> str:
    casts = []
    for i, (name, kind) in enumerate(cols):
        src = f"CAST({name} AS DECIMAL(28,6))" if kind == "d" else name
        casts.append(f"CAST({src} AS VARCHAR) AS c{i + 1}")
    for i in range(len(cols), width):
        casts.append(f"CAST(NULL AS VARCHAR) AS c{i + 1}")
    inner = oracle_of(_MEMBER_GATE[part])
    return f"SELECT '{part}' AS part, {', '.join(casts)} FROM (\n{inner}\n)"


# Round 11 (VERDICT r10 ask #5): the LLM suites' members each scanned
# `documents` (and the semantic members `embeddings`) independently —
# ~20 redundant corpus reads per suite build, and a union plan whose
# every arm repeats the scan lineage. Inside these suites, table()
# serves ONE eagerly-checkpointed copy per table (sources.tables.
# shared_tables); member outputs are byte-identical (same rows, same
# lineage semantics), so the suite oracle hashes are unchanged. The
# TPC-H deep suite deliberately stays on direct scans: its members
# prune lineitem to narrow column subsets at the parquet footer, which
# a full-width checkpoint would forfeit.
_SHARED_TABLES = {
    "x_lm_suite": ("documents",),
    "x_quality_suite": ("documents", "embeddings"),
}


def _make_suite(suite_name: str) -> None:
    parts = _SPECS[suite_name]
    width = max(len(cols) for _, _, cols in parts)
    oracle = "\nUNION ALL\n".join(_oracle_part(p, cols, width) for p, _, cols in parts)
    shared = _SHARED_TABLES.get(suite_name, ())

    def run(
        spark: SparkSession, sf_dir: str, _parts=parts, _w=width, _sh=shared
    ) -> DataFrame:
        from blq_cli_spark.sources.tables import shared_tables

        with shared_tables(spark, sf_dir, _sh) if _sh else _nullcontext():
            out = None
            for p, fn, cols in _parts:
                piece = _spark_part(fn(spark, sf_dir), p, cols, _w)
                out = piece if out is None else out.unionByName(piece)
            return out

    run.__name__ = suite_name
    run.__doc__ = (
        f"Union-suite over member gates: "
        f"{', '.join(_MEMBER_GATE[p] for p, _, _ in parts)}. "
        "Each member's full result set rides in stringified (part, c1..cN) "
        "rows so one driver CORRECTNESS row hash-checks them all."
    )
    gate(suite_name, oracle=oracle)(run)


for _name in _SPECS:
    _make_suite(_name)
