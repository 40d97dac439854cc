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
# (Window history r5-r7 lives in git; the standing rule: lead each
# round with every entry whose plan/semantics/source changed since its
# last driver row, then the stalest remaining rows.)
#
# r8 WINDOW (this round): lead with every entry whose PLAN, SEMANTICS,
# or implementing-function source changed since its last driver row —
# the two late-r7 rewrites that missed the r7 window
# (d_embedding_neardup_lsh flat-buffer bucket stage,
# d_ngram_jaccard_pairs conf-scaled width), the r8 rewrites
# (e_dau_hll_sketch register-based oracle, d_containment_pairs
# narrow pair exchange, st_upsert_stream namespaced cleanup), and the
# three rank.py callers (persist-param signature change, plan
# unchanged) — then the 35 entries whose last green driver row is r5
# (the t_* text family, the r5 dedup rows, m_chunk_dedup, the
# remaining q_* analytics rows, the e_* timeseries rows,
# q_salted_join), filling the 50-entry window with the oldest r6
# rows. Staging is now ALSO enforced mechanically: tools/
# window_guard.py snapshots per-entry function-source+oracle hashes
# (tools/plan_hashes.json, regenerated with --update at each window
# staging) and tests/test_window_guard.py goes red if any entry's
# hash changes without a leading window slot.
#
# r9 PLAN: assuming CORRECTNESS_r8 is green over this window, the
# stalest remaining rows are the 33 r6 entries not refreshed here
# (st_* streaming family, e_* event analytics, q01/q02/q05/q14/q15/
# q17/q18/q19, m_binary_metadata, m_decode_pipeline,
# s_label_centroid_distance, s_text_vector_join, q_histogram,
# q_profile_orders) — lead r9 with any entry window_guard flags,
# then those 33.
_CHECK_FIRST = (
    # plans/semantics/source changed since last driver row — re-verify
    "d_embedding_neardup_lsh", "d_ngram_jaccard_pairs",
    "e_dau_hll_sketch", "d_containment_pairs", "st_upsert_stream",
    "q_customer_value_deciles", "q_customer_value_deciles_ranged",
    "q_gini_customer_value",
    # last green in r5 — refresh (everything below through q_salted)
    "d_bloom_prefilter", "d_dup_ngram_fraction",
    "d_lsh_levenshtein_refine", "d_minhash_lsh_pairs",
    "e_asof_purchase_attribution", "e_changepoint_cusum",
    "e_daily_active_users", "e_hll_register_state",
    "e_interpolate_daily_user", "e_rolling_median_7d",
    "m_chunk_dedup", "q_ab_test_proportions", "q_conditional_aggs",
    "q_latest_order_per_customer", "q_revenue_share_by_nation",
    "q_salted_join_supplier_volume", "q_unpivot_segment_metrics",
    "t_cms_heavy_hitters", "t_domain_mix_sample", "t_fingerprint",
    "t_gopher_quality", "t_lang_profile", "t_langid_naive",
    "t_pack_emit", "t_pack_sequences", "t_quality_score",
    "t_repetition_stats", "t_rolling_fingerprint",
    "t_stratified_sample", "t_token_bpe", "t_token_stats",
    "t_top_bigrams", "t_unk_replace", "t_vocab_coverage",
    # oldest r6 rows — fill the window to 50
    "d_decontaminate", "d_keep_best_per_key", "d_neardup_components",
    "d_neardup_triangles", "d_simhash", "q01_pricing_summary",
    "t_tfidf_top_terms", "e_sessionize",
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
