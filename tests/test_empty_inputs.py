"""Empty-input robustness: every registered batch query must run (and
return 0 rows) against 0-row tables with the production schemas.

This is the guard for the classic Arrow-stage failure modes — np.vstack
on an empty list, pd.DataFrame({}) schema drift, collect() on nothing,
min/max over empty partitions — which only ever surface in production on
an empty partition of a real corpus.
"""

from __future__ import annotations

import pytest

from dbt_fal_spark.registry import all_queries
from dbt_fal_spark.sources.readers import TESTDATA_TABLES, load_table
from tests.conftest import SF_DIR

# Streaming drains need a non-empty first microbatch to terminate quickly
# and are exercised separately; everything else must handle empty input.
_SKIP_PREFIXES = ("st_", "p_")

# One representative per plan family keeps the empty-run suite fast while
# covering every risky code path: pandas stages (minhash/jaccard/knn/
# decode), driver collects (ivf codebook, components), windows, pivots,
# grouping sets, multi-join TPC-H shapes.
_REPRESENTATIVES = [
    "q01_pricing_summary",
    "q05_region_nation_revenue",
    "q13_order_count_distribution",
    "q_pivot_priority_by_status",
    "q_grouping_sets_revenue",
    "q_first_last_order_value",
    "d_exact_dedup",
    "d_decontaminate",
    "d_ngram_jaccard_pairs",
    "d_minhash_lsh_pairs",
    "d_neardup_components",
    "d_lsh_levenshtein_refine",
    "d_simhash",
    "d_embedding_neardup_pairs",
    "s_knn_bruteforce",
    "s_knn_ivf",
    "t_tfidf_top_terms",
    "t_rolling_fingerprint",
    "t_token_bpe",
    "e_sessionize",
    "e_retention_cohorts",
    "e_resample_daily_fill",
    "e_forecast_daily_by_type",
    "m_decode_pipeline",
    "m_frame_sample",
    "t_stratified_sample",
    "t_pack_sequences",
    "t_pack_emit",
    "e_dau_hll_sketch",
    "d_dup_ngram_fraction",
    "t_repetition_stats",
    "s_knn_int8",
    "s_knn_lsh_multitable",
    "q_unpivot_segment_metrics",
    "t_cms_heavy_hitters",
    "d_bloom_prefilter",
    "d_embedding_neardup_lsh",
    "q_corr_stats_by_flag",
    "q_revenue_trend_by_priority",
    # r12 plan families: persist + broadcast-scalar HAVING (the global
    # total is NULL on an empty rollup — the isnotnull filter must make
    # that 0 rows, not a crash) and window-quantifier counts
    "q11_important_parts",
    "q21_suppliers_kept_waiting",
    "q12_latency_priority_pivot",
    "q20_part_promotion_suppliers",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """0-row copies of every testdata table, real schemas preserved."""
    out = tmp_path_factory.mktemp("sf_empty")
    for t in TESTDATA_TABLES:
        load_table(spark, SF_DIR, t).limit(0).write.mode("overwrite").parquet(
            str(out / f"{t}.parquet")
        )
    return str(out)


@pytest.mark.parametrize("name", _REPRESENTATIVES)
def test_query_runs_on_empty_tables(spark, empty_sf_dir, name):
    specs = all_queries()
    df = specs[name].fn(spark, empty_sf_dir)
    assert df.count() == 0


def test_knn_int8_nonempty_corpus_no_queries(spark, tmp_path):
    """Non-empty corpus whose every vec_id >= N_QUERIES: the fused pass
    yields stats but zero query rows — must return 0 rows, not a numpy
    broadcast error against the (64,) stats vectors."""
    from pyspark.sql import functions as F

    from dbt_fal_spark.operators.similarity import s_knn_int8

    emb = load_table(spark, SF_DIR, "embeddings").withColumn(
        "vec_id", F.col("vec_id") + 1000
    )
    emb.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    assert s_knn_int8(spark, str(tmp_path)).count() == 0


def test_ab_test_empty_input_matches_oracle(spark, empty_sf_dir):
    """Global aggregation: ONE row with NULL proportions on empty input
    in BOTH engines (sum over zero rows is NULL; _ieee_div propagates
    it instead of fabricating -Inf)."""
    import duckdb as _duckdb
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), "tools"))
    from check import pandas_rows, table_digest

    spec = all_queries()["q_ab_test_proportions"]
    got = spec.fn(spark, empty_sf_dir).toPandas()
    con = _duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{empty_sf_dir}/events.parquet/*.parquet'"
    )
    exp = con.execute(spec.oracle).df()
    con.close()
    assert len(got) == len(exp) == 1
    assert table_digest(list(got.columns), pandas_rows(got)) == table_digest(
        list(exp.columns), pandas_rows(exp)
    )
