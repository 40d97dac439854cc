"""Round-16 OPTIMIZATION locks (first optimization round).

Changes locked here (see OPTIMIZATION_r16.md for measurements):
- readers.spread / t_tfidf width guard: the partition-width probe reads
  the optimizer's size estimate (driver-side plan visit) instead of
  ``df.rdd.getNumPartitions()`` (which materialized a physical plan +
  RDD graph per call: ~100 ms of driver latency x ~20 call sites per
  bench pass). Locked: decision parity on both sides of the cutoff.
- e_dau_hll_sketch: the register aggregation counts its group's events
  (n_events = sum of per-bucket counts, folded into the DAU aggregate —
  the third direct events scan is gone), and under the SCALE profile the
  bounded register relation is persisted so the WAU branch reads cache:
  one events pass at 100 TB, two at bench scale (persist measured slower
  than the rescan at sub-GB inputs — OPTIMIZATION_r16.md). Locked: scan
  counts per profile; n_events matches the direct count.
- e_retention_cohorts: distinct (user, week) first (the only event-sized
  shuffle), cohort week = per-user min of it, activity join needs no
  second distinct; persisted under the scale profile only. Locked: scan
  counts per profile; results match the two-scan reference.
- q_generic_tests: batched-orders variant measured SLOWER (countDistinct
  Expand) and rejected; values-lock retained as the adversarial check.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _parquet_scans(df, table: str) -> int:
    """Count UNCACHED scans of `table` in the executed plan: FileScan
    leaves with no InMemoryTableScan ancestor (toString renders a cached
    relation's recipe inline under its InMemoryTableScan — those nested
    FileScans execute no file read on a cache hit). Ancestry is decided
    by tree indentation: an ancestor renders at a strictly smaller
    indent above the leaf."""

    def indent(ln: str) -> int:
        return len(ln) - len(ln.lstrip(" :+-*"))

    uncached = 0
    lines = _physical_plan(df).splitlines()
    for i, ln in enumerate(lines):
        if "Scan parquet" in ln and f"{table}.parquet" in ln:
            cur = indent(ln)
            covered = False
            for j in range(i - 1, -1, -1):  # climb the ancestor chain
                d = indent(lines[j])
                if d < cur:
                    if "InMemoryTableScan" in lines[j]:
                        covered = True
                        break
                    cur = d
            if not covered:
                uncached += 1
    return uncached


# ---------------------------------------------------------------------------
# spread(): stats-based width probe
# ---------------------------------------------------------------------------


def test_spread_widens_small_scans(spark):
    from dbt_fal_spark.sources.readers import load_table, spread

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    out = spread(docs)
    # sf0.001 scans are far below 8 x maxPartitionBytes: widened to 8
    assert out.rdd.getNumPartitions() == min(8, spark.sparkContext.defaultParallelism)


def test_spread_noops_above_size_cutoff(spark):
    from dbt_fal_spark.sources.readers import load_table, spread

    prior = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        # shrink the cutoff below the file size: a "big" scan must pass
        # through un-repartitioned (the at-scale no-op path)
        spark.conf.set("spark.sql.files.maxPartitionBytes", "64")
        docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
        out = spread(docs)
        assert out is docs  # identity: no repartition node added
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prior)


def test_spread_results_unchanged_by_probe(spark):
    # the probe only picks a width; the downstream values must be
    # partitioning-independent — exact dedup through spread-fed minhash
    from dbt_fal_spark.operators.dedup import d_minhash_lsh_pairs

    rows = {tuple(r) for r in d_minhash_lsh_pairs(spark, SF_DIR).collect()}
    assert len(rows) > 0  # sf0.001 has known near-dup pairs


# ---------------------------------------------------------------------------
# e_dau_hll_sketch: one events pass
# ---------------------------------------------------------------------------


def test_dau_hll_single_events_scan(spark):
    from dbt_fal_spark.operators.timeseries import e_dau_hll_sketch

    # latency profile (tests session): no cache, merged nev+DAU aggregate
    # leaves exactly TWO events scans (register pass x2 branches); the
    # pre-r16 shape had three
    df = e_dau_hll_sketch(spark, SF_DIR)
    assert _parquet_scans(df, "events") == 2
    # scale profile (dedicated marker conf): register pass cached, zero uncached
    prior = spark.conf.get("spark.dbt_fal.profile", "latency")
    try:
        spark.conf.set("spark.dbt_fal.profile", "scale")
        df2 = e_dau_hll_sketch(spark, SF_DIR)
        assert _parquet_scans(df2, "events") == 0
        assert "InMemoryTableScan" in _physical_plan(df2)
        assert sorted(map(tuple, df2.collect())) == sorted(map(tuple, df.collect()))
    finally:
        spark.conf.set("spark.dbt_fal.profile", prior)
        spark.catalog.clearCache()


def test_dau_hll_n_events_matches_direct_count(spark):
    from dbt_fal_spark.operators.timeseries import e_dau_hll_sketch
    from dbt_fal_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    got = {
        r["day"]: r["n_events"]
        for r in e_dau_hll_sketch(spark, SF_DIR).select("day", "n_events").collect()
    }
    spark.catalog.clearCache()
    ev = load_table(spark, SF_DIR, "events")
    want = {
        r["day"]: r["n"]
        for r in ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r["day"] is not None
    }
    # NULL-day groups drop at the join in both shapes; compare non-null days
    assert got == {d: n for d, n in want.items() if d in got} and len(got) == len(want)


# ---------------------------------------------------------------------------
# e_retention_cohorts: one events pass
# ---------------------------------------------------------------------------


def test_retention_single_events_scan(spark):
    from dbt_fal_spark.operators.timeseries import e_retention_cohorts

    # latency profile (r17: reverted to the pre-r16 shape — the
    # interleaved A/Bs showed the uncached distinct-first shape slower,
    # OPTIMIZATION_r17.md): one uncached scan in the plan (the
    # activity-side events read) + the firsts cache fill at runtime =
    # two reads total, post-join distinct present
    df = e_retention_cohorts(spark, SF_DIR)
    assert _parquet_scans(df, "events") == 1
    prior = spark.conf.get("spark.dbt_fal.profile", "latency")
    try:
        spark.conf.set("spark.dbt_fal.profile", "scale")
        df2 = e_retention_cohorts(spark, SF_DIR)
        assert _parquet_scans(df2, "events") == 0
        assert "InMemoryTableScan" in _physical_plan(df2)
        assert sorted(map(tuple, df2.collect())) == sorted(map(tuple, df.collect()))
    finally:
        spark.conf.set("spark.dbt_fal.profile", prior)
        spark.catalog.clearCache()


def test_retention_matches_two_scan_reference(spark):
    from dbt_fal_spark.operators.timeseries import e_retention_cohorts
    from dbt_fal_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    got = {
        (r["cohort_week"], r["week_offset"]): (r["active_users"], r["cohort_size"])
        for r in e_retention_cohorts(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    # pre-r16 two-scan shape, rebuilt inline as the reference
    ev = load_table(spark, SF_DIR, "events")
    week = F.date_trunc("week", F.col("ts").cast("date")).cast("date")
    firsts = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    activity = (
        ev.select("user_id", week.alias("week"))
        .join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    want = {
        (r["cohort_week"], r["week_offset"]): (r["active_users"], r["cohort_size"])
        for r in activity.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .join(sizes, "cohort_week")
        .collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# q_generic_tests: batched orders pass
# ---------------------------------------------------------------------------


def test_generic_tests_values_match_per_test_aggregates(spark):
    from dbt_fal_spark.operators.relational import q_generic_tests
    from dbt_fal_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    got = {r["test_name"]: r["violations"] for r in q_generic_tests(spark, SF_DIR).collect()}
    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer")
    li = load_table(spark, SF_DIR, "lineitem")
    want = {
        "orders_o_orderkey_unique": orders.agg(
            (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("v")
        ).collect()[0]["v"],
        "orders_o_custkey_not_null": orders.agg(
            F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("v")
        ).collect()[0]["v"],
        "lineitem_l_quantity_not_null": li.agg(
            F.count(F.when(F.col("l_quantity").isNull(), 1)).alias("v")
        ).collect()[0]["v"],
        "customer_c_custkey_unique": cust.agg(
            (F.count(F.lit(1)) - F.countDistinct("c_custkey")).alias("v")
        ).collect()[0]["v"],
    }
    assert got == want




# ---------------------------------------------------------------------------
# d_lsh_levenshtein_refine: scale-profile candidate prefilter
# ---------------------------------------------------------------------------


def test_lev_refine_profiles_agree(spark):
    from dbt_fal_spark.operators.dedup import d_lsh_levenshtein_refine

    lat = {tuple(r) for r in d_lsh_levenshtein_refine(spark, SF_DIR).collect()}
    spark.catalog.clearCache()
    prior = spark.conf.get("spark.dbt_fal.profile", "latency")
    try:
        spark.conf.set("spark.dbt_fal.profile", "scale")
        scl = {tuple(r) for r in d_lsh_levenshtein_refine(spark, SF_DIR).collect()}
    finally:
        spark.conf.set("spark.dbt_fal.profile", prior)
        spark.catalog.clearCache()
    assert lat == scl and len(lat) > 0
