"""Bucketed co-located joins: the pre-shuffle strategy for repeated
big⋈big joins at 100 TB (SURVEY §7 M5 / build brief "bucketing for
co-located joins").

Writing both fact tables bucketed by the join key means every subsequent
join on that key reads already-co-partitioned data — the plan must show
ZERO shuffle exchanges. At cluster scale this converts the nightly
orderkey join from a full 100 TB shuffle into a local zip of bucket
files. These tests assert on the physical plan, not just results.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_fal_spark.sources.readers import load_table
from tests.conftest import SF_DIR

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    for t in ("bktest.li_b", "bktest.ord_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    ords = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    (
        li.write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("bktest.li_b")
    )
    (
        ords.write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("bktest.ord_b")
    )
    yield ("bktest.li_b", "bktest.ord_b")
    for t in ("bktest.li_b", "bktest.ord_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    li_b, ord_b = bucketed
    # disable broadcast so the join strategy depends on partitioning alone
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(li_b).join(
            spark.table(ord_b), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_has_no_shuffle(spark, bucketed):
    li_b, _ = bucketed
    agg = spark.table(li_b).groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed agg still shuffles:\n{plan}"


def test_bucketed_join_matches_plain_join(spark, bucketed):
    li_b, ord_b = bucketed
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    ords = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    plain = (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bk = (
        spark.table(li_b)
        .join(spark.table(ord_b), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, bk.collect())) == sorted(map(tuple, plain.collect()))


def test_spread_noops_on_well_partitioned_input(spark):
    """spread() exists for single-row-group small files; on input too
    big to have scanned narrow it must return the SAME plan (no shuffle
    inserted on a real cluster's naturally partitioned scans). r16: the
    decision is SIZE-based (optimizer estimate vs target x
    maxPartitionBytes — see readers.spread), so the at-scale no-op is
    exercised by shrinking the cutoff under the input's size; a TINY
    but already-wide input is now deliberately consolidated (fewer
    Python-stage slivers), the behavior the old partition-count probe
    could not afford to implement at ~100 ms/probe."""
    from dbt_fal_spark.sources.readers import spread

    wide = spark.range(1000, numPartitions=16)
    prior = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1")
        assert spread(wide) is wide  # estimated size >= 8 x 1 byte: no-op
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prior)
    # tiny-but-wide input: consolidated to the target width (r16 contract)
    assert spread(wide).rdd.getNumPartitions() == min(
        8, spark.sparkContext.defaultParallelism
    )
    narrow = spark.range(1000, numPartitions=1)
    out = spread(narrow)
    assert out is not narrow
    assert out.rdd.getNumPartitions() == min(
        8, spark.sparkContext.defaultParallelism
    )
    assert out.count() == 1000
