"""Accuracy contract of the HLL sketch operator (no SQL oracle exists
for approximate results — this is its correctness gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_fal_spark.operators.timeseries import e_dau_hll_sketch, e_daily_active_users
from dbt_fal_spark.sources.readers import load_table
from tests.conftest import SF_DIR


def test_hll_dau_within_5pct_of_exact(spark):
    exact = {r["day"]: r["dau"] for r in e_daily_active_users(spark, SF_DIR).collect()}
    approx = {r["day"]: r["dau_approx"] for r in e_dau_hll_sketch(spark, SF_DIR).collect()}
    assert set(exact) == set(approx)
    for day, dau in exact.items():
        assert abs(approx[day] - dau) <= max(2, 0.05 * dau), (day, approx[day], dau)


def test_hll_weekly_union_matches_exact_window(spark):
    ev = load_table(spark, SF_DIR, "events")
    days = sorted(
        r["day"] for r in ev.select(F.col("ts").cast("date").alias("day")).distinct().collect()
    )
    approx = {r["day"]: r["wau_approx_7d"] for r in e_dau_hll_sketch(spark, SF_DIR).collect()}
    import datetime as dt

    for day in days[:10]:  # first 10 windows keep the test quick
        lo = day - dt.timedelta(days=6)
        exact = (
            ev.filter((F.col("ts").cast("date") >= lo) & (F.col("ts").cast("date") <= day))
            .select("user_id").distinct().count()
        )
        assert abs(approx[day] - exact) <= max(2, 0.05 * exact), (day, approx[day], exact)
