"""Orchestration-layer operators exposed through the correctness gate.

These run the FULL project machinery — loader → Jinja render → DAG →
priority scheduler → thread-pool executor → materializations — over the
built-in demo project (dbt_fal_spark/projects/demo), then return the
final model, so the DuckDB oracle verifies the whole `fal flow run`
equivalent end-to-end, not just a single query plan
(reference lifecycle: SURVEY §3.1).
"""

from __future__ import annotations

import os
import threading
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from dbt_fal_spark.registry import query

_DEMO_DIR = Path(__file__).resolve().parent.parent / "projects" / "demo"
_LOCK = threading.Lock()


@query(
    "p_flow_run_customer_stats",
    oracle="""
    WITH customer_orders AS (
      SELECT o_custkey AS customer_id,
             count(o_orderkey) AS number_of_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS customer_lifetime_value
      FROM orders
      GROUP BY o_custkey
    )
    SELECT c.c_custkey AS customer_id,
           c.c_name AS customer_name,
           c.c_mktsegment AS segment,
           coalesce(co.number_of_orders, 0) AS number_of_orders,
           co.customer_lifetime_value
    FROM customer c
    LEFT JOIN customer_orders co ON c.c_custkey = co.customer_id
    """,
    tags=("project", "orchestration"),
)
def p_flow_run_customer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`fal flow run` end-to-end: parse the demo project, build the DAG,
    schedule, materialize view + table models, return the final model."""
    from dbt_fal_spark.api import FalSpark

    with _LOCK:
        os.environ["TESTDATA_DIR"] = sf_dir
        schema = "demo_" + os.path.basename(sf_dir.rstrip("/")).replace(".", "_").replace("-", "_")
        spark.sql(f"DROP DATABASE IF EXISTS `{schema}` CASCADE")
        fal = FalSpark(_DEMO_DIR, spark=spark, schema=schema)
        # select the customer_stats subgraph: the demo project also hosts
        # the pandas-interop forecast models (their own entry below), and
        # this entry's measured plan must stay the customer pipeline only
        statuses = fal.run(select="+customer_stats")
        if any(s != "success" for s in statuses.values()):
            raise RuntimeError(f"flow run failed: {statuses}")
        return fal.ref("customer_stats")


@query(
    "p_fal_model_pandas_forecast",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS order_date,
             count(*) AS n_orders,
             count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent
      FROM orders GROUP BY 1
    ), w AS (
      SELECT order_date, n_orders, n_urgent,
             sum(n_orders) OVER (ORDER BY order_date
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS s7,
             sum(n_urgent) OVER (ORDER BY order_date
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS su7,
             row_number() OVER (ORDER BY order_date) AS rn
      FROM daily
    )
    SELECT strftime(order_date, '%Y-%m-%d') AS ds,
           n_orders AS y_count,
           n_urgent AS y_urgent,
           CAST(s7 AS DOUBLE) / 7 AS yhat_count,
           CAST(su7 AS DOUBLE) / 7 AS yhat_urgent
    FROM w WHERE rn >= 7
    """,
    tags=("project", "pandas-interop", "forecast"),
)
def p_fal_model_pandas_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas interop end-to-end under the oracle gate: `fal flow run`
    executes a script-style fal model (demo/fal_models/
    orders_forecast_ma.py — the reference flagship's shape, reference:
    A/cli_tests/projects/002_jaffle_shop/fal_models/orders_forecast.py)
    whose ``ref()`` returns a pandas frame per its schema.yml
    ``meta: {fal: {interop: pandas}}``, and whose pandas result flows
    back through ``write_to_model``.

    Scale shape: the pandas boundary sees ONE ROW PER CALENDAR DAY (the
    Spark-side orders_daily aggregate runs first and is the distributed
    part) — ~2.4k rows regardless of corpus size, the bounded
    aggregate-then-convert pattern. The 7-row trailing mean is integer
    rolling sums + one double division, bit-exact vs the SQL oracle."""
    from dbt_fal_spark.api import FalSpark

    with _LOCK:
        os.environ["TESTDATA_DIR"] = sf_dir
        schema = "demof_" + os.path.basename(sf_dir.rstrip("/")).replace(".", "_").replace("-", "_")
        spark.sql(f"DROP DATABASE IF EXISTS `{schema}` CASCADE")
        fal = FalSpark(_DEMO_DIR, spark=spark, schema=schema)
        statuses = fal.run(select="+orders_forecast_ma")
        if any(s != "success" for s in statuses.values()):
            raise RuntimeError(f"flow run failed: {statuses}")
        return fal.ref("orders_forecast_ma")
