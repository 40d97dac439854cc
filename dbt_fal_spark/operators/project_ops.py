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
        statuses = fal.run()
        if any(s != "success" for s in statuses.values()):
            raise RuntimeError(f"flow run failed: {statuses}")
        return fal.ref("customer_stats")
