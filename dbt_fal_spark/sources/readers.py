"""Source readers: parquet scans + catalog registration.

The reference moves data through per-warehouse read paths
(reference: projects/adapter/src/dbt/adapters/fal_experimental/support/*.py,
dispatch at adapter_support.py:130-173) — all of that collapses to a single
lazy ``spark.read.parquet`` here. Registration as temp views makes the
tables addressable from ``spark.sql`` exactly like dbt sources
(reference: projects/adapter/src/fal/dbt/integration/project.py:717-755).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan for one testdata table (predicate/column pushdown
    stays available because nothing is materialized here)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_testdata(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view named after the table."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_seed_csv(spark: SparkSession, path: str) -> DataFrame:
    """dbt-style seed load (reference seeds are headered CSVs, e.g.
    projects/adapter/cli_tests/projects/002_jaffle_shop/data/raw_orders.csv)."""
    return spark.read.csv(path, header=True, inferSchema=True)
