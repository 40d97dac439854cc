"""SparkSession factory tuned for both local testing and cluster scale.

Local mode runs ``local[$SPARK_GRAFT_CPUS]`` (default all cores); on a real
cluster the same settings hold except memory/partition counts come from
submit-time conf. Every knob here is chosen for the 100 TB target:

- AQE on: runtime coalescing, skew-join splitting, dynamic broadcast.
- Shuffle partitions sized to cores locally; AQE re-coalesces at runtime so
  the same code scales to thousands of partitions on a cluster.
- Arrow enabled: every pandas interchange (Pandas UDFs, ``toPandas``) is
  columnar-batched instead of row-pickled.
- Session timezone pinned UTC so timestamp semantics are engine-independent
  (and match the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # cap in-memory partition bytes so a 100 TB scan splits into sane tasks
    "spark.sql.files.maxPartitionBytes": "134217728",  # 128 MiB
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
}


def get_spark(app_name: str = "dbt_fal_spark", **overrides: str) -> SparkSession:
    """Build (or fetch) the session. ``overrides`` win over defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    conf = dict(_DEFAULTS)
    conf.update({k: str(v) for k, v in overrides.items()})
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
