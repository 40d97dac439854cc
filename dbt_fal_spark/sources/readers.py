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
from pyspark.sql import functions as F

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


# Columns written as parquet TIMESTAMP(NANOS) — Spark has no nanos timestamp
# type, so they are read as raw int64 (legacy conf) and truncated to micros,
# matching DuckDB's own nanos→micros truncation.
_NANOS_TS_COLS = {"events": ("ts",)}

# Catalog-metadata cache: `spark.read.parquet` re-reads footers and re-infers
# the schema on every call (~80 ms/table in local mode — a per-query tax a
# metastore-backed deployment never pays). DataFrames are immutable lazy
# plans, so one per (session, dir, table) is safe to hand out repeatedly;
# keyed by applicationId so a restarted session gets fresh scans.
_SCAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan for one testdata table (predicate/column pushdown
    stays available because nothing is materialized here)."""
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    cached = _SCAN_CACHE.get(key)
    if cached is not None:
        return cached
    if name in _NANOS_TS_COLS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            # integer division: ns values (~1.7e18) exceed double precision
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    # Naive parquet timestamps read as TIMESTAMP_NTZ under Spark 4 defaults
    # (the driver hands us arbitrary sessions, so the session-level
    # inferTimestampNTZ=false in session.py cannot be assumed). NTZ forbids
    # numeric casts (epoch math) and diverges from DuckDB's epoch(); with
    # the session tz pinned UTC the LTZ cast is wall-value identical.
    for col, dtype in df.dtypes:
        if dtype.startswith("timestamp_ntz"):
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    _SCAN_CACHE[key] = df
    return df


# NOTE on the repeated `if text is None: continue` guard inside Arrow
# batch loops (7 sites across dedup/curation/text): it cannot be factored
# into a shared helper here, because mapInPandas closures must be
# SELF-CONTAINED — a module-level function referenced from a UDF is
# pickled by reference (not by value) and raises ModuleNotFoundError on
# executors whose Python workers cannot import dbt_fal_spark (any
# driver-provided session where the package is not on the workers'
# sys.path). The guard is therefore intentionally inlined per closure.


def load_table_fresh(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Like load_table but always a NEW scan with fresh attribute ids —
    for the right side of a cogrouped self-join, where sharing lineage
    with the cached scan trips the ambiguous-self-join analyzer check.
    Applies the same schema fixups as load_table (one source of truth
    for path convention + timestamp handling). The pre-existing cache
    entry (if any) is restored afterwards so other callers keep their
    shared scan; the fresh scan itself is never cached (a later
    load_table returning it would re-create the shared-lineage problem
    this function exists to avoid)."""
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    prior = _SCAN_CACHE.pop(key, None)
    df = load_table(spark, sf_dir, name)
    if prior is not None:
        _SCAN_CACHE[key] = prior
    else:
        _SCAN_CACHE.pop(key, None)
    return df


def register_testdata(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view named after the table."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def spread(df: DataFrame) -> DataFrame:
    """Small-file guard for compute-heavy map stages: a single-row-group
    parquet file scans as ONE task, which would run a downstream Python /
    expression-heavy stage single-threaded. If the scan is too small to
    have reached the target width, round-robin repartition (one tiny
    shuffle of the narrow projection). Width is capped at 8: each Python
    task costs ~10 ms of worker dispatch + Arrow framing, so at
    small-file sizes 8 wide batches beat 32 slivers (measured 0.31 s vs
    0.44 s for the minhash stage at sf0.1). At real data sizes the scan
    is far over the size cutoff and this is a no-op.

    r16 (optimization round): the width decision reads the optimizer's
    size estimate (``optimizedPlan().stats().sizeInBytes`` — a pure
    driver-side plan visit) instead of ``df.rdd.getNumPartitions()``,
    which materialized the physical plan AND an RDD graph per call:
    measured ~100 ms of driver latency per probe, ~25 ms for the stats
    visit, times ~20 call sites per bench pass. Decision rule: a scan
    estimated under target x maxPartitionBytes cannot have produced
    ``target`` full splits, so it gets the widening repartition; anything
    larger already scans >= target-wide. (A many-tiny-files scan under
    the cutoff that technically had >= target slivers is repartitioned
    where the old probe no-opped — that consolidation is the better plan
    for the Python stages this guards, and results are partitioning-
    independent either way.)"""
    spark = df.sparkSession
    target = min(8, spark.sparkContext.defaultParallelism)
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        max_pb = int(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    except Exception:  # foreign session without the internal API: stay safe
        return df.repartition(target) if df.rdd.getNumPartitions() < target else df
    if size < target * max_pb:
        return df.repartition(target)
    return df


def persist_at_scale(df: DataFrame) -> DataFrame:
    """persist() iff the session runs the SCALE profile (AQE on — the
    marker session.pick_profile sets for >= 1 GiB inputs). Rationale
    (r16 optimization round, measured): caching a small multi-consumer
    relation costs more in memory-store materialization than the
    recompute it saves at sub-GB bench scale, but at cluster scale the
    recompute is a full pass over raw inputs — exactly the trade the
    session's profile machinery already encodes. Callers use this for
    BOUNDED relations (sketch registers, distinct user-week pairs) whose
    cache footprint is dimension-sized, never corpus-sized. Results are
    identical either way; only the plan's scan count changes."""
    if df.sparkSession.conf.get("spark.sql.adaptive.enabled", "true") == "true":
        return df.persist()
    return df


def read_seed_csv(spark: SparkSession, path: str) -> DataFrame:
    """dbt-style seed load (reference seeds are headered CSVs, e.g.
    projects/adapter/cli_tests/projects/002_jaffle_shop/data/raw_orders.csv)."""
    return spark.read.csv(path, header=True, inferSchema=True)
