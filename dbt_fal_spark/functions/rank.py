"""Distributed exact global rank — total-order row numbering without the
single-partition WindowExec a bare ``row_number() OVER (ORDER BY ...)``
plans (Spark warns "No Partition Defined ... all the data to a single
partition"; at 100 TB that executor is the job).

Shape (the classic two-pass prefix-sum rank):

1. ``repartitionByRange`` on the order key — partition p's keys all sort
   before partition p+1's (RangePartitioner samples split points), so
   the global order is the concatenation of per-partition orders.
2. per-partition ``row_number`` windows (parallel — partitioned by the
   range-partition id, never a single reducer).
3. add the exclusive prefix-sum of partition sizes, computed from an
   O(num_partitions)-row count aggregate collected to the driver (the
   documented bounded-broadcast pattern: scalars, not data) and joined
   back as a broadcast.

Exact for any input (ties across a range boundary are still totally
ordered when ``order_cols`` is a unique key, which every caller must
supply — same contract ntile/row_number determinism needs anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def global_row_number_with_total(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "i",
    num_partitions: int | None = None,
    persist: bool = True,
) -> tuple[DataFrame, int]:
    """Rank rows 1..N in the total order of ``order_cols`` (which must be
    a unique key for a deterministic result). Returns (ranked df, N) —
    N comes free from the partition-size pass, saving callers that need
    it (ntile arithmetic, Gini normalization) a separate count job.

    Pinning contract: the size pass and the rank job MUST see the same
    physical partitioning — RangePartitioner re-samples split points
    per job (seeded from the fresh RDD id), so letting the two jobs
    each run their own repartitionByRange can shift rows across
    boundaries and duplicate/skip global ranks. With ``persist=True``
    (default) the range-shuffled input is cached to pin it; the cache
    is released by the query harness's post-query
    ``spark.catalog.clearCache()`` (registry.py's documented
    lifecycle). Library callers OUTSIDE that harness (api/
    materialization code) pass ``persist=False`` — the partitioning is
    then pinned with an eager ``localCheckpoint`` instead (materialized
    on executors, lineage truncated, storage reclaimed by the context
    cleaner when the DataFrame is GC'd), leaving no session-lifetime
    cache entry behind. Recomputation is never the pinning strategy.

    Fault-tolerance trade-off of the persist=False path (ADVICE r9):
    localCheckpoint blocks are executor-local and NOT replicated, and
    lineage truncation means they cannot be recomputed — losing an
    executor mid-job fails the whole job (persist=True can recompute;
    localCheckpoint cannot). persist+unpersist is NOT a fix: the
    returned DataFrame is lazy, so an unpersist before the caller's
    action would un-pin the partitioning and reintroduce the
    rank-misalignment bug this path exists to prevent. On a cluster
    where executor loss is routine, callers should prefer persist=True
    and release the cache themselves, or set a reliable checkpoint dir
    and swap ``localCheckpoint`` for ``checkpoint`` at the call site."""
    spark = df.sparkSession
    n_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    parts = df.repartitionByRange(n_parts, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    if persist:
        parts = parts.persist()
    else:
        parts = parts.localCheckpoint(eager=True)
    sizes = parts.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt")).collect()
    offsets, acc = [], 0
    for row in sorted(sizes, key=lambda r: r["__pid"]):
        offsets.append((row["__pid"], acc))
        acc += row["__cnt"]
    off_df = spark.createDataFrame(offsets or [], "__pid int, __off long")
    local = F.row_number().over(W.partitionBy("__pid").orderBy(*order_cols))
    ranked = (
        parts.withColumn("__lr", local)
        .join(F.broadcast(off_df), "__pid")
        .withColumn(out_col, (F.col("__lr") + F.col("__off")).cast("long"))
        .drop("__pid", "__lr", "__off")
    )
    return ranked, acc


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "i",
    num_partitions: int | None = None,
    persist: bool = True,
) -> DataFrame:
    ranked, _ = global_row_number_with_total(
        df, order_cols, out_col, num_partitions, persist=persist
    )
    return ranked


def ntile_from_rank(rank_col: str, n_rows: int, n_buckets: int):
    """SQL-standard ntile bucket from an exact global rank: the first
    ``n_rows mod n_buckets`` buckets take ``ceil(n/k)`` rows, the rest
    ``floor(n/k)`` — pure int64 arithmetic on driver-side constants, so
    it composes with global_row_number into a fully distributed ntile."""
    base, rem = divmod(n_rows, n_buckets)
    if base == 0:
        # fewer rows than buckets: each row is its own bucket (ntile spec)
        return F.col(rank_col).cast("int")
    cut = rem * (base + 1)
    i = F.col(rank_col)
    first = F.expr(f"CAST(({rank_col} + {base}) DIV {base + 1} AS INT)")
    rest = F.expr(
        f"CAST({rem} + ({rank_col} - {cut} + {base - 1}) DIV {base} AS INT)"
    )
    return F.when(i <= F.lit(cut), first).otherwise(rest)
