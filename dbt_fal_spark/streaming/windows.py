"""Structured Streaming operators over the ``events`` table.

The reference has no streaming at all (SURVEY §1.1) — this is the
extension surface. Batch twins live in ``operators/timeseries.py``; the
correctness contract is that a stream fully drained over the same input
produces the batch answer (verified by the DuckDB oracle on the batch
semantics).

Scale notes:
- ``withWatermark`` bounds state: at 100 TB/day ingest the hourly window
  state is (hours retained × groups), not row count.
- ``complete`` output mode is used only for the finite drain here; a
  production sink would use append + watermark with foreachBatch.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbt_fal_spark.functions.numeric import dec, o_dsum
from dbt_fal_spark.registry import query

# events.parquet schema with ts as raw int64 (parquet TIMESTAMP(NANOS) —
# see sources/readers.py for the batch-side handling).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of the events parquet with nanos→micros conversion."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # FileStreamSource requires a directory; glob-filter to the events file
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def hourly_windowed_agg(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window + watermark — the canonical streaming agg."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_stream_to_completion(result: DataFrame, name: str | None = None) -> DataFrame:
    """Drain a finite stream synchronously via a memory sink; returns the
    materialized result as a batch DataFrame."""
    name = name or f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        result.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = result.sparkSession
    return spark.table(name)


@query(
    "st_hourly_stream",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS hour,
           event_type,
           count(*) AS n_events,
           {o_dsum('value')} AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    tags=("streaming", "window"),
)
def st_hourly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming hourly rollup drained to completion — must equal the
    batch tumbling-window oracle (stream/batch unification check)."""
    events = read_events_stream(spark, sf_dir)
    return run_stream_to_completion(hourly_windowed_agg(events))
