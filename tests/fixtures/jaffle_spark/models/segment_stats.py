"""Python model: Spark DataFrame in, Spark DataFrame out — the
reference's Python models get pandas (reference: orders_forecast.py);
here the same contract is lazy and distributed."""

from pyspark.sql import functions as F


def model(dbt, session):
    customers = dbt.ref("customers")
    return (
        customers.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("customer_lifetime_value").alias("segment_value"),
        )
    )
