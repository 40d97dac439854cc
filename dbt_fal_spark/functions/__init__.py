from dbt_fal_spark.functions.numeric import dec, dsum, davg  # noqa: F401
