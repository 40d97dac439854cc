from dbt_fal_spark.sources.readers import TESTDATA_TABLES, load_table, register_testdata  # noqa: F401
