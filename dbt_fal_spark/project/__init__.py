from dbt_fal_spark.project.manifest import DbtModel, DbtSource, DbtTest, Manifest  # noqa: F401
from dbt_fal_spark.project.loader import load_project  # noqa: F401
