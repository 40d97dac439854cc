"""dbt_fal_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of fal-ai/dbt-fal (see SURVEY.md).

Architecture (Spark-first, not a port):
- Spark SQL / Catalyst is the warehouse: SQL models run via ``spark.sql``.
- Python models and scripts receive lazy PySpark DataFrames instead of
  driver-memory pandas (reference: projects/adapter/src/fal/dbt/integration/
  project.py:696-715 materializes whole relations into pandas).
- The orchestration layer (DAG, selectors, scheduler, hooks) is reimplemented
  driver-side (reference: projects/adapter/src/fal/dbt/planner/*).
- Extension operators for LLM-data pipelines (dedup, similarity search,
  multimodal columns, text analysis) live in ``operators/``.
"""

__version__ = "0.4.0"  # kept in sync with pyproject.toml

from dbt_fal_spark.session import get_spark  # noqa: F401
