"""Central query registry — the contract surface the driver checks.

Every implemented operator from SURVEY.md §2 registers here with:
- a Spark callable ``(spark, sf_dir) -> DataFrame``
- an equivalent ANSI-SQL oracle string for DuckDB (or None for
  non-SQL-expressible ops, which get a weaker rows-only check).

``__spark_entry__.py`` re-exports this registry to the driver.

Cache contract: several operators ``persist()`` an intermediate that
feeds multiple consumers within ONE query (e.g. t_tfidf_top_terms's tf
table). The query functions themselves cannot unpersist (they return a
lazy DataFrame; the caller decides when the final action runs), so a
long-lived session running many registry queries should call
``spark.catalog.clearCache()`` between queries — bench.py and
tools/check.py both do.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query implementation plus its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration) and return
    the full registry."""
    # Imports are inside the function so a syntax error in one module can't
    # break `import dbt_fal_spark` for unrelated users.
    from dbt_fal_spark.operators import (  # noqa: F401
        curation,
        dedup,
        inference,
        multimodal,
        project_ops,
        relational,
        relational_tpch2,
        sampling,
        stats,
        similarity,
        text,
        timeseries,
    )
    from dbt_fal_spark.functions import skew  # noqa: F401
    from dbt_fal_spark.streaming import windows  # noqa: F401

    return dict(_REGISTRY)
