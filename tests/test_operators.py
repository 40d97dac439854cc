"""Every registered query runs on Spark and (when an oracle exists)
matches DuckDB on sorted rows — the same gate the driver applies.

This mirrors the reference's behavior-level testing philosophy
(SURVEY §5) plus the query-correctness layer the reference lacks.
"""

from __future__ import annotations

import math

import pytest

from dbt_fal_spark.registry import all_queries
from tests.conftest import SF_DIR

SPECS = all_queries()


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x1f".join(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, oracle):
    spec = SPECS[name]
    sdf = spec.fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        # rows-only contract: runs and yields a stable schema
        assert isinstance(srows, list)
        assert scols
        return
    res = oracle.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    assert _canon(scols, srows) == _canon(ocols, orows), f"{name}: values differ"
