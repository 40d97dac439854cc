"""Fail fast and loudly when the driver regenerates /root/testdata with
drifted parquet physical types (the r2→r3 incident: events.ts flipped
from TIMESTAMP(NANOS)-as-int64 to naive micros → TIMESTAMP_NTZ, crashing
every epoch-math query).

This pins the SEMANTIC contract per column — the set of physical
encodings `load_table` is known to normalize — not one physical type.
A drift outside these sets means a new adaptive path is needed in
`sources/readers.py` (and `streaming/windows.read_events_stream` for
events.ts) BEFORE any query-level debugging makes sense.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from dbt_fal_spark.sources.readers import TESTDATA_TABLES, load_table
from tests.conftest import SF_DIR

# Per-column acceptable physical parquet types (pyarrow stringification).
# "ts-like" = every encoding the readers normalize to a UTC TIMESTAMP.
_TS_LIKE = (
    "timestamp[ns",  # TIMESTAMP(NANOS), naive or tz-adjusted (prefix)
    "timestamp[us",  # micros, naive (→ NTZ → cast) or tz-adjusted
    "timestamp[ms",
    "int64",  # raw int64 nanos
)

EXPECTED = {
    "region": {"r_regionkey": ("int32", "int64"), "r_name": ("string", "large_string")},
    "nation": {
        "n_nationkey": ("int32", "int64"),
        "n_name": ("string", "large_string"),
        "n_regionkey": ("int32", "int64"),
    },
    "customer": {
        "c_custkey": ("int64",),
        "c_nationkey": ("int32", "int64"),
        "c_acctbal": ("double",),
        "c_mktsegment": ("string", "large_string"),
    },
    "supplier": {
        "s_suppkey": ("int64",),
        "s_nationkey": ("int32", "int64"),
        "s_acctbal": ("double",),
    },
    "part": {
        "p_partkey": ("int64",),
        "p_size": ("int32", "int64"),
        "p_retailprice": ("double",),
        "p_type": ("string", "large_string"),
    },
    "orders": {
        "o_orderkey": ("int64",),
        "o_custkey": ("int64",),
        "o_totalprice": ("double",),
        "o_orderdate": _TS_LIKE + ("date32",),
        "o_orderpriority": ("string", "large_string"),
    },
    "lineitem": {
        "l_orderkey": ("int64",),
        "l_quantity": ("double",),
        "l_extendedprice": ("double",),
        "l_discount": ("double",),
        "l_tax": ("double",),
        "l_shipdate": _TS_LIKE + ("date32",),
        "l_returnflag": ("string", "large_string"),
    },
    "events": {
        "event_id": ("int64",),
        "ts": _TS_LIKE,
        "user_id": ("int64",),
        "event_type": ("string", "large_string"),
        "value": ("double",),
        "props": ("string", "large_string"),
    },
    "documents": {
        "doc_id": ("int64",),
        "text": ("string", "large_string"),
        "lang": ("string", "large_string"),
        "n_chars": ("int64",),
    },
    "embeddings": {
        "vec_id": ("int64",),
        "label": ("int32", "int64"),
        "embedding": ("list<element: float>", "list<item: float>", "list<element: double>"),
    },
}


@pytest.mark.parametrize("table", TESTDATA_TABLES)
def test_physical_types_within_known_encodings(table):
    schema = pq.read_schema(os.path.join(SF_DIR, f"{table}.parquet"))
    fields = {f.name: str(f.type) for f in schema}
    spec = EXPECTED[table]
    missing = set(spec) - set(fields)
    assert not missing, f"{table}: columns missing from testdata: {missing}"
    for col, accepted in spec.items():
        actual = fields[col]
        ok = any(
            actual.startswith(a) if a.endswith("[ns") or a.endswith("[us") or a.endswith("[ms") else actual == a
            for a in accepted
        )
        assert ok, (
            f"{table}.{col}: physical type {actual!r} is outside the known "
            f"encodings {accepted} — extend load_table/read_events_stream "
            f"normalization before debugging queries"
        )


def test_loaded_semantic_types(spark):
    """After load_table normalization: ts columns are castable TIMESTAMP
    (not NTZ, not bigint) — the contract every operator assumes."""
    for table, cols in (("events", ["ts"]), ("orders", ["o_orderdate"]), ("lineitem", ["l_shipdate"])):
        df = load_table(spark, SF_DIR, table)
        dtypes = dict(df.dtypes)
        for col in cols:
            assert dtypes[col] in ("timestamp", "date"), (table, col, dtypes[col])
        # epoch math must work (the r2 crash shape)
        df.select(F.unix_timestamp(F.col(cols[0]).cast("timestamp"))).limit(1).collect()
