"""Time the DuckDB oracle SQL for the bench query set — the BASELINE
comparator (BASELINE.md: the 2× bound is against the DuckDB-oracle
timing of the same query set at the same scale factor on the same
machine). Mirrors bench.py's protocol: same query list, min-of-3 per
query, all cores, warm connection.

Usage: python tools/oracle_bench.py [sf_dir]  → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

# The query set is IMPORTED from the shared contract module, never
# copied: a duplicated HEADLINE here drifted in r13 (missing the four
# r12 TPC-H additions — the same defect class VERDICT r12 flagged
# inside bench.py itself), and the r13 fix (exec'ing bench.py) pulled
# pyspark into this pure-DuckDB timer's import path (ADVICE r13).
# tests/test_bench_contract.py pins the shared set.
from dbt_fal_spark.bench_set import HEADLINE, composite_names  # noqa: E402
from dbt_fal_spark.registry import all_queries  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    specs = all_queries()
    names = composite_names(specs)
    timings = {}
    skipped = []
    for name in names:
        spec = specs[name]
        if not spec.oracle:
            skipped.append(name)
            continue
        con.execute(spec.oracle).fetchall()  # warm
        best = None
        for _ in range(3):
            t0 = time.time()
            con.execute(spec.oracle).fetchall()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "oracle_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "skipped_no_oracle": skipped,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
