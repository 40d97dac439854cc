"""Partition-count determinism sweep: every registered batch query must
produce IDENTICAL rows under different shuffle widths (8 vs 32
partitions). On a cluster the partition count is the first thing that
changes, so any order-sensitive float reduction, non-stable top-k
tie-break, or partition-dependent sampling shows up here even when a
single-run oracle compare happens to agree.

Usage: python tools/determinism_sweep.py [--sf DIR] [--only a,b]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_fal_spark.registry import all_queries  # noqa: E402
from dbt_fal_spark.session import get_spark  # noqa: E402


def canon(df) -> list[tuple]:
    cols = sorted(df.columns)
    return sorted(tuple(repr(r[c]) for c in cols) for r in df.collect())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    spark = get_spark("determinism")
    specs = all_queries()
    names = args.only.split(",") if args.only else sorted(specs)
    failures = []
    for name in names:
        spec = specs.get(name)
        if spec is None:
            failures.append((name, "unknown query name"))
            print(f"ERR   {name}: not in registry", flush=True)
            continue
        fn = spec.fn
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            a = canon(fn(spark, args.sf))
            spark.catalog.clearCache()
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            b = canon(fn(spark, args.sf))
            spark.catalog.clearCache()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"ERROR {type(exc).__name__}: {exc}"))
            print(f"ERR   {name}: {exc}", flush=True)
            continue
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
        if a == b:
            print(f"OK    {name}: {len(a)} rows", flush=True)
        else:
            diff = sum(1 for x, y in zip(a, b) if x != y) + abs(len(a) - len(b))
            failures.append((name, f"{diff} differing rows"))
            print(f"DIFF  {name}: {diff} rows differ across partition widths", flush=True)
    print(f"\n== {len(names) - len(failures)} deterministic, {len(failures)} failures ==")
    for name, why in failures:
        print(f"  {name}: {why}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
